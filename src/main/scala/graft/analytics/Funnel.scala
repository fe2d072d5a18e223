package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: how many users complete step 1,
  * then step 2 strictly after their first step 1, then step 3 strictly
  * after that, … — the standard product-analytics conversion operator
  * (and, in a training-data pipeline, the behavioral-cohort selector).
  *
  * Two exact formulations of the same semantics:
  *
  * SINGLE-PASS (the production path, [[funnelCountsSinglePass]] /
  * [[funnelTimesSinglePass]]): ONE scan of the fact table with
  * `type IN steps` pushed into the scan, one user-keyed exchange, and a
  * per-user state machine over the time-sorted group
  * (`groupByKey(user).flatMapSortedGroups(ts)`) holding O(k) state —
  * the first valid completion time per step. At 100 TB this reads the
  * fact table once instead of k times.
  *
  * STAGE CHAIN ([[funnelCounts]] / [[funnelTimes]]): each stage is
  * `filter(type) → join(prev stage) → groupBy(user).min(ts)`. Every join
  * and aggregation keys on the user column, so after the first exchange
  * the whole chain reuses ONE hash partitioning; each stage's state is
  * one timestamp per surviving user. Kept as the declarative reference
  * twin — ExtSpec pins single-pass ≡ stage chain ≡ a driver-side replay.
  */
object Funnel {

  /** Per-user sequential-first state: how deep the user got (`depth`) and
    * the first-completion time of each completed step (`times`, length =
    * depth). Computed in ONE pass: filter to funnel types (pushed into
    * the scan), shuffle once on the user key, and run the k-step state
    * machine over each user's time-ordered events — at depth d only a
    * `steps(d)`-typed event STRICTLY later than `times(d-1)` advances,
    * and because the group iterator is time-sorted the first such event
    * is exactly the stage chain's `min(ts) where ts > t_{d-1}`.
    */
  private def sequentialFirsts(ev: DataFrame, steps: Seq[String],
      userCol: String, typeCol: String, tsCol: String): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val k = steps.length
    ev.filter(col(typeCol).isin(steps.distinct: _*))
      .select(col(userCol).cast("long").as("user"),
        col(typeCol).as("etype"), col(tsCol).cast("long").as("t"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("t")) { (user: Long, it: Iterator[(Long, String, Long)]) =>
        val times = new Array[Long](k)
        var depth = 0
        it.foreach { case (_, et, t) =>
          if (depth < k && et == steps(depth) && (depth == 0 || t > times(depth - 1))) {
            times(depth) = t
            depth += 1
          }
        }
        Iterator.single((user, depth, times.take(depth).toSeq))
      }
      .toDF("user", "depth", "times")
  }

  /** [[funnelTimes]] semantics from one fact scan — (user, t_1 … t_k) for
    * users completing the whole funnel in order. The user key is
    * normalized to LONG (the typed state machine needs a concrete key
    * encoder); use the stage chain for non-numeric user keys.
    */
  def funnelTimesSinglePass(ev: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    sequentialFirsts(ev, steps, userCol, typeCol, tsCol)
      .filter(col("depth") === k)
      .select(col("user").as(userCol) +:
        (1 to k).map(i => element_at(col("times"), i).as(s"t$i")): _*)
  }

  /** [[funnelCounts]] semantics from one fact scan: each user at depth d
    * contributes to steps 1..d (`explode(sequence(1, depth))` — rows =
    * users × mean depth, a tiny keyed aggregation), left-joined back onto
    * the step list so a step no user reached still reports 0.
    */
  def funnelCountsSinglePass(ev: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = ev.sparkSession
    import spark.implicits._
    val perStep = sequentialFirsts(ev, steps, userCol, typeCol, tsCol)
      .filter(col("depth") >= 1)
      .select(explode(sequence(lit(1), col("depth"))).as("step"))
      .groupBy(col("step")).agg(count(lit(1)).as("users"))
    steps.zipWithIndex.map { case (s, i) => (i + 1, s) }
      .toDF("step", "event_type")
      .join(perStep, Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("users"), lit(0L)).as("users"))
      .orderBy(col("step"))
  }

  /** Per-user first-completion times: (user, t_1 … t_k) for users that
    * complete the whole funnel in order; `steps(i)` must occur strictly
    * after the user's first `steps(i-1)`.
    */
  def funnelTimes(ev: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    stages(ev, steps, userCol, typeCol, tsCol).zipWithIndex
      .map { case (df, i) => df.select(col(userCol), col("t").as(s"t${i + 1}")) }
      .reduce(_.join(_, Seq(userCol)))
  }

  /** The funnel summary: (step, event_type, users) with one row per step,
    * `users` = how many users have completed the funnel prefix up to and
    * including that step.
    */
  def funnelCounts(ev: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    stages(ev, steps, userCol, typeCol, tsCol).zip(steps).zipWithIndex
      .map { case ((df, s), i) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(s).as("event_type"), col("users"))
      }
      .reduce(_.unionByName(_))
      .orderBy(col("step"))
  }

  /** One DataFrame per step: (user, t) = first time the user completed
    * the funnel prefix ending at that step.
    */
  private def stages(ev: DataFrame, steps: Seq[String],
      userCol: String, typeCol: String, tsCol: String): Seq[DataFrame] =
    steps.foldLeft(Seq.empty[DataFrame]) { (acc, step) =>
      val hits = ev.filter(col(typeCol) === step)
      val stage = acc.lastOption match {
        case None =>
          hits.groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        case Some(prev) =>
          hits.join(prev.select(col(userCol), col("t").as("_pt")), Seq(userCol))
            .filter(col(tsCol) > col("_pt"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      }
      acc :+ stage
    }
}
