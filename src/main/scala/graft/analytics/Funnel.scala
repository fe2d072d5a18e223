package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: how many users complete step 1,
  * then step 2 strictly after their first step 1, then step 3 strictly
  * after that, … — the standard product-analytics conversion operator
  * (and, in a training-data pipeline, the behavioral-cohort selector).
  *
  * Scale shape: each stage is `filter(type) → join(prev stage) →
  * groupBy(user).min(ts)`. Every join and aggregation keys on the user
  * column, so after the first exchange the whole chain reuses ONE hash
  * partitioning — Catalyst inserts no further user-keyed exchanges — and
  * each stage's state is one timestamp per surviving user (monotonically
  * shrinking). The events input is scanned once per step with the step
  * predicate pushed into the scan; no windows over whole user histories,
  * no per-user event collections.
  */
object Funnel {

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
