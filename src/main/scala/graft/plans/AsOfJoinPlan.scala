package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.PlanBridge

/** As-of join as a first-class Catalyst operator — the full custom-plan
  * path (logical node → planner strategy → physical sort-merge exec),
  * semantically identical to the composed window formulation in
  * [[graft.operators.AsOfJoin]] (the equivalence is spec- and
  * oracle-pinned).
  *
  * Why a physical operator when the composition already works: the
  * composed form materializes a UNION of both sides and runs a
  * whole-partition window (one shuffle of left+right TOGETHER, every left
  * row carries null payload slots through the exchange, the window sort
  * buffers the union). The exec shuffles each side independently on its
  * own key, lets EnsureRequirements co-partition and sort them, and then
  * streams BOTH sorted iterators through a single forward-only merge pass
  * per partition — no union row widening, no window buffer, O(1) state
  * (the latest matching right row) beyond the sort. Same exchange count,
  * strictly less data per exchange, and the merge is pipelined rather
  * than buffered.
  *
  * Semantics: for every left row, attach the payload of the latest right
  * row with an equal key and `rightTime <= leftTime` (ties on rightTime
  * broken by `rightTie`, largest wins); left rows with no match keep null
  * payload. Null keys group together (as in the window formulation) and
  * null right times sort first, i.e. match any left time — both pinned by
  * the equivalence spec.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Option[Attribute],
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // generic optimizer rules (column pruning) must see EVERYTHING this node
  // consumes: all left columns pass through to the output, while the right
  // side genuinely needs only key + time + tie + payload — so pruning is
  // free to strip any other right-side column down into the scan
  override def references: AttributeSet =
    AttributeSet(left.output) ++
      AttributeSet(Seq(rightKey, rightTime) ++ rightTie ++ payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical node form, one physical form. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, payload) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Declares, rather than implements, its distribution needs: each child
  * requires `ClusteredDistribution` on its key and an ascending
  * (key, time[, tie]) ordering, and EnsureRequirements inserts the
  * exchanges and sorts — so AQE, whole-stage-codegen'd children, reused
  * exchanges and skew handling all compose with this operator for free.
  * `doExecute` is a per-partition two-iterator merge: advance the right
  * iterator while its (key, time) is at or behind the current left row,
  * remembering only the latest payload for the CURRENT key — the match
  * state is one buffered row, never a range buffer, because "latest at or
  * before" needs exactly one candidate once inputs are sorted.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Option[Attribute],
    payload: Seq[Attribute]) extends BinaryExecNode {

  private val payloadOut = payload.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTie.map(SortOrder(_, Ascending)))

  // left rows stream through in their sorted order, on their partitioning —
  // a downstream consumer needing (key, time) order pays no second sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // capture plain values — the closure must not drag the SparkPlan in
    val lOut = left.output
    val rOut = right.output
    val (lKey, rKey, lTime, rTime) = (leftKey, rightKey, leftTime, rightTime)
    // the NULLABLE payload view everywhere downstream: unmatched left rows
    // emit a null payload row, so binding the result projection against
    // the original (possibly non-nullable) attributes would let codegen
    // skip the null check and read garbage instead of null
    val payloadAttrs = payloadOut
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd helpers are built per partition, on the executor
      val lKeyProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKey), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow

      // one-row lookahead over the right side; rows are copied because the
      // upstream sorter reuses its row buffer
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      // the latest matching right payload and the key it belongs to
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyProj(lRow) // valid until the next left row
        var advancing = true
        while (rHead != null && advancing) {
          val c = keyOrd.compare(rKeyProj(rHead), lk)
          if (c < 0) {
            // right rows for keys already passed: discard
            rHead = if (rIter.hasNext) rIter.next().copy() else null
          } else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lTimeProj(lRow)) <= 0) {
            // at-or-before right row for THIS key: later ones overwrite
            // earlier ones (sorted by time then tie ⇒ latest + tie-break
            // win), so the state is exactly one buffered payload
            lastMatch = payloadProj(rHead).copy()
            lastMatchKey = rKeyProj(rHead).copy()
            rHead = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        // the buffered match may be from an earlier key (left can skip
        // keys the right side never had, and vice versa) — emit it only
        // for its own key
        val matched =
          lastMatch != null && keyOrd.compare(lastMatchKey, lk) == 0
        resultProj(joined(lRow, if (matched) lastMatch else nullPayload))
      }
    }
  }
}

/** DataFrame-level entry point. */
object AsOfJoinPlans {

  /** As-of join `left` to `right` through the custom operator; same
    * argument contract as [[graft.operators.AsOfJoin.asOfJoin]].
    * Registers [[AsOfJoinStrategy]] on the session's experimental
    * strategies if absent, so it works in any session; deployments using
    * `spark.sql.extensions=graft.GraftExtensions` get the strategy
    * injected at session build instead.
    */
  def asOfJoinExec(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String], rightTieBreak: String = null): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    require(!payload.exists(left.columns.contains),
      s"payload columns ${payload.filter(left.columns.contains)} collide with left columns")
    val lPlan = left.queryExecution.analyzed
    // SELF-JOIN SAFETY: when both sides derive from the same Dataset their
    // subtrees share expression ids. The analyzer's DeduplicateRelations
    // re-ids the right SUBTREE but cannot know which of this custom node's
    // attribute fields belong to which side — so give the right side fresh
    // ids OURSELVES via a Project of aliases, and resolve the node's
    // right-side fields against those. The subtree under the Project may
    // then be re-ided freely; the alias ids the node holds stay valid.
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' (has: ${out.map(_.name).mkString(", ")})"))
    val rOut = rAliases.map(_.toAttribute)
    val (lk, rk) = (attr(lPlan.output, key, "left"), attr(rOut, key, "right"))
    val (lt, rt) = (attr(lPlan.output, leftTime, "left"), attr(rOut, rightTime, "right"))
    // the exec hashes each side on its own column and compares right rows
    // with orderings built from the LEFT types — a type mismatch would not
    // error, it would silently drop matches (different hashes for equal
    // values, garbage comparisons), so reject it here
    require(lk.dataType == rk.dataType,
      s"key type mismatch: left '$key' is ${lk.dataType}, right is ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time type mismatch: left '$leftTime' is ${lt.dataType}, right '$rightTime' is ${rt.dataType}")
    PlanBridge.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan, lk, rk, lt, rt,
      Option(rightTieBreak).map(attr(rOut, _, "right")),
      payload.map(attr(rOut, _, "right"))))
  }
}
