package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the payload of
  * the latest right row with the same key and `rightTime <= leftTime`.
  * The canonical temporal-lookup operator Spark lacks as a built-in.
  *
  * Implementation is the union + ordered-window formulation rather than a
  * custom SparkPlan, per the compose-first preference:
  *
  *   1. union both sides into one keyed event stream (right rows tagged 0,
  *      left rows tagged 1, so equal timestamps see the right row first —
  *      `<=` semantics);
  *   2. one window pass per key ordered by (time, tag) propagates the most
  *      recent non-null payload (`last(..., ignoreNulls)` over
  *      rows-unbounded-preceding);
  *   3. keep the left rows, now carrying their as-of payload.
  *
  * Cost: ONE hash shuffle on the key + a per-key sort — same complexity as
  * a sort-merge join, no range explosion, no per-row lookups; left rows
  * with no prior right row keep NULL payload (left-join semantics).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry; names must not collide
    *                with left columns
    * @param rightTieBreak extra right-side ordering column for equal
    *                      timestamps (latest wins); pass a constant if ties
    *                      are impossible
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: String = null): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    val reserved = Seq("_ts", "_tag", "_tie")
    require(!(leftCols ++ payload).exists(reserved.contains),
      s"columns may not use the reserved names $reserved")

    val rightSchema = right.schema
    val tie = Option(rightTieBreak)

    // left rows: own columns + null payload slots
    val lSel: Seq[Column] =
      leftCols.map(col) ++
        Seq(col(leftTime).as("_ts"), lit(1).as("_tag"), lit(0L).as("_tie")) ++
        payload.map(c => lit(null).cast(rightSchema(c).dataType).as(c))
    // right rows: key + payload, null left-only columns
    val rSel: Seq[Column] =
      leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("_ts"), lit(0).as("_tag"),
          tie.map(col(_).cast("long")).getOrElse(lit(0L)).as("_tie")) ++
        payload.map(col)

    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c))

    unioned
      .select((leftCols.map(col) :+ col("_tag")) ++ filled: _*)
      .filter(col("_tag") === 1)
      .drop("_tag")
  }
}
