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
  *      recent right row's payload as ONE struct column
  *      (`last(struct, ignoreNulls)` over rows-unbounded-preceding) — the
  *      struct is null for left rows and non-null for every right row, even
  *      when individual payload values are null, so the whole matched right
  *      row wins atomically: a null payload value is carried as null rather
  *      than backfilled from an older right row, and multiple payload
  *      columns can never be stitched from different right rows;
  *   3. keep the left rows, expand the struct back into payload columns.
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
    val reserved = Seq("_ts", "_tag", "_tie", "_payload")
    require(!(leftCols ++ payload).exists(reserved.contains),
      s"columns may not use the reserved names $reserved")

    val rightSchema = right.schema
    val tie = Option(rightTieBreak)
    val payloadType = org.apache.spark.sql.types.StructType(payload.map(rightSchema(_)))

    // left rows: own columns + a NULL payload struct
    val lSel: Seq[Column] =
      leftCols.map(col) ++
        Seq(col(leftTime).as("_ts"), lit(1).as("_tag"), lit(0L).as("_tie"),
          lit(null).cast(payloadType).as("_payload"))
    // right rows: key + the whole payload as one NON-NULL struct (its
    // members may individually be null), null left-only columns
    val rSel: Seq[Column] =
      leftCols.map(c => if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("_ts"), lit(0).as("_tag"),
          tie.map(col(_).cast("long")).getOrElse(lit(0L)).as("_tie"),
          struct(payload.map(col): _*).as("_payload"))

    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // ONE last() over the struct: the latest right row wins as a unit
    val filled = last(col("_payload"), ignoreNulls = true).over(w).as("_payload")

    unioned
      .select(leftCols.map(col) ++ Seq(col("_tag"), filled): _*)
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_payload.$c").as(c)): _*)
  }
}
