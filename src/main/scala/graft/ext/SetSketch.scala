package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values" / theta-sketch family) DISTINCT-SET algebra —
  * the sketch that answers what HLL cannot: set INTERSECTION between
  * segments ("how many users were active in BOTH weeks?"). An HLL union
  * composes, but inclusion–exclusion on two ±2 % estimates destroys a
  * small intersection; the KMV sample supports a direct estimate (Beyer
  * et al., SIGMOD'07): keep each set's k smallest hash values, θ = the
  * union sketch's k-th smallest hash as a fraction of hash space, then
  * `|A∪B| ≈ (k−1)/θ` and `|A∩B| ≈ (common in-sketch fraction) · |A∪B|`.
  *
  * Everything here is DETERMINISTIC — the hash is the portable md5-prefix
  * ([[TextAnalysis.portableHash64]]) and min-k is order-independent — so
  * the DuckDB oracle replays the SKETCH ITSELF bit-for-bit (`ORDER BY h
  * LIMIT k` per side) and the estimates land on identical doubles: the
  * countMin discipline, strictly stronger than a pinned error flag.
  *
  * Scale shape: one corpus pass per side through the bounded mergeable
  * [[MinKAggregator]] (O(k) state, map-side partial min-k, O(k) shuffle
  * bytes TOTAL per side — no distinct shuffle anywhere: the aggregator
  * dedups in-buffer); the estimate algebra runs on two 1-row broadcast
  * frames. The exact sides are the gate VERIFIERS (distinct semi-joins,
  * linear but shuffle-bearing — at 100 TB you'd keep only the sketch
  * path and spot-check).
  */
object SetSketch {

  /** Bounded mergeable min-k-distinct aggregator over 64-bit hashes:
    * buffers hold ≤k sorted DISTINCT values (duplicates skipped at
    * insert, so the input needs no distinct pre-shuffle), reduce is a
    * bounded ordered insert with fast exit on `h ≥ current k-th`, merge
    * is a linear sorted dedup-merge — the [[Similarity.TopKAggregator]]
    * discipline pointed at minima.
    */
  final class MinKAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Seq.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.length >= k && buf.last <= h) buf
      else {
        val (below, rest) = buf.span(_ < h)
        if (rest.headOption.contains(h)) buf // already present
        else {
          val ins = (below :+ h) ++ rest
          if (ins.length > k) ins.take(k) else ins
        }
      }
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var (i, j) = (0, 0)
      while (out.length < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (out.isEmpty || out.last != v) out += v
      }
      out.toSeq
    }
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      bufferEncoder
  }

  /** Hash space size as a double: the portable hash is 60 bits (15 hex
    * chars), so values are uniform on [0, 2⁶⁰).
    */
  private val HashSpace: Double = 1152921504606846976.0

  /** Distinct-user overlap between two time windows: KMV sketch per
    * side + the intersection estimate, next to the exact verifier
    * counts. One row out; see object doc for the estimate algebra and
    * why the whole row is hash-gated.
    */
  def userOverlap(events: DataFrame, fromA: String, toA: String,
      fromB: String, toB: String, k: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val hashed = events.select(col("ts"),
      TextAnalysis.portableHash64(col("user_id").cast("string")).as("h"))
    def window(from: String, to: String): DataFrame =
      hashed.filter(col("ts") >= to_timestamp(lit(from)) &&
        col("ts") < to_timestamp(lit(to)))
    val minK = new MinKAggregator(k)
    def sketchOf(df: DataFrame, name: String): DataFrame =
      df.select(col("h")).as[Long].select(minK.toColumn.name(name)).toDF(name)
    val ska = sketchOf(window(fromA, toA), "ska")
    val skb = sketchOf(window(fromB, toB), "skb")
    def exactOf(df: DataFrame, name: String): DataFrame =
      df.agg(countDistinct(col("h")).as(name))
    val exA = exactOf(window(fromA, toA), "exact_a")
    val exB = exactOf(window(fromB, toB), "exact_b")
    val exO = window(fromA, toA).select(col("h")).distinct()
      .join(window(fromB, toB).select(col("h")).distinct(), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("exact_overlap"))
    ska.crossJoin(broadcast(skb))
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("n_sk_union", size(col("u")).cast("long"))
      // guarded: both windows empty → empty union sketch, and
      // element_at(_, 0) raises ARRAY_INDEX_0 instead of returning a row
      .withColumn("kth", when(size(col("u")) > 0,
        element_at(col("u"), size(col("u")))).otherwise(lit(null)))
      .withColumn("common", size(
        array_intersect(array_intersect(col("u"), col("ska")), col("skb"))).cast("long"))
      .withColumn("est_union",
        when(col("n_sk_union") < k, col("n_sk_union").cast("double"))
          .otherwise(round(lit((k - 1) * HashSpace) / col("kth"), 4)))
      .withColumn("est_inter",
        when(col("n_sk_union") < k, col("common").cast("double"))
          .otherwise(round(col("common") * col("est_union") / k, 4)))
      .crossJoin(broadcast(exA)).crossJoin(broadcast(exB)).crossJoin(broadcast(exO))
      .select(col("n_sk_union"), col("kth"), col("common"),
        col("est_union"), col("est_inter"),
        col("exact_a"), col("exact_b"), col("exact_overlap"))
  }
}
