package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning, typed
  * batch iteration — while the actual media decode is STUBBED with a
  * deterministic arithmetic fake (this container ships no image/audio
  * codecs). A production deployment replaces [[decodeStubBatch]]'s body
  * with a JNI/FFI codec call; nothing else changes.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, checksum: String)

  /** Build an opaque-binary media table from `documents` (text bytes stand
    * in for encoded media — the plumbing doesn't care what the bytes are).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("fake/media-"), col("source")).as("media_type"))

  /** STUB decode: deterministic pseudo-features from payload length.
    * Replace with a real codec for production; signature and batch shape
    * are the contract.
    */
  def decodeStubBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val len = r.payload.length.toLong
      MediaFeatures(
        doc_id = r.doc_id,
        byte_len = len,
        media_type = r.media_type,
        width = (64 + len % 512).toInt,
        height = (64 + (len * 7) % 512).toInt,
        n_frames = (1 + len % 30).toInt,
        checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString)
    }

  /** Batch feature extraction over the binary column: `mapPartitions` so a
    * real decoder amortizes per-partition init (model load, codec setup) —
    * the Scala analog of `mapInPandas` batching.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeStubBatch _)
  }

  /** Declarative twin of the stub decode (same arithmetic as pure Catalyst
    * expressions) — used by the oracle-checked query; proves the plumbing
    * and the batch path agree (asserted in tests).
    */
  def featuresExpr(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      col("media_type"),
      (lit(64) + length(col("payload")).cast("long") % 512).cast("int").as("width"),
      (lit(64) + (length(col("payload")).cast("long") * 7) % 512).cast("int").as("height"),
      (lit(1) + length(col("payload")).cast("long") % 30).cast("int").as("n_frames"),
      md5(col("payload")).as("checksum"))
}
