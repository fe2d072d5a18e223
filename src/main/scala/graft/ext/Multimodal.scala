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

  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])
  final case class FrameSample(
      doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** STUB resize: deterministic payload transform targeting (w, h). The
    * real implementation re-encodes via a codec; the stub truncates/pads
    * the payload proportionally so output size tracks target dims —
    * enough to exercise schema + batch plumbing downstream.
    */
  def resizeStubBatch(target: (Int, Int))(rows: Iterator[MediaRow]): Iterator[ResizedMedia] = {
    val (w, h) = target
    rows.map { r =>
      val outLen = math.max(1, math.min(r.payload.length, w * h / 128))
      ResizedMedia(r.doc_id, w, h, java.util.Arrays.copyOf(r.payload, outLen))
    }
  }

  /** STUB frame sampling: every `stride`-th chunk of the payload plays a
    * video frame. Real impl: demux + keyframe selection; the explode shape
    * (1 row in → n_frames rows out) is the contract.
    */
  def frameSampleStubBatch(stride: Int)(rows: Iterator[MediaRow]): Iterator[FrameSample] =
    rows.flatMap { r =>
      val nFrames = (1 + r.payload.length % 30).toInt
      (0 until nFrames by stride).map { i =>
        val from = math.min(i * 16, math.max(0, r.payload.length - 1))
        val until = math.min(from + 16, r.payload.length)
        FrameSample(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }

  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(resizeStubBatch((w, h)) _)
  }

  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 2): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(frameSampleStubBatch(stride) _)
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
