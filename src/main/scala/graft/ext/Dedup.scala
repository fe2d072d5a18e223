package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star
  * extension surface; BASELINE.json). Operates on the `documents` table
  * (`doc_id, text, lang, source, n_chars`).
  *
  * Scale posture: exact dedup is a hash aggregation on a text fingerprint —
  * group on `md5(text)` (16-byte key) rather than the raw text so the
  * shuffle moves fingerprints, not 100 TB of document bodies.
  */
object Dedup {

  /** Exact dedup: one representative (min doc_id) per distinct text, with
    * multiplicity. At scale: shuffle keys are md5 fingerprints; payload
    * columns are pruned before the exchange.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Exact-dedup filter form: the surviving rows themselves (what a
    * pipeline actually feeds downstream).
    */
  def exactSurvivors(docs: DataFrame): DataFrame = {
    val keep = exact(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }
}
