package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Similarity, TextAnalysis}

/** Streaming twin of the batch training-data pipeline
  * ([[graft.ext.TrainingPipeline]]) — continuous corpus ingestion:
  *
  *   1. exact dedup ACROSS micro-batches: `dropDuplicatesWithinWatermark`
  *      keyed on the 16-byte text fingerprint. Streaming state holds one
  *      fingerprint per distinct document inside the watermark horizon —
  *      never the text — and late duplicates beyond the horizon age out
  *      (dedup is exact within the horizon, at-least-once beyond it; the
  *      horizon is the state-size-vs-dedup-window dial at scale).
  *   2. quality gate + deterministic split inside `foreachBatch`: the
  *      Gopher metrics and the hash split are PER-DOCUMENT computations,
  *      so micro-batch boundaries cannot change any verdict — running
  *      them batch-by-batch is exactly equal to running them once over
  *      the union (the convergence spec pins this down).
  *   3. the surviving train split lands in a batch-id-keyed parquet
  *      partition (`batch=<id>` + overwrite), so a replayed micro-batch
  *      rewrites its own directory instead of appending duplicates —
  *      effectively exactly-once on top of foreachBatch's at-least-once.
  *
  * Near-dup (LSH) removal is deliberately NOT in the streaming tier: its
  * banding joins need corpus-wide signatures. Production runs
  * [[graft.ext.Dedup.nearDupPipeline]] as the periodic batch compaction
  * pass over this landing zone — stream for freshness, batch for the
  * corpus-wide invariants.
  */
object StreamingCorpus {

  /** Start the ingestion flow on a streaming `docs` frame with columns
    * (doc_id, text, lang, source, event_time). Returns the running query;
    * the train split lands at `outDir` as appended parquet.
    */
  def trainIngest(docs: DataFrame, outDir: String, checkpointDir: String,
      watermark: String = "1 hour",
      minTokens: Long = 30, minStopwordRatio: Double = 0.01,
      maxRepRatio: Double = 0.6, trainPct: Int = 80, valPct: Int = 10,
      nearDupThreshold: Option[Double] = None): StreamingQuery = {
    val deduped = docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // every cache created in this batch is registered here and dropped
        // BY PLAN in the finally once the write action has materialized —
        // never a session-wide clearCache, which would nuke co-resident
        // workloads' caches in a shared session
        val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val b = batch.drop("event_time").cache()
        caches += b
        try {
          val gated = b.join(
            TextAnalysis.gopherFilter(b, minTokens, minStopwordRatio, maxRepRatio)
              .select(col("doc_id")),
            Seq("doc_id"), "left_semi")
          // optional WITHIN-BATCH near-dup removal (LSH candidates + exact
          // verify over just this micro-batch; smaller doc_id survives) —
          // cross-batch near-dup detection needs corpus-wide signatures and
          // stays the batch compaction pass
          val clean = nearDupThreshold.fold(gated) { th =>
            val g = gated.cache()
            caches += g
            val dropped = graft.ext.Dedup.nearDupPipeline(g, th,
                cacheRegistry = Some(caches))
              .select(col("b").as("doc_id")).distinct()
            g.join(dropped, Seq("doc_id"), "left_anti")
          }
          // batch-id-keyed partition + overwrite = idempotent under
          // foreachBatch's at-least-once replays: a re-delivered batch
          // rewrites its own directory instead of appending duplicates,
          // so the landing zone is effectively exactly-once. Readers see
          // one extra partition column (`batch`) via discovery.
          TextAnalysis.deterministicSplit(clean, trainPct = trainPct, valPct = valPct)
            .filter(col("split") === "train")
            .drop("split")
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        } finally { caches.foreach(_.unpersist()); () }
      }
      .start()
  }

  /** Streaming embedding ingestion into a PERSISTED IVF index: each
    * micro-batch of (vec_id, embedding) rows is assigned to the index's
    * frozen centroids and appended into its cell partitions
    * ([[graft.ext.Similarity.appendToIvfIndex]]) — queries via
    * `ivfTopKFromIndex` see new vectors as soon as their batch lands,
    * still through the same partition-pruned probing. Centroid drift is a
    * periodic-rebuild concern, exactly as in the batch append path. The
    * exactly-once story matches the corpus sink: each micro-batch lands in
    * a `batch=<epoch id>` partition of the index with OVERWRITE, so an
    * at-least-once replay rewrites its own directory instead of
    * re-appending duplicate vec_ids — the same idempotence discipline as
    * [[trainIngest]]'s landing zone.
    */
  def indexIngest(vectors: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          Similarity.appendToIvfIndex(batch.sparkSession, indexDir, batch,
            batchId = Some(batchId))
        ()
      }
      .start()
}
