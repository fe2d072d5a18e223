package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data preparation pipeline — the composition a
  * user of this library actually ships, wired from the individually
  * oracle-gated stages:
  *
  *   1. quality gate — [[TextAnalysis.gopherFilter]] (length, stopword
  *      density, repetition);
  *   2. near-dup removal — [[Dedup.nearDupPipeline]] candidates (LSH
  *      banding → exact Jaccard verify); every pair keeps its smaller
  *      doc_id (transitively: any doc that appears as a dropped side goes);
  *   3. language rebalancing — [[TextAnalysis.stratifiedSample]];
  *   4. train split — [[TextAnalysis.deterministicSplit]];
  *   5. sequence packing — [[TextAnalysis.packSequences]].
  *
  * Every stage keeps its individual scale shape (per-row maps, banded
  * candidate joins, two-phase prefix sum), so the composition inherits
  * them; the whole thing is one lazy plan until the sink.
  *
  * Output: (doc_id, n_tokens, seq_id, seq_offset) for the train split.
  */
object TrainingPipeline {

  def trainingSet(docs: DataFrame,
      minTokens: Long = 30, minStopwordRatio: Double = 0.01,
      maxRepRatio: Double = 0.6, dupThreshold: Double = 0.8,
      sampleFractions: Map[String, Double] = Map("en" -> 0.5),
      trainPct: Int = 80, valPct: Int = 10,
      maxTokens: Long = 512): DataFrame = {
    // cached: three downstream consumers (dedup shingles, the rebalance
    // join, packing) would each re-run the scan + quality gate otherwise
    val clean = docs.join(
      TextAnalysis.gopherFilter(docs, minTokens, minStopwordRatio, maxRepRatio)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .cache()
    val dropped = Dedup.nearDupPipeline(clean, dupThreshold)
      .select(col("b").as("doc_id")).distinct()
    val surviving = clean.join(dropped, Seq("doc_id"), "left_anti")
    val sampled = TextAnalysis.stratifiedSample(surviving, "lang", sampleFractions)
    val train = TextAnalysis.deterministicSplit(sampled, trainPct = trainPct, valPct = valPct)
      .filter(col("split") === "train")
      .drop("split")
    TextAnalysis.packSequences(train, maxTokens)
  }
}
