package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Queries.table(spark, "/root/testdata/sf0.1", "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    time("shingles")(graft.ext.Dedup.shingles(docs).count())
    time("signatures")(graft.ext.Dedup.minhashSignatures(docs).count())
    val sig = graft.ext.Dedup.minhashSignatures(docs).cache()
    time("sig_cached")(sig.count())
    time("bands")(graft.ext.Dedup.minhashBands(sig).count())
    import org.apache.spark.sql.functions._
    val bandDf = graft.ext.Dedup.minhashBands(sig)
    time("cand")(bandDf.select(col("doc_id").as("a"), col("band"), col("key"))
      .join(bandDf.select(col("doc_id").as("b"), col("band"), col("key")), Seq("band","key"))
      .filter(col("a") < col("b")).select(col("a"),col("b")).distinct().count())
    time("full")(graft.ext.Dedup.minhashCandidatePairs(docs).count())
    import org.apache.spark.sql.functions.xxhash64
    val shd = graft.ext.Dedup.shingles(docs)
    time("jac_distinct")(shd.count())
    time("jac_hashed_distinct")(graft.ext.Dedup.shinglesMultiset(docs)
      .select(col("doc_id"), xxhash64(col("sh")).as("sh")).distinct().count())
    time("jac_full")(graft.ext.Dedup.ngramJaccardPairs(docs).count())
    time("simhash_sig")(graft.ext.Dedup.simhash64(docs).count())
    time("simhash_full")(graft.ext.Dedup.simhashCandidatePairs(docs, 6).count())
    spark.stop()
  }
}
