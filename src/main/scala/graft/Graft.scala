package graft

import org.apache.spark.sql.SparkSession

/** One-call session setup for the library: UTC session time zone (the
  * reference's monitoring timestamps are UTC), AQE on, shuffle
  * parallelism sized to the machine instead of the 200 default, and the
  * native vector functions injected — everything the individual
  * entry points otherwise configure piecemeal.
  *
  * {{{
  * val spark = Graft.session()                  // local dev
  * val spark = Graft.session("spark://…", 256)  // cluster
  * }}}
  */
object Graft {

  def session(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects unless
      // read as nanos-since-epoch (see Queries.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .getOrCreate()
    // extensions only apply to newly-built sessions; if getOrCreate reused
    // an existing one, fall back to runtime registration
    graft.functions.VectorFunctions.register(spark)
    spark
  }
}
