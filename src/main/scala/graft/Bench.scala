package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, materializing through the noop v2 sink.
  *
  * Output contract: stdout carries ONE COMPACT JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},...}` — the
  * wrapper that invokes this parses it out of the last ~2KB of the log
  * tail, so the line MUST stay short (runs/medians per query live in the
  * `SPARK_GRAFT_BENCH_OUT` file, default `bench_out.json`, which carries
  * the full-detail JSON). r3 regression to avoid: embedding raw per-run
  * arrays on stdout pushed the line past the tail window and the wrapper
  * recorded `parsed: null`.
  *
  * Per-query failures are REPORTED in an `"errors"` map and the failing
  * query's time is recorded as -1 — a crashing query must read as broken,
  * never as fast. Each query runs `SPARK_GRAFT_BENCH_REPS` times (default
  * 3) and reports the MIN (load-robust); the per-query MEDIAN ships in the
  * detail file, and any query whose median exceeds 1.5× its min surfaces
  * in the stdout `"rep_anomalies"` map so order-dependent degradation is
  * visible, not masked by min-of-N.
  *
  * Between reps the harness does a BLOCKING sweep of both the catalog
  * cache AND all persistent RDDs: operators that `localCheckpoint` their
  * intermediates (k-means fits, dup clustering rounds, LSH candidate
  * sets) leave blocks that `clearCache()` alone never frees, and across
  * 60+ queries × N reps that residue squeezes the storage region on a
  * memory-tight machine. The sweep runs OUTSIDE the timed window — it is
  * harness hygiene, not query cost.
  */
object Bench {

  /** Drop every cached plan and every persistent RDD (including
    * `localCheckpoint` blocks, which the catalog cache doesn't track),
    * blocking until the blocks are actually gone. Safe between queries:
    * nothing references the checkpointed lineage once the query's result
    * has materialized through the sink.
    */
  private[graft] def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // give the ContextCleaner its GC trigger: shuffle files and broadcast
    // blocks are reclaimed only when their driver-side handles are
    // collected, so across 70+ queries × N reps the local dirs otherwise
    // accumulate every shuffle ever written (disk + page-cache pressure
    // that lands on whichever query runs late in the sequence — the
    // mechanism behind median≫min rep anomalies). Harness hygiene,
    // outside the timed window.
    // SPARK_GRAFT_NO_GC_KICK: diagnostic escape hatch — disabling the kick
    // reintroduces measurable rep anomalies (median >> min), so the
    // default stays ON
    if (!sys.env.contains("SPARK_GRAFT_NO_GC_KICK")) System.gc()
  }

  private def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  /** Compact number form: 3 significant digits, no exponent for the
    * magnitudes a query time can take (0.001 .. 9999 s). Locale.ROOT:
    * a comma-decimal default locale would otherwise emit invalid JSON.
    */
  private def fmt(pattern: String, v: Double): String =
    String.format(java.util.Locale.ROOT, pattern, Double.box(v))
  private def jnum(v: Double): String =
    if (v < 0) "-1"
    else if (v >= 100) fmt("%.0f", v)
    else if (v >= 10) fmt("%.1f", v)
    else if (v >= 1) fmt("%.2f", v)
    else fmt("%.3f", v)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (scheduler, codegen, shuffle infra) so the
    // first measured query doesn't absorb ~5 s of JVM/session startup
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    // N repetitions per query, reporting the MIN: a loaded machine can
    // only make a run slower, never faster, so min-of-N is the estimator
    // that is robust to external load (a 3× outlier on one run cannot
    // manufacture a phantom regression). clamp to >= 1 and fall back on
    // unparsable input: a misconfigured wrapper (reps=0, reps="three")
    // must degrade to a sane rep count, not kill the whole bench
    val reps = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").trim.toInt).getOrElse(3))
    // local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the
    // run to the named queries (the driver never sets it — full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => SparkEntry.verifierOnly(name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var err: Option[String] = None
      val runs = (1 to reps).iterator.takeWhile(_ => err.isEmpty).map { _ =>
        val t0 = System.nanoTime()
        // noop v2 sink: full materialization of every column and sort —
        // count() would let Catalyst prune columns and eliminate ORDER BYs,
        // under-measuring the queries
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}")
        }
        val sec = if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0
        // drop caches AND checkpoint blocks the query left behind, outside
        // the timed window — rep N must not inherit rep N-1's residue
        sweep(spark)
        sec
      }.toSeq
      val sec = if (err.isEmpty) runs.min else -1.0
      // true median (mean of the two middles for even rep counts — the
      // upper-middle alone would bias the anomaly detector high)
      val med = if (err.isEmpty) {
        val s = runs.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      } else -1.0
      (name, sec, med, runs, err)
    }
    val mins = results.map { case (k, v, _, _, _) => jstr(k) + ":" + jnum(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, _, None) => v }.sum
    val totalMed = results.collect { case (_, _, m, _, None) => m }.sum
    // order-dependent degradation detector: a healthy query's median sits
    // within noise of its min; median >> min means later reps slowed down
    // (state pollution, eviction) and the min alone would hide it
    val anomalies = results.collect {
      case (k, v, m, _, None) if v > 0.2 && m > 1.5 * v =>
        jstr(k) + ":" + fmt("%.1f", m / v)
    }.mkString("{", ",", "}")
    val nErr = results.count(_._5.nonEmpty)
    val skipped = SparkEntry.verifierOnly.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    def line(withSkipped: Boolean): String =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$mins,"reps":$reps,"value_median":${jnum(totalMed)},"rep_anomalies":$anomalies,"errors":$errs,"n_errors":$nErr""" +
        (if (withSkipped) s""","skipped":$skipped""" else "") +
        s""","sf":"$sfDir"}"""
    // the wrapper's tail window is ~2000 chars and this line is the LAST
    // thing on stdout (showSuccess off), so anything under ~1950 keeps the
    // line start inside the window. Degrade ladder: drop `skipped`, then —
    // when many errors bloat the line past the window exactly when the
    // bench is most broken — fall back to a minimal always-parseable line
    // (full detail is in the out file regardless)
    val minimal =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":{},"reps":$reps,"value_median":${jnum(totalMed)},"rep_anomalies":{},"errors":{},"n_errors":$nErr,"note":"line overflow: per-query detail in bench_out.json","sf":"$sfDir"}"""
    val stdoutLine =
      if (line(true).length <= 1950) line(true)
      else if (line(false).length <= 1950) line(false)
      else minimal
    // full-detail twin (exact seconds, raw runs, medians) → the out file
    val qsFull = results.map { case (k, v, _, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val medFull = results.map { case (k, _, m, _, _) => jstr(k) + ":" + m }
      .mkString("{", ",", "}")
    val runsFull = results.map { case (k, _, _, runs, _) =>
      jstr(k) + ":" + runs.mkString("[", ",", "]") }.mkString("{", ",", "}")
    val fileJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"medians":$medFull,"runs":$runsFull,"reps":$reps,"value_median":$totalMed,"rep_anomalies":$anomalies,"errors":$errs,"n_errors":$nErr,"skipped":$skipped,"sf":"$sfDir"}"""
    println(stdoutLine)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench_out write failed: $e") }
    spark.stop()
  }
}
