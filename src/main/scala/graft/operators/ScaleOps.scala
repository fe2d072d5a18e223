package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB regime: skew salting and
  * bucketed co-located joins. These don't change results — they change
  * which Exchange operators exist, which is what decides whether a job
  * finishes at scale. (AQE's skew-join handles moderate skew adaptively;
  * salting is the explicit tool for pathological keys, bucketing removes
  * the shuffle entirely for repeated joins on the same key.)
  */
object ScaleOps {

  /** Salted equi-join for a skewed fact side. The fact's join key is
    * extended with a deterministic salt in [0, saltFactor); the (small,
    * broadcastable-or-not) dim side is replicated once per salt value.
    * A hot key's rows land in saltFactor different partitions instead of
    * one straggler.
    *
    * @param factUniqueCol any fact column with high cardinality (row id);
    *                      drives the deterministic salt assignment
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      factUniqueCol: String): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(factUniqueCol)), lit(saltFactor.toLong)).cast("int"))
    val replicatedDim = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join bucket-to-bucket with NO Exchange — the
    * shuffle is paid once at write time and amortized over every
    * subsequent join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // a prior session's managed-table directory can outlive the in-memory
    // catalog entry; saveAsTable then fails LOCATION_ALREADY_EXISTS on a
    // table the catalog has never heard of — clear the orphan first
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  /** Interval (range) join without the quadratic blowup: rows of `left`
    * and `right` sharing `key` whose epoch-microsecond columns differ by
    * at most `gapUs`. Bins both sides into gap-sized buckets, explodes the
    * left side into bucket±1, equi-joins on (key, bucket), exact-filters —
    * each qualifying pair matches exactly once (the right side keeps one
    * bucket per row), so no dedup pass is needed. Cost is O(pairs within
    * ±1 bucket) instead of O(|left| × |right|) per key.
    *
    * Inputs carry their epoch-µs in `lUsCol`/`rUsCol` (e.g.
    * `unix_micros(col("ts"))` projected beforehand); output keeps all
    * columns from both sides plus `delta_us` = right − left.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      lUsCol: String, rUsCol: String, gapUs: Long): DataFrame = {
    val binExpr = (c: String) => (col(c) / gapUs).cast("long")
    val binned = left.withColumn("_bin", explode(array(
      binExpr(lUsCol) - 1, binExpr(lUsCol), binExpr(lUsCol) + 1)))
    val rightB = right.withColumn("_bin", binExpr(rUsCol))
    binned.join(rightB, Seq(key, "_bin"))
      .filter(abs(col(lUsCol) - col(rUsCol)) <= gapUs)
      .withColumn("delta_us", col(rUsCol) - col(lUsCol))
      .drop("_bin")
  }

  /** Small-files compaction for an append-accumulated parquet directory:
    * rewrite the table into ⌈bytes / targetBytes⌉ files. Streaming sinks
    * and per-run appends leave one small file per micro-batch/run; at
    * scale that turns every scan into a listing + footer-read storm —
    * compaction restores big sequential reads. The rewrite goes to a
    * staging directory first and swaps in via rename, so a crash mid-
    * compaction leaves the original table intact (the swap itself is the
    * non-transactional instant a Delta/Iceberg log would close).
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val bytes = fs.getContentSummary(path).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(
      dir + ".compact-" + java.util.UUID.randomUUID())
    spark.read.parquet(dir).repartition(n).write.parquet(staging.toString)
    // swap via rename-aside: the original is moved (not deleted) before the
    // staging copy takes its place, so a crash never leaves the table path
    // empty with data only in an unadvertised staging dir — the unsafe
    // window shrinks to the single rename into place
    val old = new org.apache.hadoop.fs.Path(
      dir + ".old-" + java.util.UUID.randomUUID())
    if (!fs.rename(path, old)) {
      fs.delete(staging, true) // the live table is untouched; staging is redundant
      sys.error(s"compaction aside-rename failed for $dir (table untouched)")
    }
    if (!fs.rename(staging, path)) {
      val restored = fs.rename(old, path) // roll back: restore the original table
      // after a successful rollback the staging copy is redundant — delete
      // it so retry loops don't accumulate table-sized orphans; on
      // rollback failure keep EVERYTHING and say where the data lives
      if (restored) fs.delete(staging, true)
      sys.error(
        if (restored) s"compaction swap failed for $dir (original restored)"
        else s"compaction swap failed for $dir AND rollback failed - original data is at $old, compacted copy at $staging")
    }
    fs.delete(old, true)
  }

  /** Hive-style date-partitioned layout: one directory per day. Readers
    * filtering on the partition column prune whole directories before any
    * file is opened — the standard data-lake layout for time-series fact
    * tables at scale.
    */
  def writePartitionedByDate(df: DataFrame, dir: String, tsCol: String): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(dir)

  /** Morton (Z-order) value of two non-negative integer columns: the low
    * `bits` bits of `x` and `y` interleaved (x in even positions, y in
    * odd). Rows close in BOTH dimensions get close z-values, so a
    * range-partition + sort on z clusters each file into a small
    * rectangle of (x, y) space — min/max file statistics then prune
    * multi-dimensional predicates, which no single-column sort can do.
    * Callers bucket/normalize real values into [0, 2^bits) first.
    *
    * Pure bit arithmetic (shift/and/or chain), whole-stage-codegen'd,
    * and exactly reproducible in any engine — the oracle replays it
    * bit-for-bit in DuckDB.
    */
  /** Join-key skew diagnostic — the measurement that decides when
    * [[saltedJoin]] (or AQE skew handling) is actually needed: per-key
    * counts ranked heaviest-first with share and cumulative share, plus
    * the key distribution's Gini coefficient and a salt recommendation
    * stamped on every row — the top key flags when its share exceeds
    * BOTH `saltShare` (absolute straggler floor) and 2× the fair share
    * `1/n_keys` (so a uniform low-cardinality key set never flags). Run it
    * on tomorrow's join key BEFORE the 100 TB job, not after the one
    * straggler task has been running for six hours.
    *
    * Determinism: shares and cumulative shares derive from exact integer
    * prefix sums (never a cumulative double window — not
    * summation-order-robust across engines); the Gini uses the closed
    * form `Σ(2i−k−1)·n_i / (k·N)` over keys sorted ascending with id
    * tiebreak — all-integer numerator.
    *
    * Scale shape: one map-side-combinable count by key, then windows
    * over the key-cardinality frame (keys, not rows); output is topK.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10,
      saltShare: Double = 0.05): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    val asc = w.orderBy(col("n"), col("key"))
    val desc = w.orderBy(col("n").desc, col("key"))
    val stats = counts
      .withColumn("i", row_number().over(asc))
      .crossJoin(broadcast(tot))
      .agg(sum((lit(2) * col("i") - col("n_keys") - 1) * col("n")).as("gnum"),
        min(col("total")).as("total"), min(col("n_keys")).as("n_keys"))
    counts
      .withColumn("rank", row_number().over(desc))
      .withColumn("cumn", sum(col("n")).over(
        desc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(stats))
      // exact integer-ratio rounding: counts over a power-of-10 total sit
      // on the .xxxx5 tie once per ~10 cells (the r9 sf0.1 catch)
      .select(col("rank"), col("key"), col("n"),
        graft.functions.Exact.ratioR(col("n"), col("total"), 4).as("share"),
        graft.functions.Exact.ratioR(col("cumn"), col("total"), 4).as("cum_share"),
        graft.functions.Exact.ratioR(col("gnum"),
          col("n_keys") * col("total"), 4).as("gini"),
        (col("rank") === 1 && col("n").cast("double") / col("total") >
          greatest(lit(saltShare), lit(2.0) / col("n_keys")))
          .as("salt_recommended"))
      .orderBy(col("rank"))
  }

  /** Columns whose per-file min/max land in the manifest. Fixed order —
    * the manifest schema is part of the store format.
    */
  private val ManifestStatCols = Seq("event_id", "user_id", "ts_us")

  /** Write `df` date-partitioned (one file per day) WITH a min-max file
    * manifest at `dir/_manifest` — Delta/Iceberg-style data skipping
    * re-expressed over plain parquet (the container has no Delta jars;
    * this is the capability its transaction log would carry).
    *
    * The manifest rows are computed from the WRITTEN files read back
    * (grouped by `_metadata.file_path`), never from the input frame — the
    * stats describe what is actually on disk, so a reshuffling write or a
    * reader with different session confs can't drift from them. Each row:
    * relative file path, partition value, row count, and min/max of
    * [[ManifestStatCols]]. The `_`-prefixed directory name means plain
    * `spark.read.parquet(store)` ignores the manifest (Hadoop hides `_`
    * paths from input listings, the same convention as `_SUCCESS`), while
    * pointing a reader AT `dir/_manifest` reads it — exactly how Delta's
    * `_delta_log` coexists with its data files.
    *
    * Scale shape: the store write is one hash-partition-by-day shuffle
    * (each day lands wholly in one task → exactly one file per partition
    * dir); the manifest pass is one map-side-combinable groupBy whose
    * output is file-count-sized (at 100 TB / 128 MB ≈ 800k rows — a
    * MANIFEST TABLE, never driver state).
    */
  def writeDateStoreWithManifest(df: DataFrame, dir: String,
      tsCol: String = "ts"): Unit = {
    val spark = df.sparkSession
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("p_date"))
      .write.mode("overwrite").partitionBy("p_date").parquet(dir)
    val rb = spark.read.parquet(dir)
      .withColumn("ts_us", unix_micros(col(tsCol)))
    writeManifest(rb, dir, ManifestStatCols,
      Seq(col("p_date").cast("string").as("p_date")))
  }

  /** Shared manifest writer: per-file stats over a read-back `rb` of the
    * store at `dir`, path stored RELATIVE to the store root (derived by
    * stripping each file's own `_metadata` prefix — no layout-specific
    * regex), plus any extra file-constant key columns (e.g. the hive
    * partition value).
    */
  private[graft] def writeManifest(rb: DataFrame, dir: String,
      statsCols: Seq[String], extraKeys: Seq[org.apache.spark.sql.Column]): Unit = {
    // _metadata.file_path is a URI whose scheme rendering varies
    // ("file:///x" vs the qualified Path's "file:/x"), so strip the
    // scheme from BOTH sides and subtract plain paths
    val rootPath = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      rb.sparkSession.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(dir)).toUri.getPath
    val plainFp = regexp_replace(col("_metadata.file_path"),
      "^[a-zA-Z0-9.+-]+:/+", "/")
    val stats = count(lit(1)).as("n_rows") +:
      min(col("_metadata.file_size")).as("n_bytes") +: statsCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    rb.groupBy(
        (substring(plainFp, rootPath.length + 2, 100000)
          .as("path") +: extraKeys): _*)
      .agg(stats.head, stats.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
  }

  /** Z-order-clustered store WITH per-file min/max stats on BOTH
    * clustering columns — the read-side payoff [[zValue]]'s scaladoc
    * promises: each file covers a tight (x, y) rectangle, so a range
    * predicate on EITHER column (or both) prunes files through
    * [[manifestPrunedRead]]. A single-column sort can only ever prune
    * its own column; this is the multi-dimensional skip that makes
    * "WHERE user_id BETWEEN ..." AND "WHERE event_id BETWEEN ..."
    * both selective over one 100 TB layout.
    */
  def writeZorderStoreWithManifest(df: DataFrame, dir: String,
      xCol: String, yCol: String, bits: Int = 16,
      numPartitions: Int = 0): Unit = {
    zorderRepartition(df, xCol, yCol, bits, numPartitions)
      .write.mode("overwrite").parquet(dir)
    writeManifest(df.sparkSession.read.parquet(dir), dir,
      Seq(xCol, yCol), Seq.empty)
  }

  /** The manifest rolled up to partition grain — the shape a human (or an
    * oracle) audits: per day, how many files, how many rows, and the
    * min/max envelope of every stats column. `n_files` doubles as the
    * layout invariant: [[writeDateStoreWithManifest]] guarantees exactly
    * one file per day, and this report proves it from disk truth.
    */
  def manifestSummary(spark: SparkSession, store: String): DataFrame = {
    val aggs = count(lit(1)).as("n_files") +: sum(col("n_rows")).as("n_rows") +:
      ManifestStatCols.flatMap(c =>
        Seq(min(col(s"min_$c")).as(s"min_$c"),
          max(col(s"max_$c")).as(s"max_$c")))
    spark.read.parquet(s"$store/_manifest")
      .groupBy(col("p_date"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("p_date"))
  }

  /** Manifest-driven pruned read: open ONLY the files whose
    * `[min_$statCol, max_$statCol]` envelope intersects `[lo, hi]`, then
    * apply the exact residual filter. This prunes on columns partition
    * layout can't express — here `event_id`, which correlates with the
    * date partitions without being the partition key (the zorder +
    * min-max-stats recipe): a `WHERE event_id BETWEEN ...` over a 100 TB
    * store touches the handful of files whose envelope matches instead of
    * scanning everything, with zero reliance on the predicate mentioning
    * `p_date`.
    *
    * The collect is of FILE PATHS filtered by the predicate — bounded by
    * the manifest, not the data, and guarded by `maxFiles`: a predicate
    * surviving more files than that means skipping isn't selective enough
    * and the caller should scan normally (fail loud, never silently
    * drag a 100k-path listing through the driver).
    */
  /** Store-health report off the manifest alone (no data file is ever
    * opened): per partition — or one `ALL` row for unpartitioned (e.g.
    * Z-ordered) stores — file/row/byte counts, small-file count against
    * `targetBytes/4`, and a compaction recommendation when a partition
    * has fragmented into multiple files or mostly-small ones. This is
    * the DECISION input for [[compact]] /
    * [[graft.streaming.StreamingCorpus.manifestCompact]]: at 100 TB you
    * schedule compaction from kilobytes of manifest rows, not from a
    * listing storm over the data tree.
    */
  def manifestHealth(mf: DataFrame,
      targetBytes: Long = 128L << 20): DataFrame = {
    val grouped =
      if (mf.columns.contains("p_date")) mf.groupBy(col("p_date"))
      else mf.groupBy(lit("ALL").as("p_date"))
    grouped
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(when(col("n_bytes") < targetBytes / 4, 1L).otherwise(0L))
          .as("n_small_files"))
      // merging needs ≥2 files in the merge scope; the small-file count
      // is the severity diagnostic, fragmentation the trigger
      .withColumn("needs_compaction", col("n_files") > 1)
      .orderBy(col("p_date"))
  }

  def manifestPrunedRead(spark: SparkSession, store: String,
      statCol: String, lo: Long, hi: Long, maxFiles: Int = 10000): DataFrame = {
    val mf = spark.read.parquet(s"$store/_manifest")
    require(mf.columns.contains(s"min_$statCol"),
      s"no manifest stats for $statCol in $store/_manifest " +
        s"(have ${mf.columns.filter(_.startsWith("min_")).map(_.drop(4)).mkString(", ")})")
    val surviving = mf
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select(col("path")).collect().map(r => s"$store/${r.getString(0)}")
    require(surviving.length <= maxFiles,
      s"$statCol in [$lo, $hi] survives ${surviving.length} files (> $maxFiles): " +
        "skipping is not selective here - scan the store directly")
    val full = spark.read.option("basePath", store).parquet(store)
    val pruned =
      if (surviving.isEmpty) full.filter(lit(false)) // schema-stable empty
      else spark.read.option("basePath", store).parquet(surviving: _*)
    val residual =
      if (statCol == "ts_us") unix_micros(col("ts")).between(lo, hi)
      else col(statCol).between(lo, hi)
    pruned.filter(residual)
  }

  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite `df` Z-order-clustered on (xCol, yCol): range-partition by
    * the interleaved z-value and sort each partition by it, so every
    * output file covers a tight (x, y) rectangle. This is the layout
    * HALF of multi-dimensional pruning — [[zValue]] is the arithmetic —
    * and the write-side sibling of [[writePartitionedByDate]]: pay one
    * clustering pass at write time, prune on BOTH columns at every read.
    */
  def zorderRepartition(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    // collision-free temp column: an input that already carries `_z`
    // must come back with it intact, not overwritten-then-dropped
    val zName = Iterator.from(0)
      .map(i => if (i == 0) "_z" else s"_z$i")
      .find(n => !df.columns.contains(n)).get
    val z = zValue(col(xCol), col(yCol), bits)
    val withZ = df.withColumn(zName, z)
    val ranged =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col(zName))
      else withZ.repartitionByRange(col(zName))
    ranged.sortWithinPartitions(col(zName)).drop(zName)
  }
}
