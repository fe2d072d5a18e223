package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-validation primitives a training pipeline runs BEFORE spending
  * compute on a corpus: declarative constraints audited in a single pass.
  *
  * Every row rule and aggregate rule folds into ONE aggregation job over
  * one scan — k constraints cost the same shuffle as one (the deequ-style
  * shape). The wide one-row result is unpivoted to a (rule, n_violations,
  * n_rows, pass) report, so downstream gates read constraint outcomes as
  * data (fail the pipeline when `pass` has a false, quarantine when a
  * violation rate crosses a threshold, ...).
  */
object DataQuality {

  /** A row rule as a violation-count aggregate: false or NULL predicate
    * (a comparison against a null column) counts as a violation — the
    * conservative read.
    */
  private def violations(pred: Column): Column =
    // outer coalesce: sum over ZERO rows is NULL — an empty feed must
    // report 0 violations (with n_rows = 0 as the emptiness signal), not
    // null-poison the pass column and slip through a pass==false gate
    coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))

  /** Audit `rowRules` (a violation is a row where the predicate is false;
    * null predicates — e.g. comparisons against a null column — count as
    * violations, the conservative read) and `aggRules` (any aggregate
    * expression yielding a violation COUNT, e.g.
    * `count(*) - count(DISTINCT key)` for uniqueness) in one pass.
    */
  def expectations(df: DataFrame, rowRules: Seq[(String, Column)],
      aggRules: Seq[(String, Column)] = Nil): DataFrame = {
    require(rowRules.nonEmpty || aggRules.nonEmpty, "no rules to audit")
    val rowAggs = rowRules.map { case (name, pred) => violations(pred).as(name) }
    val aggAggs = aggRules.map { case (name, agg) =>
      coalesce(agg.cast("long"), lit(0L)).as(name) }
    val all = rowAggs ++ aggAggs :+ count(lit(1)).as("_n_rows")
    val wide = df.agg(all.head, all.tail: _*)
    wide.unpivot(
        Array(col("_n_rows")),
        (rowRules ++ aggRules).map(r => col(r._1)).toArray,
        "rule", "n_violations")
      .select(col("rule"), col("n_violations"),
        col("_n_rows").as("n_rows"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  /** Streaming twin: the same row-rule audit per event-time tumbling
    * window — the live data-quality monitor in front of an ingest (alert
    * when a window's violation rate jumps: a bad producer deploy, a
    * schema drift). Watermarking drops window state once closed, so a
    * long-running monitor holds O(open windows) state regardless of
    * stream age. Aggregate rules (distinct counts) are a batch-only
    * concept — streaming distinct state is unbounded by nature — so this
    * twin takes row rules only; the wide one-row-per-window layout keeps
    * every rule inside ONE streaming aggregation.
    */
  def expectationsStream(stream: DataFrame, timeColumn: String,
      rowRules: Seq[(String, Column)],
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(rowRules.nonEmpty, "no rules to audit")
    val aggs = rowRules.map { case (name, pred) => violations(pred).as(name) } :+
      count(lit(1)).as("n_rows")
    stream
      .withWatermark(timeColumn, watermarkDelay)
      .groupBy(window(col(timeColumn), windowLength).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("window_start") +:
        col("n_rows") +: rowRules.map(r => col(r._1)): _*)
  }

  /** Snapshot diff between two corpus versions keyed by `keyCol`: which
    * rows were added, removed, or changed (by content fingerprint of
    * `payloadCol`) — the audit a data-versioning layer runs between
    * ingest batches. One key-partitioned full-outer join; only 16-byte
    * digests travel through the shuffle, never document payloads, so the
    * exchange is O(rows), not O(bytes). Unchanged rows (the overwhelming
    * majority between adjacent snapshots) are dropped from the report.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String = "doc_id", payloadCol: String = "text"): DataFrame =
    diffFromFingerprints(
      oldSnap.select(col(keyCol), md5(col(payloadCol)).as("old_fp")),
      newSnap.select(col(keyCol), md5(col(payloadCol)).as("new_fp")),
      keyCol)

  /** The classification core of [[snapshotDiff]], over already-computed
    * fingerprint frames `(key, old_fp)` / `(key, new_fp)` — shared with
    * the streaming CDC view so batch and stream can never diverge.
    */
  private[graft] def diffFromFingerprints(o: DataFrame, n: DataFrame,
      keyCol: String): DataFrame =
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col(keyCol), col("status"))
      .orderBy(col(keyCol))

  /** Slowly-changing-dimension Type 2 history build: collapse a keyed
    * change stream into effective-dated dimension rows — one row per
    * (key, attribute run) with `[valid_from, valid_to)` validity,
    * a per-key `version` counter, and `is_current` on the open row. The
    * warehouse-standard dimension shape ([[snapshotDiff]] answers "what
    * changed between two snapshots"; this answers "what was true WHEN",
    * the table an as-of join then serves point-in-time lookups from).
    *
    * Semantics: observations order per key by `(tsCol, tieCol)` (the
    * tiebreak makes same-instant observations deterministic); consecutive
    * repeats of the same attribute value collapse into one validity run
    * (A,A,B,A → three rows, the second A a NEW run); the open row's
    * `valid_to` is the 9999-12-31 sentinel, the closed row's is the next
    * run's `valid_from` (half-open intervals — an as-of probe at exactly
    * the change instant reads the NEW value).
    *
    * Scale shape: everything is per-key window work over one exchange on
    * the key — the change-detection lag, the version counter, and the
    * interval lead share the same (key, ts, tie) sort, so the plan is one
    * shuffle + one sort regardless of history depth. Keys are plentiful
    * (users/documents), so partitions stay balanced; no corpus-wide
    * window anywhere.
    */
  def scd2History(changes: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    scd2Runs(changes, keyCol, attrCol, tsCol, tieCol)
      .select(col(keyCol), col("version"), col(attrCol),
        date_format(col(tsCol), fmt).as("valid_from"),
        coalesce(date_format(col("_to"), fmt),
          lit("9999-12-31 00:00:00.000000")).as("valid_to"),
        col("_to").isNull.as("is_current"))
      .orderBy(col(keyCol), col("version"))
  }

  /** [[scd2History]]'s typed core: the collapsed runs with TIMESTAMP
    * bounds (`tsCol` = run start, `_to` = next run's start or null) —
    * shared with [[scd2Lookup]] so the serving path can never disagree
    * with the emitted history.
    */
  private[graft] def scd2Runs(changes: DataFrame, keyCol: String,
      attrCol: String, tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col(attrCol) =!= col("_prev"))
      // same window spec on the collapsed runs: version + interval end
      // ride one WindowExec
      .withColumn("version", row_number().over(w))
      .withColumn("_to", lead(col(tsCol), 1).over(w))
  }

  /** Point-in-time dimension lookup — the table [[scd2History]] BUILDS,
    * served: each fact row joins the dimension version valid at its own
    * timestamp. This is exactly an as-of join (per key, the LAST run
    * starting ≤ the fact instant; exact matches included — the half-open
    * interval convention), so it runs through
    * [[graft.operators.AsOfJoin.asOfJoin]]'s one sort-merge pass instead
    * of a per-fact interval scan: at 100 TB the fact stream and the
    * (much smaller) run stream co-shuffle on the key once, and no
    * range-predicate nested loop ever materializes. Same-instant runs
    * resolve by the `version` tiebreak (the later observation wins, the
    * half-open read).
    */
  def scd2Lookup(facts: DataFrame, changes: DataFrame, keyCol: String,
      attrCol: String, factTs: String, tsCol: String,
      tieCol: String): DataFrame = {
    val runs = scd2Runs(changes, keyCol, attrCol, tsCol, tieCol)
      .select(col(keyCol), col(attrCol), col(tsCol), col("version"))
    graft.operators.AsOfJoin.asOfJoin(
      facts, runs, keyCol, factTs, tsCol, Seq("version", attrCol), "version")
  }

  /** One-pass column profiling: per-column null count, exact distinct
    * count, min and max (stringified so heterogeneous column types share
    * one report schema) plus the table row count. All columns fold into
    * ONE aggregation — the multi-column exact distincts plan through
    * Spark's Expand (one scan, rows ×|cols| pre-aggregation), the
    * standard exact shape; swap `approx_count_distinct` in at 100 TB when
    * ±2% is acceptable and the Expand multiplier is not. The wide one-row
    * result unpivots via an array-of-structs explode — no second scan.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val metrics = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct"),
      col(s"${c}__min").as("min_value"),
      col(s"${c}__max").as("max_value"))): _*)
    row.select(col("__n").as("n_rows"), explode(metrics).as("m"))
      .select(col("m.col_name").as("col_name"), col("n_rows"),
        col("m.n_nulls").as("n_nulls"), col("m.n_distinct").as("n_distinct"),
        col("m.min_value").as("min_value"), col("m.max_value").as("max_value"))
      .orderBy(col("col_name"))
  }

  /** Equi-width histogram of a numeric column: `bins` equal-width buckets
    * over the observed [min, max] (the `+1` denominator keeps the max
    * value inside the last bucket without a clamp), per-bucket count and
    * corpus share — the distribution-shape companion to [[profile]]'s
    * scalar min/max (which cannot see bimodality or a truncation spike).
    *
    * Determinism: bucket assignment is `floor` of one double expression
    * computed identically (same IEEE ops) on both engines, with the max
    * value clamped into the last bin; no percentile interpolation
    * involved. Works for any numeric column — width is `(mx − mn)`, not
    * the integer-only `(mx − mn + 1)` form.
    *
    * Scale shape: one min/max/count aggregate broadcast back over the
    * scan, then a map-side-combinable count by bucket — two scans, no
    * sort, output is `bins`-bounded.
    */
  def histogram(df: DataFrame, column: String, bins: Int = 20): DataFrame = {
    val mm = df.agg(min(col(column)).as("mn"), max(col(column)).as("mx"),
      count(lit(1)).as("total"))
    df.select(col(column).as("x")).crossJoin(broadcast(mm))
      // true equi-width over [mn, mx]: width (mx - mn) with the max
      // clamped into the last bin — the (mx - mn + 1) form was only
      // equi-width for integer columns and collapsed small-range double
      // columns (e.g. scores in [0,1]) into bin 0
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")).cast("double") * bins /
              (col("mx") - col("mn")).cast("double")),
            lit(bins - 1L))).cast("long"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(mm.select(col("total"))))
      .select(col("bin"), col("n"),
        round(col("n").cast("double") / col("total"), 4).as("share"))
      .orderBy(col("bin"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns (is the language mix the same across sources? did the crawl
    * feed shift its composition?): the dense R×C contingency grid —
    * unobserved combinations included at n=0, as the statistic requires —
    * with per-cell expected counts `e = nr·nc/N`, standardized residuals
    * `(n−e)/√e` (the cells that DRIVE a significant statistic), the total
    * `χ² = Σ(n−e)²/e` and `dof = (R−1)(C−1)` on every row. The
    * categorical companion to [[profile]]'s per-column stats and
    * [[graft.ext.Similarity.embeddingDriftPsi]]'s numeric drift.
    *
    * Determinism: every input to the arithmetic is an exact integer
    * count; per-cell values round after identical double expressions,
    * and the total sums 6-decimal-rounded contributions before its own
    * 4-decimal round (the ulp-absorbing discipline).
    *
    * Scale shape: one map-side-combinable count aggregation down to R×C
    * cells; margins, grid and totals are all cell-table-sized broadcasts
    * — the corpus scan is the only data-sized step at 100 TB.
    */
  def chi2Independence(docs: DataFrame, rowCol: String = "source",
      colCol: String = "lang"): DataFrame = {
    val cells = docs.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("r")).agg(sum(col("n")).as("nr"))
    val cols = cells.groupBy(col("c")).agg(sum(col("n")).as("nc"))
    val tot = cells.agg(sum(col("n")).as("nn"))
    val e = col("nr").cast("double") * col("nc") / col("nn")
    val resid = (col("n") - e) / sqrt(e)
    val grid = rows.crossJoin(broadcast(cols))
      .join(cells, Seq("r", "c"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .select(col("r"), col("c"), col("n"), round(e, 4).as("expected"),
        round(resid, 4).as("resid"), round(resid * resid, 6).as("chi2_cell"))
    val summary = grid.agg(
      round(sum(col("chi2_cell")), 4).as("chi2_total"),
      ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1)).as("dof"))
    grid.crossJoin(broadcast(summary))
      .select(col("r").as(rowCol), col("c").as(colCol), col("n"),
        col("expected"), col("resid"), col("chi2_cell"),
        col("chi2_total"), col("dof"))
      .orderBy(col(rowCol), col(colCol))
  }

  /** k-anonymity release audit: group the corpus by its quasi-identifier
    * tuple (the attribute combination an adversary could link on — here
    * `(lang, source, length bucket)`; the sensitive payload is the text
    * itself) and flag every equivalence class smaller than `k`. A record
    * in a singleton class is re-identifiable by its metadata alone even
    * after the PII pass scrubs the text body — the privacy audit that
    * complements [[graft.ext.TextAnalysis]]'s `text_pii` content scan
    * when releasing corpus slices or data cards. `risk = 1/n` is the
    * linkage probability within a class; classes with `at_risk` need
    * suppression or generalization (coarser buckets) before release.
    *
    * Scale shape: ONE map-side-combinable groupBy onto the bounded
    * quasi-identifier space (|langs|·|sources|·|buckets|); nothing else
    * touches the corpus. Bucket membership is integer arithmetic.
    */
  def kAnonymityAudit(docs: DataFrame, k: Int = 5,
      bucketWidth: Int = 200): DataFrame =
    docs
      .groupBy(col("lang"), col("source"),
        floor(col("n_chars") / bucketWidth).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < k)
      .withColumn("risk", round(lit(1.0) / col("n_docs"), 6))
      .orderBy(col("lang"), col("source"), col("len_bucket"))
}
