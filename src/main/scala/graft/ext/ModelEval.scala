package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation metrics over a scored corpus — the EVAL
  * leg that closes the model lifecycle ([[TextAnalysis.lrModel]] fit →
  * [[TextAnalysis.buildLrModel]] persist → [[TextAnalysis.lrPredictFromModel]]
  * serve → evaluate HERE). Production pipelines gate every quality/langid
  * model refresh on exactly these numbers before the new version's
  * CURRENT flip.
  *
  * Input contract (all three operators): a frame with `s` — the model
  * score as a DOUBLE already on the 4-decimal grid (every scorer in this
  * library emits rounded scores: [[TextAnalysis.lrPredict]]'s `p`,
  * [[TextAnalysis.nbPredict]]'s posterior) — and `y`, the 0/1 integer
  * label.
  *
  * Scale shape (the deliberate design): the ONLY corpus-sized work in any
  * of the three metrics is one map-side-combinable groupBy — either onto
  * the score histogram (≤10,001 rows by construction: scores live on the
  * 1e-4 grid in [0,1]) or onto the ≤`bins` calibration rows. Everything
  * downstream (the rank-sum window, the threshold grid join) runs on that
  * bounded frame, so a 100 TB scored corpus pays exactly one exchange of
  * ≤10,001 rows past the partial aggregation. The single-partition window
  * inside [[binaryAuc]] is the [[TextAnalysis.packSequences]]
  * bounded-window class, never corpus-wide.
  *
  * Determinism: every per-row product `n_pos · (neg_below + n_neg/2)` is
  * a sum of integers and exact halves — exactly representable in IEEE
  * doubles at any realistic corpus size — so aggregation order cannot
  * perturb the sum and the final `round(_, 6)` lands both engines on the
  * same value. Threshold and bin membership are decided in INTEGER
  * arithmetic on `s4 = round(s·10⁴)` (never `double >= double` on
  * accumulated floats).
  */
object ModelEval {

  /** The integer score key: scores are on the 1e-4 grid by contract, so
    * `round(s·10⁴)` recovers the exact integer both engines agree on.
    */
  private def s4Col: Column = round(col("s") * 10000, 0).cast("long")

  /** Per-distinct-score label counts `(s4, n_pos, n_neg)` — the one
    * corpus-sized aggregation all three metrics reduce through. Bounded
    * output: ≤10,001 rows for scores in [0,1].
    */
  private def histogram(scored: DataFrame): DataFrame =
    scored.groupBy(s4Col.as("s4"))
      .agg(sum(col("y")).cast("long").as("n_pos"),
        (count(lit(1)) - sum(col("y"))).cast("long").as("n_neg"))

  /** ROC AUC by the Mann-Whitney rank-sum over the score histogram, with
    * the standard tie correction (a tied positive/negative pair counts
    * ½): `AUC = Σ_s n_pos(s)·(neg_below(s) + n_neg(s)/2) / (P·N)`.
    * One row: `n_pos`, `n_neg`, `n_scores` (distinct score values),
    * `auc` (6 decimals). Requires both classes present — callers
    * evaluate real labeled corpora where that holds by construction.
    */
  def binaryAuc(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bounded single-partition window: ≤10,001 histogram rows by
    // construction (see scaladoc) — the packSequences class, not a
    // corpus-wide sort
    val w = Window.orderBy(col("s4"))
      .rowsBetween(Window.unboundedPreceding, -1)
    histogram(scored)
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .agg(sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        round(sum(col("n_pos") * (col("neg_below") + col("n_neg") / 2.0)) /
          (sum(col("n_pos")) * sum(col("n_neg"))), 6).as("auc"))
  }

  /** Confusion-matrix sweep over an evenly spaced threshold grid
    * (`steps` thresholds at 0.05, 0.10, …): one row per threshold with
    * the raw counts and the derived `prec`/`rec`/`f1`/`acc` (4
    * decimals; zero-denominator cases pin to 0 via `greatest(_, 1)` —
    * deterministic, no NULL/NaN forks between engines). The grid
    * broadcasts into the bounded histogram, so the sweep costs nothing
    * beyond the histogram's one exchange no matter how many thresholds.
    */
  def thresholdSweep(scored: DataFrame, steps: Int = 19): DataFrame = {
    val spark = scored.sparkSession
    val grid = spark.range(1, steps + 1L).select((col("id") * 500L).as("thr4"))
    val tot = histogram(scored)
      .crossJoin(broadcast(grid))
      .groupBy(col("thr4"))
      .agg(sum(when(col("s4") >= col("thr4"), col("n_pos")).otherwise(0L)).as("tp"),
        sum(when(col("s4") >= col("thr4"), col("n_neg")).otherwise(0L)).as("fp"),
        sum(when(col("s4") < col("thr4"), col("n_pos")).otherwise(0L)).as("fn"),
        sum(when(col("s4") < col("thr4"), col("n_neg")).otherwise(0L)).as("tn"))
    tot.select(
        round(col("thr4") / 10000.0, 4).as("thr"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)), 4)
          .as("prec"),
        round(col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)), 4)
          .as("rec"),
        round((col("tp") * 2.0) /
          greatest(col("tp") * 2 + col("fp") + col("fn"), lit(1L)), 4).as("f1"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn")), 4).as("acc"))
      .orderBy(col("thr"))
  }

  /** ISOTONIC calibration map (the repair step after [[calibrationBins]]
    * measures miscalibration): the monotone-non-decreasing fit of
    * observed positive rate to score bins, via the minimax
    * characterization of pool-adjacent-violators —
    * `iso(p) = max_{i≤p} min_{j≥p} posrate(i..j)` — which needs no
    * sequential pooling loop, so BOTH engines evaluate the identical
    * closed form over exact integer range sums (prefix sums of the
    * ≤`bins`-row frame; B³ ≈ 8000 combinations at B = 20 — nothing).
    * Serving replaces a raw score in bin b with `iso_b`: the
    * least-squares monotone recalibration, the standard post-hoc fix
    * when a classifier's probabilities drift but its RANKING is sound.
    *
    * Scale shape: the one corpus-sized step is the same histogram
    * groupBy as every other metric here; the minimax runs on broadcast
    * bin frames. Output per bin: raw rate, calibrated `iso` (round 6,
    * provably monotone — the spec asserts it), and the bin mass.
    */
  def isotonicCalibration(scored: DataFrame, bins: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binCol = least(floor((s4Col * bins) / 10000.0).cast("long"),
      lit(bins - 1L))
    val b = scored.groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("pos"))
    // bounded single-partition window: ≤bins rows by construction
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = b
      .withColumn("cpos", sum(col("pos")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
      .localCheckpoint(true)
    val grid = pre.select(col("bin"), col("cpos"), col("cn"))
    // range averages for every i<=j from prefix sums (exact integers)
    val ranges = grid.select(col("bin").as("i"), col("cpos").as("cpi"), col("cn").as("cni"))
      .crossJoin(broadcast(grid.select(col("bin").as("j"),
        col("cpos").as("cpj"), col("cn").as("cnj"))))
      .filter(col("i") <= col("j"))
      .join(broadcast(grid.select(col("bin").as("i"),
        lag(col("cpos"), 1).over(Window.orderBy(col("bin"))).as("cp0"),
        lag(col("cn"), 1).over(Window.orderBy(col("bin"))).as("cn0"))), Seq("i"))
      .select(col("i"), col("j"),
        ((col("cpj") - coalesce(col("cp0"), lit(0L))).cast("double") /
          (col("cnj") - coalesce(col("cn0"), lit(0L)))).as("avg"))
    // iso_p = max over i<=p of (min over j>=p of avg(i, j))
    val p = grid.select(col("bin").as("p"))
    val iso = ranges.crossJoin(broadcast(p))
      .filter(col("i") <= col("p") && col("j") >= col("p"))
      .groupBy(col("p"), col("i")).agg(min(col("avg")).as("m"))
      .groupBy(col("p")).agg(round(max(col("m")), 6).as("iso"))
    b.join(iso, b("bin") === iso("p"))
      .select(col("bin"), col("n"),
        round(col("pos").cast("double") / col("n"), 6).as("raw_rate"),
        col("iso"))
      .orderBy(col("bin"))
  }

  /** Reliability-diagram bins (the calibration half of an eval report):
    * equal-width score bins `[i/bins, (i+1)/bins)` (top edge closed), per
    * bin the doc count, mean predicted score, observed positive rate,
    * and their absolute gap — the per-bin terms of expected calibration
    * error. Bin membership is integer arithmetic on `s4` (exact), the
    * mean comes from the exact integer `sum(s4)`, and `gap` subtracts
    * the two ROUNDED 4-decimal values so both engines difference
    * identical grid points.
    */
  def calibrationBins(scored: DataFrame, bins: Int = 10): DataFrame = {
    val binCol = least(floor((s4Col * bins) / 10000.0).cast("long"),
      lit(bins - 1L))
    scored
      .groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(s4Col) / (count(lit(1)) * 10000.0), 4).as("mean_s"),
        round(sum(col("y")).cast("double") / count(lit(1)), 4).as("frac_pos"))
      .withColumn("gap", round(abs(col("frac_pos") - col("mean_s")), 4))
      .orderBy(col("bin"))
  }

  /** Precision-recall AUC (average precision, the sklearn step form with
    * ties grouped per distinct score): `AP = Σ_s ΔR(s)·P(s)` walking
    * thresholds DOWN the score grid, where `ΔR(s) = n_pos(s)/P` and
    * `P(s) = cum_pos(s)/(cum_pos(s)+cum_neg(s))` from the
    * descending-cumulative counts. The metric of record for imbalanced
    * gates (contamination flags, PII hits) where ROC AUC's
    * true-negative credit washes out the minority class; `baseline` is
    * the prevalence `P/(P+N)` a random scorer would land.
    *
    * Numerics: per-score terms are rational (quotients of exact
    * integers) — identical doubles in both engines, but their SUM is
    * order-dependent, so terms snap to the 1e-10 grid and sum in exact
    * decimal ([[graft.functions.Exact.sumQR]]; snap scale 10 ≥ target
    * 6 + 3 keeps the perturbation inside the final grid).
    *
    * Scale shape: the corpus reduces through the one histogram groupBy
    * shared by every metric here; both windows are the bounded
    * ≤10,001-row single-partition class.
    */
  def prAuc(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Exact
    val wDesc = Window.orderBy(col("s4").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    histogram(scored)
      .withColumn("cum_pos", sum(col("n_pos")).over(wDesc))
      .withColumn("cum_neg", sum(col("n_neg")).over(wDesc))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("tot_neg", sum(col("n_neg")).over(wAll))
      .withColumn("term",
        col("n_pos").cast("double") / col("tot_pos") *
          (col("cum_pos").cast("double") / (col("cum_pos") + col("cum_neg"))))
      .agg(max(col("tot_pos")).as("n_pos"),
        max(col("tot_neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        Exact.sumQR(col("term"), 10, 6).as("pr_auc"))
      .withColumn("baseline",
        round(col("n_pos").cast("double") / (col("n_pos") + col("n_neg")), 6))
  }

  /** Cumulative Poisson(1) probabilities `P(X ≤ k)` for k = 0..7 — the
    * inverse-CDF breakpoints of the deterministic bootstrap (tail mass
    * beyond 7 maps to 8). Data-independent constants: both engines carry
    * them as literals (17 significant digits round-trips a double
    * exactly).
    */
  private[graft] val poissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    Seq.iterate((e, 1.0, 0), 8) { case (cum, fact, k) =>
      val f = fact * (k + 1)
      (cum + e / f, f, k + 1)
    }.map(_._1)
  }

  /** Bootstrap confidence interval on ROC AUC via the DETERMINISTIC
    * Poisson bootstrap (Chamandy et al. 2012 — the resampling scheme
    * built for partitioned data: each row enters replica `b` with
    * multiplicity `Poisson(1)`, drawn here by inverse CDF on the
    * portable hash of `(replica, row id)`, so both engines draw the
    * IDENTICAL resamples and the whole interval sits inside the oracle
    * gate). Point estimate, bootstrap mean, and the 2.5/97.5 percentile
    * interval as exact order statistics of the 32 replica AUCs. The
    * metric every gate comparison actually needs: "AUC 0.71 vs 0.69" is
    * noise or signal depending on exactly this interval.
    *
    * Input adds `id` (a stable row key) to the (s, y) contract. Scale
    * shape: ONE corpus×replicas map-side-combined groupBy onto the
    * ≤replicas·10,001-row striped histogram; every window downstream is
    * replica-keyed and bounded. Replica count is pinned at 32 so the
    * bootstrap-mean division is exact dyadic.
    */
  def aucBootstrapCi(scoredIn: DataFrame, replicas: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(replicas == 32, "replicas pinned to 32 (exact dyadic mean, fixed CI ranks)")
    // the (id, s, y) frame feeds the replica histogram AND the point
    // estimate — cache for the duration of the call (released in the
    // finally; the lrPredict discipline) so the upstream scoring chain
    // runs once, not once per consumer
    val scored = scoredIn.persist()
    try {
    val spark = scored.sparkSession
    val reps = spark.range(0, replicas.toLong).select(col("id").as("b"))
    val u = (graft.ext.TextAnalysis.portableHash64(
      concat(lit("boot:"), col("b").cast("string"), lit(":"),
        col("id").cast("string"))) % 1000000L).cast("double") / 1e6
    val m = poissonCdf.zipWithIndex.foldRight(lit(8L)) { case ((c, k), acc) =>
      when(col("u") < c, lit(k.toLong)).otherwise(acc)
    }
    val hist = scored.crossJoin(broadcast(reps))
      .withColumn("u", u)
      .withColumn("m", m)
      .groupBy(col("b"), s4Col.as("s4"))
      .agg(sum(col("y") * col("m")).cast("long").as("n_pos"),
        sum((lit(1) - col("y")) * col("m")).cast("long").as("n_neg"))
    val w = Window.partitionBy(col("b")).orderBy(col("s4"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aucs = hist
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .groupBy(col("b"))
      .agg(round(sum(col("n_pos") * (col("neg_below") + col("n_neg") / 2.0)) /
        (sum(col("n_pos")) * sum(col("n_neg"))), 6).as("auc"))
      .localCheckpoint(true)
    val ranked = aucs.withColumn("r",
      row_number().over(Window.orderBy(col("auc"), col("b"))))
    val boot = aucs.agg(
      round(graft.functions.Exact.sumQ(col("auc"), 10) / replicas, 6)
        .as("boot_mean"),
      count(lit(1)).as("n_replicas"))
    val lo = ranked.filter(col("r") === 2).select(col("auc").as("ci_lo"))
    val hi = ranked.filter(col("r") === replicas - 1)
      .select(col("auc").as("ci_hi"))
    binaryAuc(scored.select(col("s"), col("y")))
      .select(col("auc"))
      .crossJoin(broadcast(boot))
      .crossJoin(broadcast(lo))
      .crossJoin(broadcast(hi))
      .select(col("auc"), col("boot_mean"), col("ci_lo"), col("ci_hi"),
        col("n_replicas"))
      .localCheckpoint(true)
    } finally { scored.unpersist(); () }
  }

  /** Kolmogorov-Smirnov separation: `KS = max_s |CDF_pos(s) − CDF_neg(s)|`
    * over the score grid, with the argmax threshold — the classic
    * score-separation read (credit-risk heritage) that names the single
    * best cutoff and how much separation it buys. One row: `ks`,
    * `at_thr` (smallest threshold attaining the max — total tiebreak),
    * `n_pos`, `n_neg`.
    *
    * Determinism: both CDFs are quotients of exact integer cumulative
    * counts by exact totals — identical doubles in both engines (no
    * accumulation), so max and argmax are order-free; `diff` pre-rounds
    * to 9 decimals so the ordering key is grid-pinned.
    */
  def ksStatistic(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAsc = Window.orderBy(col("s4"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    histogram(scored)
      .withColumn("cpos", sum(col("n_pos")).over(wAsc))
      .withColumn("cneg", sum(col("n_neg")).over(wAsc))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("tot_neg", sum(col("n_neg")).over(wAll))
      .withColumn("diff", round(abs(
        col("cpos").cast("double") / col("tot_pos") -
        col("cneg").cast("double") / col("tot_neg")), 9))
      .orderBy(col("diff").desc, col("s4"))
      .limit(1)
      .select(round(col("diff"), 6).as("ks"),
        round(col("s4") / 10000.0, 4).as("at_thr"),
        col("tot_pos").as("n_pos"), col("tot_neg").as("n_neg"))
  }
}
