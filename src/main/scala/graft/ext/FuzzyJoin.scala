package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (record linkage / entity resolution) via
  * Ed-Join-style q-gram prefix filtering — the string-family counterpart
  * of the shingle/MinHash dedup tier in [[Dedup]].
  *
  * The reference pipeline has no fuzzy matching (its joins are exact
  * `report_name` equality, `databricks/talkdesk_databricks_etl_distributed.py:42-53`);
  * this is extension surface: linking near-identical entity names (product
  * dictionaries, crawl hostnames, user agents) without an all-pairs scan.
  *
  * Exactness argument. One edit rewrites at most `q` of a string's
  * overlapping q-gram occurrences, so after `d` edits at most `d*q`
  * DISTINCT grams of either string can disappear entirely: two strings
  * within edit distance `d` share at least `max(|Ga|,|Gb|) - d*q`
  * distinct grams. When that bound is ≥ 1 the standard prefix principle
  * applies: under any global total order on grams (rarest-first here, to
  * keep candidate buckets small), the `d*q + 1`-element prefixes of the
  * two gram sets must intersect. Strings whose distinct-gram count is
  * ≤ `d*q` get no such guarantee against each other, so they additionally
  * key into per-length BANDS of width `d` (own band + the band below
  * covers every `|len(a)-len(b)| <= d` pair) — a mutually-bounded set
  * because gram-poor strings are short or degenerate-repetitive. They
  * still emit their full gram set, which the same prefix principle shows
  * is enough to catch gram-poor ↔ gram-rich pairs. Candidates then verify
  * with the exact codegen'd `levenshtein` expression.
  *
  * Scale shape: the join runs over the DISTINCT string dictionary (dedupe
  * exact copies first — at 100 TB the dictionary of entity names is
  * orders of magnitude smaller than the row count), candidate generation
  * is an equi-join on the rarest grams (bucket sizes bounded by
  * construction), and verification is O(candidates), never O(n²). The
  * gram document-frequency table is vocabulary-bounded. No collects, no
  * cartesians.
  */
object FuzzyJoin {

  /** All (a, b) pairs of distinct values of `nameCol` with
    * `levenshtein(a, b) <= maxDist`, emitted once with `name_a < name_b`.
    * Output: name_a, name_b, dist (INT), ordered.
    */
  def editDistanceSelfJoin(
      rows: DataFrame,
      nameCol: String,
      maxDist: Int = 2,
      q: Int = 2): DataFrame = {
    val prefixLen = maxDist * q + 1
    val names = rows.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()

    // distinct overlapping q-grams per name (strings shorter than q have none)
    val grams = names
      .filter(length(col("name")) >= q)
      .select(col("name"),
        explode(sequence(lit(1), (length(col("name")) - lit(q - 1)).cast("int"))).as("i"))
      .select(col("name"), expr(s"substring(name, i, $q)").as("gram"))
      .distinct()
    // global gram rarity — vocabulary-bounded aggregate
    val gramDf = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val ranked = grams.join(gramDf, Seq("gram"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("name")).orderBy(col("df"), col("gram"))))
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy(col("name"))))
    // gram-rich: the d*q+1 rarest; gram-poor: every gram it has
    val gramKeys = ranked
      .filter(col("rk") <= prefixLen)
      .select(col("name"), col("gram").as("key"))
    // gram-poor strings (distinct grams <= d*q, incl. len < q with zero)
    // additionally band by length so poor-poor pairs stay covered
    val poor = names.join(
      ranked.filter(col("n_grams") > maxDist * q).select(col("name")).distinct(),
      Seq("name"), "left_anti")
    val bandKeys = poor
      .select(col("name"),
        explode(array(
          concat(lit(" len:"), floor(length(col("name")) / maxDist)),
          concat(lit(" len:"), floor(length(col("name")) / maxDist) - 1))).as("key"))

    val keyed = gramKeys.unionByName(bandKeys)
    val candidates = keyed.as("a")
      .join(keyed.as("b"), col("a.key") === col("b.key") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()

    candidates
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .orderBy(col("name_a"), col("name_b"))
  }
}
