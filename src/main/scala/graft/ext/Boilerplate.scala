package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet/RefinedWeb curation tier
  * between document-level near-dup (MinHash/SimHash, [[Dedup]]) and
  * exact substring spans ([[TextAnalysis]] dup spans): navigation bars,
  * cookie banners, and footer chrome repeat VERBATIM across most pages
  * of a domain while each page's body is unique, so a line repeated in
  * ≥ `dfMin` distinct documents of the SAME domain is dropped and the
  * document re-assembled from what remains (Wenzek et al. 2020 "CCNet"
  * §3.1 line dedup; Penedo et al. 2023 "RefinedWeb" §3.3 line-wise
  * filtering — both keyed per domain/dump so cross-site coincidences
  * survive).
  *
  * Scale shape (100 TB): lines explode on the document partitioning and
  * collapse through ONE map-side-combinable (domain, line-hash)
  * aggregation into the document-frequency table; the drop set (df ≥
  * threshold) is the tiny head of that table — nav bars are FEW and
  * everywhere — so the removal join is a left-anti on (domain, 60-bit
  * portable line hash), 8-byte keys, AQE-broadcastable; re-assembly is
  * one doc-keyed aggregation. No window over the corpus, no self-join of
  * documents — per-domain repetition is found by counting, not pairing.
  *
  * Determinism: line order is re-assembled from the explode ordinal
  * (`posexplode`), the df count is exact-integer, and the line hash is
  * the portable md5-prefix ([[TextAnalysis.portableHash64]]) replayed
  * verbatim in DuckDB — hash collisions within a domain are the
  * [[Dedup.ngramJaccardPairs]] 2^60 argument, negligible.
  */
object Boilerplate {

  /** `(doc_id, domain, i, line)` — one row per line, `i` the 0-based
    * position within the document.
    */
  private def lines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("domain"),
      posexplode(split(col("text"), "\n")).as(Seq("i", "line")))

  /** Per-(domain, line) distinct-document frequency `(domain, line, df)`
    * — the one corpus-sized aggregation of this family. Exposed because
    * its per-batch form is COUNT-MERGEABLE: with each document landing
    * in exactly one micro-batch, summing per-batch dfs reproduces the
    * global df (the streaming store exploits this).
    */
  def lineDocFrequency(docs: DataFrame): DataFrame =
    lines(docs)
      .select(col("domain"), col("line"), col("doc_id")).distinct()
      .groupBy(col("domain"), col("line"))
      .agg(count(lit(1)).as("df"))

  /** The boilerplate report: lines appearing in ≥ `dfMin` distinct
    * documents of one domain, with their document frequency —
    * `(domain, line, df)`. This is what a curation run eyeballs before
    * committing to a threshold.
    */
  def boilerplateReport(docs: DataFrame, dfMin: Long = 4): DataFrame =
    lineDocFrequency(docs)
      .filter(col("df") >= dfMin)
      .orderBy(col("domain"), col("line"))

  /** Remove per-domain boilerplate lines and re-assemble each document:
    * `(doc_id, domain, n_lines, n_dropped, clean_text)`. A document
    * consisting ENTIRELY of boilerplate stays in the output with an
    * empty `clean_text` (dropping the row would silently shrink the
    * corpus — the curation report, not the cleaner, decides deletions).
    */
  def boilerplateClean(docs: DataFrame, dfMin: Long = 4): DataFrame = {
    val ln = lines(docs)
      .withColumn("lh", TextAnalysis.portableHash64(col("line")))
    val dropSet = ln
      .select(col("domain"), col("lh"), col("doc_id")).distinct()
      .groupBy(col("domain"), col("lh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= dfMin)
      .select(col("domain"), col("lh"))
    val totals = ln.groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("n_lines"))
    val kept = ln.join(dropSet, Seq("domain", "lh"), "left_anti")
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(i, line))), s -> s.line)"),
          "\n").as("clean_text"))
    totals.join(kept, Seq("doc_id", "domain"), "left")
      .select(col("doc_id"), col("domain"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }
}
