package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation — the web-crawl half of corpus hygiene (r7 ask
  * #3): canonicalize messy crawl URLs so byte-different spellings of the
  * same page collapse, cap how many documents any single domain may
  * contribute, and report the domain mixture. Mirrors the reference's
  * endpoint grouping (`databricks/talkdesk_databricks_etl_distributed.py:
  * 42-53` — per-endpoint task sets over a shared config) re-expressed as
  * corpus curation over a `url` column.
  *
  * Everything here is pure deterministic column arithmetic (regex chains
  * and the shared portable-hash bucket sampler) — per-row map work with
  * no shuffle beyond the ≤|domains|-row count aggregate in [[domainCaps]]
  * / [[domainMix]], so the whole family rides the parquet scan at any
  * scale. All of it replays verbatim in the DuckDB oracle.
  */
object UrlCuration {

  /** Canonicalize a URL column, in the order every step's input expects:
    *
    *   1. drop the fragment (`#...` — client-side only, never a distinct
    *      resource);
    *   2. lowercase scheme and host (RFC 3986 §6.2.2.1: both are
    *      case-insensitive; path/query stay case-preserved);
    *   3. strip tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
    *      and the `?`/`&` residue their removal leaves behind;
    *   4. strip one trailing slash (`.../a/` ≡ `.../a`; applied after
    *      query cleanup so `...?x=1` is untouched, and also collapsing
    *      the bare-root `host/` → `host`).
    *
    * Non-URL strings (no `scheme://` prefix) pass through steps 1/3/4
    * with no scheme/host rewrite — garbage in, recognizable garbage out,
    * never a null that would silently drop a row from an anti-join.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = regexp_extract(noFrag, "^([^:/?#]+)://", 1)
    val host = regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1)
    val rest = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    val restOrAll = when(scheme === "", noFrag).otherwise(rest)
    val noTrack = regexp_replace(restOrAll,
      "(utm_[^&=]*|fbclid|gclid|ref)=[^&]*&?", "")
    val noResidue = regexp_replace(
      regexp_replace(noTrack, "\\?&", "?"), "[?&]+$", "")
    val noSlash = regexp_replace(noResidue, "/$", "")
    when(scheme === "", noSlash)
      .otherwise(concat(lower(scheme), lit("://"), lower(host), noSlash))
  }

  /** Registrable domain key of a URL: lowercased host, `www.` prefix
    * dropped (www and apex serve the same corpus page), port dropped.
    * Empty string for non-URLs — a real crawl buckets those for triage
    * rather than dropping them silently.
    */
  def domainOf(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)),
        "^www\\.", ""),
      ":[0-9]+$", "")

  /** Cap each domain's contribution at ~`cap` documents via the shared
    * deterministic portable-hash bucket sampler ([[TextAnalysis]]'s
    * stratified/temperature discipline): one ≤|domains|-row count
    * aggregate, a broadcast threshold join, and a per-row hash filter —
    * never a per-domain window sort, which at 100 TB would put the
    * hottest domain's entire slice through one task. Domains at or under
    * the cap keep everything (threshold 10000); over-represented domains
    * keep `cap/n` of their 10000 hash buckets, i.e. ~`cap` docs in
    * expectation with the same final-at-arrival property every hash
    * sampler here has (a doc's keep/drop never changes as the corpus
    * grows — only the threshold its bucket is judged against does).
    *
    * Output keeps (doc_id, domain, bucket) alongside the doc columns the
    * caller selected, so downstream stages can re-judge without
    * re-hashing.
    */
  def domainCaps(docs: DataFrame, cap: Long, domainCol: String = "domain",
      salt: String = "domcap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_domain"))
    val thr = counts.withColumn("thr",
      least(lit(10000L),
        round(lit(10000.0) * cap / col("n_domain")).cast("long")))
      .select(col(domainCol), col("thr"))
    val bucket = pmod(
      TextAnalysis.portableHash64(
        concat_ws(":", lit(salt), col("doc_id").cast("string"))),
      lit(10000L))
    docs.join(broadcast(thr), Seq(domainCol))
      .withColumn("bucket", bucket)
      .filter(col("bucket") < col("thr"))
  }

  /** First-K-per-domain cap — the STREAM-ALIGNED sibling of the
    * hash-bucket sampler above: keep each domain's first `cap` documents
    * in ascending `doc_id` order. This is exactly the semantics a crawl
    * loop enforces online ("accept while the domain is under cap"), so
    * the streaming twin
    * ([[graft.streaming.StreamingCorpus.domainCapsIngest]]) converges to
    * THIS operator when batches land in id order — the sampler's keep
    * set depends on the FINAL domain count and can retract earlier
    * accepts, which an append-only stream cannot replay.
    *
    * Scale shape: one domain-keyed rank window. Unlike a global sort,
    * the window partitions on the (high-cardinality) domain key; for the
    * pathological mega-domain a production run first drops rows beyond
    * the cap-feasible head per partition via the persisted count store
    * (the streaming form), keeping window state bounded.
    */
  def domainCapsFirstK(docs: DataFrame, cap: Long,
      domainCol: String = "domain"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    docs.withColumn("rn", row_number().over(
        Window.partitionBy(col(domainCol)).orderBy(col("doc_id"))))
      .filter(col("rn") <= cap)
      .drop("rn")
  }

  /** The suffix chain of a domain down to two labels:
    * `ads.tracker.example.com` → `[ads.tracker.example.com,
    * tracker.example.com, example.com]` — never the bare TLD (a
    * blocklist entry of `com` would be a typo'd kill-switch, so suffix
    * matching stops above it). Single-label or empty domains yield
    * themselves (exact match only).
    */
  private[graft] def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    val n = size(parts)
    // n = 1 would make sequence(0, -1) DESCEND — guard to exact-only
    when(n >= 2, transform(sequence(lit(0), n - 2),
        i => array_join(slice(parts, i + 1, n - i), ".")))
      .otherwise(array(domain))
  }

  /** Drop documents whose domain is blocklisted, subdomains included
    * (`example.com` blocks `cdn.example.com`; `cdn.example.com` blocks
    * only that host) — the crawl-hygiene gate every pipeline runs
    * against spam/SEO/malware domain lists. Matching explodes each
    * domain into its ≤depth suffix chain and EQUI-joins the blocklist —
    * O(docs × label-depth) rows through a hash join, never the
    * O(docs × |blocklist|) broadcast-nested-loop a LIKE/endswith
    * condition would plan. No broadcast hint: real blocklists run to
    * millions of rows, and a plain equi-join lets AQE pick broadcast
    * for small lists and shuffle-hash beyond that.
    *
    * `blocked` contract: one `domain` column, entries already
    * lowercase/apex-or-host form ([[domainOf]] output).
    */
  def blocklistFilter(docs: DataFrame, blocked: DataFrame,
      domainCol: String = "domain"): DataFrame = {
    val hit = docs
      .select(col("doc_id"), explode(domainSuffixes(col(domainCol))).as("sfx"))
      .join(blocked.select(col("domain").as("sfx")), Seq("sfx"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.join(hit, Seq("doc_id"), "left_anti")
  }

  /** Domain-mix report: documents and share per domain, with the
    * per-domain language spread and mean length — the table a curation
    * run reads before choosing caps and mix targets. One count aggregate
    * plus a one-row total broadcast; output is ≤|domains| rows.
    */
  def domainMix(docs: DataFrame, domainCol: String = "domain"): DataFrame = {
    val total = docs.agg(count(lit(1)).as("n_total"))
    docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        round(avg(length(col("text"))), 2).as("avg_chars"))
      .crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_docs") / col("n_total").cast("double"), 4))
      .drop("n_total")
      .orderBy(col(domainCol))
  }
}
