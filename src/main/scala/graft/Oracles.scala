package graft

/** DuckDB oracle SQL — one ANSI-ish statement per entry in
  * [[SparkEntry.queries]], run by the driver over the same parquet tables.
  *
  * Conventions keeping Spark and DuckDB hash-identical:
  *   - every statement ends in a fully deterministic ORDER BY;
  *   - integer aggregates are CAST AS BIGINT (DuckDB SUM(int) is HUGEINT,
  *     Spark sum(int) is LONG);
  *   - double aggregates are ROUND(...) to the same precision as the Spark
  *     side;
  *   - timestamps are emitted as strftime strings, dates as DATE.
  */
object Oracles {

  val asOf = Queries.AsOfDate

  // shared by dedup_clusters (size-adaptive: union-find at test scales)
  // and dedup_clusters_dist (forces the distributed propagation) — BOTH
  // engine branches must hash-match the same recursive ground truth
  /** The near-dup cluster CTE chain (3-gram Jaccard ≥ 0.8 ground-truth
    * pairs → WITH RECURSIVE min-label propagation), shared by the
    * cluster oracles and the leakage-safe-split oracle so the replayed
    * cluster definition cannot fork.
    */
  private val dupClustersCtes: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE len(t) >= 3
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      |), cand AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT p.a, p.b FROM cand p
      |  JOIN cnt ca ON p.a = ca.doc_id JOIN cnt cb ON p.b = cb.doc_id
      |  WHERE round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) >= 0.8
      |), edges AS (
      |  SELECT a AS src, b AS dst FROM pairs
      |  UNION SELECT b, a FROM pairs
      |), reach(node, lab) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
      |)""".stripMargin

  /** The 2-table LSH candidate-pair CTE chain over `embeddings` (seeds
    * 42/43, 4 hyperplanes each, embedded as DOUBLE literals) — shared by
    * the bucketed embedding-dedup oracle and the kNN-PageRank oracle so
    * the replayed candidate generation cannot fork. Produces CTEs
    * `t0, t1, cand(a, b)` (to be embedded right after `WITH `).
    */
  private val embLshCandCtes: String = {
    def bucketExpr(seed: Long): String =
      graft.ext.Similarity.hyperplanes(4, 64, seed).zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n    + ")
    val tables = Seq(42L, 43L).zipWithIndex.map { case (seed, t) =>
      s"t$t AS (\n  SELECT vec_id, CAST(${bucketExpr(seed)} AS BIGINT) AS bucket\n  FROM embeddings\n)"
    }.mkString(", ")
    val perTable = (0 until 2).map { t =>
      s"SELECT x.vec_id AS a, y.vec_id AS b FROM t$t x JOIN t$t y\n      ON x.bucket = y.bucket AND x.vec_id < y.vec_id"
    }.mkString("\n    UNION ALL\n    ")
    s"""$tables, cand AS (
      |  SELECT DISTINCT a, b FROM (
      |    $perTable
      |  )
      |)""".stripMargin
  }

  /** Cross-modal pair-mining replay: union of caption embeddings and
    * the derived image vectors (ids shifted by 2^40), the shared 2-table
    * literal-hyperplane LSH over the union, cosine verify, ratio-margin
    * normalization over the full candidate graph, cross-modal gate.
    */
  private val crossModalSql: String = {
    val off = 1L << 40
    def bucketExpr(seed: Long): String =
      graft.ext.Similarity.hyperplanes(4, 64, seed).zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n    + ")
    val tables = Seq(42L, 43L).zipWithIndex.map { case (seed, t) =>
      s"t$t AS (\n  SELECT vec_id, CAST(${bucketExpr(seed)} AS BIGINT) AS bucket\n  FROM uni\n)"
    }.mkString(", ")
    val perTable = (0 until 2).map { t =>
      s"SELECT x.vec_id AS a, y.vec_id AS b FROM t$t x JOIN t$t y\n      ON x.bucket = y.bucket AND x.vec_id < y.vec_id"
    }.mkString("\n    UNION ALL\n    ")
    s"""WITH img AS (
      |  SELECT vec_id + $off AS vec_id,
      |    CASE WHEN vec_id % 3 = 0 THEN embedding
      |      ELSE CAST(list_transform(generate_series(1, 64), j ->
      |        (('0x' || substring(md5('img:' || CAST(vec_id AS VARCHAR)
      |           || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 2001
      |         - 1000) / 1000.0) AS FLOAT[]) END AS embedding
      |  FROM embeddings
      |), uni AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id, embedding FROM img
      |), $tables, cand AS (
      |  SELECT DISTINCT a, b FROM (
      |    $perTable
      |  )
      |), scored AS (
      |  SELECT c.a, c.b,
      |    round(list_cosine_similarity(
      |      CAST(ua.embedding AS DOUBLE[]), CAST(ub.embedding AS DOUBLE[])), 6) AS cos
      |  FROM cand c
      |  JOIN uni ua ON c.a = ua.vec_id
      |  JOIN uni ub ON c.b = ub.vec_id
      |), sym AS (
      |  SELECT a AS id, b AS nb, cos FROM scored
      |  UNION ALL SELECT b, a, cos FROM scored
      |), ranked AS (
      |  SELECT id, cos,
      |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, nb) AS rn
      |  FROM sym
      |), mu AS (
      |  SELECT id, floor(avg(cos) * 1e6 + 0.5) / 1e6 AS mu FROM ranked WHERE rn <= 8 GROUP BY id
      |)
      |SELECT s.a AS caption_id, s.b - $off AS image_id, s.cos,
      |  floor(s.cos / ((ma.mu + mb.mu) / 2.0) * 1e4 + 0.5) / 1e4 AS margin
      |FROM scored s JOIN mu ma ON s.a = ma.id JOIN mu mb ON s.b = mb.id
      |WHERE s.a < $off AND s.b >= $off
      |  AND floor(s.cos / ((ma.mu + mb.mu) / 2.0) * 1e4 + 0.5) / 1e4 >= 1.2 AND s.cos > 0
      |ORDER BY caption_id, image_id""".stripMargin
  }

  /** Semantic-decontamination replay: the same 4 literal-plane LSH
    * tables (seeds 42..45) bucketing BOTH the corpus and the benchmark
    * split, in-bucket cross-set candidates, cosine verify at the round-6
    * grid, then per-corpus-vec hit count + struct-max best match
    * (row_number ORDER BY cos DESC, bench_id DESC ≡ Spark's
    * max(struct(cos, bench_id))).
    */
  private def semContamSql: String = {
    def bucketExpr(seed: Long): String =
      graft.ext.Similarity.hyperplanes(4, 64, seed).zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n    + ")
    val tables = (0 until 4).map { t =>
      val seed = 42L + t
      s"""ct$t AS (
         |  SELECT vec_id, CAST(${bucketExpr(seed)} AS BIGINT) AS bucket FROM corp
         |), bt$t AS (
         |  SELECT vec_id, CAST(${bucketExpr(seed)} AS BIGINT) AS bucket FROM bench
         |)""".stripMargin
    }.mkString(", ")
    val per = (0 until 4).map(t =>
      s"SELECT c.vec_id AS a, b.vec_id AS bench_id FROM ct$t c JOIN bt$t b ON c.bucket = b.bucket")
      .mkString("\n    UNION ALL\n    ")
    s"""WITH corp AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 23 <> 0
       |), bench AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 23 = 0
       |), $tables, cand AS (
       |  SELECT DISTINCT a, bench_id FROM (
       |    $per
       |  )
       |), ver AS (
       |  SELECT c.a, c.bench_id,
       |    round(list_cosine_similarity(
       |      CAST(ca.embedding AS DOUBLE[]), CAST(be.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand c
       |  JOIN corp ca ON c.a = ca.vec_id
       |  JOIN bench be ON c.bench_id = be.vec_id
       |), hits AS (
       |  SELECT * FROM ver WHERE cos >= 0.3
       |), best AS (
       |  SELECT a, bench_id, cos,
       |    row_number() OVER (PARTITION BY a ORDER BY cos DESC, bench_id DESC) AS rn
       |  FROM hits
       |)
       |SELECT b.a AS vec_id, n.n_hits, b.bench_id AS best_bench, b.cos AS best_cos
       |FROM best b JOIN (
       |  SELECT a, CAST(count(*) AS BIGINT) AS n_hits FROM hits GROUP BY a) n
       |  ON b.a = n.a
       |WHERE b.rn = 1 ORDER BY vec_id""".stripMargin
  }

  private val dupClustersSql: String =
    dupClustersCtes + "\n" +
    """SELECT node AS doc_id, min(lab) AS cluster
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Shared Lloyd-replay CTE chain (3 unrolled iterations): `emb`
    * (double-cast embeddings), `init` (the `nCells` smallest vec_ids'
    * vectors), assign1..assign3 / cent1..cent3. Each assign is the
    * squared-L2 argmin with the SAME expanded dot-product formula as
    * Spark's `kmeansAssign` (identical IEEE op sequence); each centroid
    * mean rounds to 9 decimals, matching the driver-boundary rounding in
    * `Similarity.kmeansFit` — so both engines iterate from bit-identical
    * centroids. assign3 is the assignment that PRODUCED cent3, exactly
    * what `kmeansFit` returns. Shared by `sim_topk_ivf_kmeans` (and its
    * index twin) and `dedup_semantic` so the replay cannot fork.
    */
  private def kmeansAssign3Ctes(nCells: Int): String = {
    def d2(e: String, c: String) =
      s"list_dot_product($e, $e) + list_dot_product($c, $c) - 2 * list_dot_product($e, $c)"
    def assign(i: Int, centSrc: String) =
      s"""assign$i AS (
        |  SELECT vec_id, e, cell FROM (
        |    SELECT m.vec_id, m.e, c.cell, row_number() OVER
        |      (PARTITION BY m.vec_id ORDER BY ${d2("m.e", "c.c")}, c.cell) AS rn
        |    FROM emb m, $centSrc c)
        |  WHERE rn = 1
        |)""".stripMargin
    def cent(i: Int) =
      s"""cent$i AS (
        |  SELECT cell, list(round(cv, 9) ORDER BY pos) AS c FROM (
        |    SELECT cell, g.i AS pos, avg(e[g.i]) AS cv
        |    FROM assign$i, UNNEST(generate_series(1, len(e))) AS g(i)
        |    GROUP BY cell, g.i)
        |  GROUP BY cell
        |)""".stripMargin
    s"""WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), init AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c
      |  FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT $nCells)
      |), ${assign(1, "init")},
      |${cent(1)},
      |${assign(2, "cent1")},
      |${cent(2)},
      |${assign(3, "cent2")},
      |${cent(3)}""".stripMargin
  }

  /** Fixed-round power-iteration PCA replay CTEs (Similarity.pcaFit):
    * one-pass covariance (round-9), then per component `iters` unrolled
    * matvec+normalize steps (each round-9) with a rank-1 deflation
    * between components — the same unrolled-iteration discipline as the
    * pagerank and Lloyd replays.
    */
  /** Confidence-ordered multi-probe LSH replay
    * ([[graft.ext.Similarity.lshTopK]] at (numPlanes, nProbes)): the
    * fixed-seed hyperplanes embed as DOUBLE literal arrays
    * (Double.toString round-trips exactly), per query the planes sort by
    * |projection| ascending, and the probe buckets flip subsets of the
    * least-confident bits — the engine's own fixed
    * [[graft.ext.Similarity.probeSubsets]] schedule with
    * m = min(numPlanes, 5), replayed via list_sort. nProbes = 1 reduces
    * to the exact-bucket join (probeSubsets' first subset is Ø).
    */
  private def lshMultiProbeSql(numPlanes: Int, nProbes: Int): String = {
    val planes = graft.ext.Similarity.hyperplanes(numPlanes, 64)
    def dot(i: Int) = {
      val arr = planes(i).mkString("[", ", ", "]::DOUBLE[]")
      s"list_dot_product(CAST(embedding AS DOUBLE[]), $arr)"
    }
    val bucket = (0 until numPlanes)
      .map(i => s"(CASE WHEN ${dot(i)} > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString("\n    + ")
    val confList = (0 until numPlanes)
      .map(i => s"{'c': abs(${dot(i)}), 'idx': $i}").mkString("[", ", ", "]")
    val probeExprs = graft.ext.Similarity
      .probeSubsets(nProbes, math.min(numPlanes, 5)).map { ps =>
        ps.foldLeft("bucket") { (acc, p) =>
          s"xor($acc, (1::BIGINT << sorted_idx[${p + 1}]))"
        }
      }.mkString("[", ",\n      ", "]")
    s"""WITH b AS (
      |  SELECT vec_id, embedding,
      |    CAST($bucket AS BIGINT) AS bucket
      |  FROM embeddings
      |), q0 AS (
      |  SELECT vec_id AS query_id, embedding, bucket,
      |    list_transform(list_sort($confList), x -> x['idx']) AS sorted_idx
      |  FROM b WHERE vec_id IN (0, 1, 2)
      |), q AS (
      |  SELECT query_id, embedding AS q_emb,
      |    UNNEST($probeExprs) AS q_bucket
      |  FROM q0
      |), scored AS (
      |  SELECT q.query_id, b.vec_id,
      |    round(list_cosine_similarity(
      |      CAST(q.q_emb AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
      |  FROM b JOIN q ON b.bucket = q.q_bucket
      |  WHERE b.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM scored
      |)
      |SELECT query_id, vec_id, cos, rank FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  private def pcaCtes(k: Int, iters: Int): String = {
    def compCtes(c: Int): String = {
      // decimally-rough start (NOT 1/sqrt(d) = a short decimal): a
      // uniform 0.125 start puts step-1 products exactly on the 1e-9
      // rounding grid's .5 boundary, where the engines' tie behaviors
      // split systematically
      val v0 =
        s"""v${c}_0 AS MATERIALIZED (
          |  SELECT g.i - 1 AS j,
          |    round((1.0 + ((g.i - 1) * 2654435761) % 1000003 / 1000003.0)
          |      / sqrt(CAST(dd.d AS DOUBLE)), 9) AS w
          |  FROM dd, UNNEST(generate_series(1, dd.d)) AS g(i)
          |)""".stripMargin
      val steps = (1 to iters).map { t =>
        s"""u${c}_$t AS MATERIALIZED (
          |  SELECT cv.i, round(sum(cv.c * v.w), 9) AS u
          |  FROM cov$c cv JOIN v${c}_${t - 1} v ON cv.j = v.j GROUP BY cv.i
          |), m${c}_$t AS MATERIALIZED (
          |  SELECT round(sqrt(sum(u * u)), 9) AS nrm FROM u${c}_$t
          |), v${c}_$t AS MATERIALIZED (
          |  SELECT u.i AS j, round(u.u / m.nrm, 9) AS w FROM u${c}_$t u, m${c}_$t m
          |)""".stripMargin
      }.mkString(",\n")
      val lam =
        s"""lam$c AS MATERIALIZED (
          |  SELECT round(sum(wi.w * cv.c * wj.w), 7) AS lam
          |  FROM cov$c cv JOIN v${c}_$iters wi ON cv.i = wi.j
          |    JOIN v${c}_$iters wj ON cv.j = wj.j
          |)""".stripMargin
      val deflate = if (c < k - 1)
        s""",
          |cov${c + 1} AS MATERIALIZED (
          |  SELECT cv.i, cv.j, round(cv.c - l.lam * wi.w * wj.w, 9) AS c
          |  FROM cov$c cv JOIN v${c}_$iters wi ON cv.i = wi.j
          |    JOIN v${c}_$iters wj ON cv.j = wj.j, lam$c l
          |)""".stripMargin
      else ""
      s"$v0,\n$steps,\n$lam$deflate"
    }
    s"""e AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), nn AS MATERIALIZED (
      |  SELECT CAST(count(*) AS DOUBLE) AS n FROM e
      |), dd AS MATERIALIZED (
      |  SELECT CAST(max(len(e)) AS INT) AS d FROM e
      |), mu AS MATERIALIZED (
      |  SELECT g.i - 1 AS dim, round(sum(e[g.i]) / nn.n, 7) AS mu
      |  FROM e, UNNEST(generate_series(1, len(e))) AS g(i), nn
      |  GROUP BY g.i - 1, nn.n
      |), cp AS MATERIALIZED (
      |  SELECT g1.i - 1 AS i, g2.i - 1 AS j, sum(e[g1.i] * e[g2.i]) AS sp
      |  FROM e, UNNEST(generate_series(1, len(e))) AS g1(i),
      |    UNNEST(generate_series(1, len(e))) AS g2(i)
      |  GROUP BY 1, 2
      |), cov0 AS MATERIALIZED (
      |  SELECT cp.i, cp.j, round(cp.sp / nn.n - ma.mu * mb.mu, 7) AS c
      |  FROM cp JOIN mu ma ON ma.dim = cp.i JOIN mu mb ON mb.dim = cp.j, nn
      |), tr AS MATERIALIZED (
      |  SELECT round(sum(c), 7) AS trace FROM cov0 WHERE i = j
      |),
      |${(0 until k).map(compCtes).mkString(",\n")}""".stripMargin
  }

  /** The k·d-row model projection of [[pcaCtes]]'s final state. */
  private def pcaModelSelect(k: Int, iters: Int): String =
    (0 until k).map { c =>
      s"""SELECT CAST($c AS INT) AS component, CAST(v.j AS INT) AS dim,
        |  round(v.w, 6) AS w, round(l.lam, 6) AS eigenvalue,
        |  round(l.lam / t.trace, 6) AS var_share
        |FROM v${c}_$iters v, lam$c l, tr t""".stripMargin
    }.mkString("\nUNION ALL\n")

  // shared by the url/domain family: the harness's deterministic
  // messy-URL derivation (SparkEntry.withUrl) replayed verbatim, plus the
  // domain key (lower host, www/port stripped)
  private val urlCtes: String =
    """u AS (
      |  SELECT doc_id, lang, text,
      |    (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS' ELSE 'Http' END)
      |    || '://' ||
      |    (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'cdn.' || source || '.com'
      |      WHEN 1 THEN upper(source) || '.COM'
      |      WHEN 2 THEN 'WWW.' || source || '.com'
      |      ELSE 'www.' || source || '.org' END)
      |    || '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR)
      |    || (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN '' WHEN 1 THEN '/'
      |      WHEN 2 THEN '?utm_source=feed&utm_campaign=spring'
      |      WHEN 3 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&utm_medium=email&ref=tw'
      |      ELSE '#section-2' END) AS url
      |  FROM documents
      |), dom AS (
      |  SELECT doc_id, lang, text, url,
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
      |      '^www\.', ''), ':[0-9]+$', '') AS domain
      |  FROM u
      |)""".stripMargin

  /** The planted-boilerplate replay shared by the text_boilerplate rows:
    * nav/footer/promo lines appended to each doc (mirrors SparkEntry's
    * withBoiler verbatim), exploded to ordinal lines, with the
    * per-(domain, line) distinct-document frequency and its >= 4 head.
    */
  private val boilerCtes: String =
    """ b AS (
      |  SELECT d.doc_id, d.domain,
      |    'home | about | products | contact - ' || doc.source || chr(10)
      |    || d.text || chr(10)
      |    || (CASE WHEN d.doc_id % 77 = 0
      |        THEN 'limited offer today only' || chr(10) ELSE '' END)
      |    || 'this site uses cookies. accept to continue.' AS text
      |  FROM dom d JOIN documents doc ON d.doc_id = doc.doc_id
      |), ln AS (
      |  SELECT doc_id, domain, g.i - 1 AS i, sp[g.i] AS line
      |  FROM (SELECT doc_id, domain, string_split(text, chr(10)) AS sp FROM b),
      |    UNNEST(generate_series(1, len(sp))) AS g(i)
      |), dfreq AS (
      |  SELECT domain, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM ln GROUP BY domain, line
      |), dropset AS (
      |  SELECT domain, line FROM dfreq WHERE df >= 4
      |)""".stripMargin

  /** The JL ±1 sign rows as DuckDB VALUES literals — the identical matrix
    * the engine derives driver-side ([[graft.ext.Similarity.jlSigns]]);
    * shared by the projection row and the two-stage serving row.
    */
  private val jlAxisRows: String =
    graft.ext.Similarity.jlSigns(16, 64).zipWithIndex.map { case (row, j) =>
      val arr = row.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"  (CAST($j AS BIGINT), $arr::DOUBLE[])"
    }.mkString(",\n")

  private val base: Map[String, String] = Map(

    "a1_filter_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    "a2_eq_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    "a3_equi_join" ->
      """SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "a4_lookup_join" ->
      """SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY c.c_custkey""".stripMargin,

    "a6_count" ->
      "SELECT count(*) AS n_rows FROM lineitem",

    "a7_status_derivation" ->
      """SELECT user_id, total, ok, fail,
        |  CASE WHEN fail = 0 THEN 'SUCCESS'
        |       WHEN ok = 0 THEN 'FAILED'
        |       ELSE 'PARTIAL_SUCCESS' END AS status
        |FROM (
        |  SELECT user_id, count(*) AS total,
        |    CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS ok,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS fail
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    "a8_latest_wins" ->
      """SELECT user_id, event_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, value
        |FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "b1_job_summary" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS run_date, count(*) AS total_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup
        |FROM events WHERE CAST(ts AS DATE) >= DATE '$asOf'
        |GROUP BY 1 ORDER BY run_date DESC""".stripMargin,

    "b2_per_type_status" ->
      """SELECT event_type, count(*) AS total_events,
        |  CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
        |  round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE), 3) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "b3_error_details" ->
      s"""SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, value, props
        |FROM events
        |WHERE event_type = 'error' AND CAST(ts AS DATE) >= DATE '$asOf'
        |ORDER BY ts DESC, event_id""".stripMargin,

    "b4_daily_value" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS run_date, event_type,
        |  round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE), 3) AS total_value, count(*) AS n_events
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1, 2 ORDER BY run_date DESC, event_type ASC""".stripMargin,

    "d_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,

    // session_window replay: islands split at gap >= 1h (the half-open
    // window boundary), session_end = last event + gap
    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 3600000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    // one-pass constraint audit: violation counts per rule, long-form.
    // The null-predicate convention (null comparisons count as
    // violations) matches the engine's coalesce(pred, false)
    "corpus_expectations" ->
      """WITH agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_not_null,
        |    CAST(sum(CASE WHEN coalesce(lang IN ('de','en','es','fr'), false) THEN 0 ELSE 1 END) AS BIGINT) AS lang_in_domain,
        |    CAST(sum(CASE WHEN coalesce(n_chars = length(text), false) THEN 0 ELSE 1 END) AS BIGINT) AS n_chars_consistent,
        |    CAST(sum(CASE WHEN coalesce(length(text) > 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS text_nonempty,
        |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS doc_id_unique,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM documents
        |)
        |SELECT rule, n_violations, n_rows, n_violations = 0 AS pass FROM (
        |  SELECT 'doc_id_not_null' AS rule, doc_id_not_null AS n_violations, n_rows FROM agg
        |  UNION ALL SELECT 'lang_in_domain', lang_in_domain, n_rows FROM agg
        |  UNION ALL SELECT 'n_chars_consistent', n_chars_consistent, n_rows FROM agg
        |  UNION ALL SELECT 'text_nonempty', text_nonempty, n_rows FROM agg
        |  UNION ALL SELECT 'doc_id_unique', doc_id_unique, n_rows FROM agg
        |) ORDER BY rule""".stripMargin,

    // top-k per group: the same composed 4-decimal quality score as
    // text_quality_filter, ranked within each language
    "text_top_per_lang" -> {
      val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
      s"""WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
        |    $occ AS n_stopwords,
        |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, lang,
        |    round(round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4)
        |        - round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4), 4) AS score
        |  FROM base
        |)
        |SELECT doc_id, lang, score,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        |FROM scored QUALIFY rank <= 3
        |ORDER BY lang, rank""".stripMargin
    },

    // per-type value quartiles: ntile with a unique event_id tiebreak so
    // bucket boundaries are engine-independent
    "events_value_quartiles" ->
      """WITH q AS (
        |  SELECT event_type, value,
        |    CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS INTEGER) AS quartile
        |  FROM events
        |)
        |SELECT event_type, quartile, count(*) AS n_events,
        |  (CAST(((CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) * 100 AS BIGINT) * 2 * 10000 + (count(*) * 100)) // (2 * ((count(*) * 100)))) AS DOUBLE) / 10000) AS avg_value,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value
        |FROM q GROUP BY event_type, quartile
        |ORDER BY event_type, quartile""".stripMargin,

    "set_ops" ->
      """SELECT 'with_orders' AS tag, c_custkey FROM
        |  (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'no_orders' AS tag, c_custkey FROM
        |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY tag, c_custkey""".stripMargin,

    "asof_join" ->
      """WITH signups AS (
        |  SELECT user_id, ts, value AS signup_value, event_id AS sig_id
        |  FROM events WHERE event_type = 'signup'
        |), purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, s.signup_value
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    // custom-operator twin: the CUSTOM PHYSICAL PLAN must hash-match the
    // exact same DuckDB ASOF LEFT JOIN the composed form is pinned to
    // forward as-of: DuckDB native ASOF with the inequality flipped
    // (s.ts <= p.ts picks the EARLIEST purchase at-or-after each signup)
    "asof_join_fwd" ->
      """WITH signups AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
        |), purchases AS (
        |  SELECT user_id, ts, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT s.event_id, s.user_id,
        |  strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, p.purchase_value
        |FROM signups s ASOF LEFT JOIN purchases p
        |  ON s.user_id = p.user_id AND s.ts <= p.ts
        |ORDER BY s.event_id""".stripMargin,

    // strict (allow_exact_matches=false): replayed as a windowed
    // previous-row lookup rather than native ASOF — the window's
    // (ts DESC, event_id DESC) order replays the exec's tie-break
    // deterministically where ASOF's choice among equal right times is
    // unspecified. Strictness is the l.ts > r.ts join predicate; the
    // LEFT JOIN keeps no-match rows with a null payload.
    "asof_join_strict" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), ranked AS (
        |  SELECT l.event_id, l.user_id, l.ts, r.value AS prev_value,
        |    row_number() OVER (PARTITION BY l.event_id
        |      ORDER BY r.ts DESC, r.event_id DESC) AS rn
        |  FROM purchases l LEFT JOIN purchases r
        |    ON l.user_id = r.user_id AND r.ts < l.ts
        |)
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, prev_value
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,

    // nearest = the two native ASOF directions composed + the exec's
    // choice rule (smaller distance wins, ties backward, 4-day bound on
    // the chosen side) — epoch_us distances, exactly the exec's native
    // microsecond arithmetic
    "asof_join_nearest" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), signups AS (
        |  SELECT user_id, ts, value AS signup_value, event_id AS sig_id
        |  FROM events WHERE event_type = 'signup'
        |), b AS (
        |  SELECT p.event_id, s.ts AS bts, s.signup_value AS bval
        |  FROM purchases p ASOF LEFT JOIN signups s
        |    ON p.user_id = s.user_id AND p.ts >= s.ts
        |), f AS (
        |  SELECT p.event_id, s.ts AS fts, s.signup_value AS fval
        |  FROM purchases p ASOF LEFT JOIN signups s
        |    ON p.user_id = s.user_id AND p.ts < s.ts
        |)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  CASE WHEN bts IS NOT NULL
        |         AND epoch_us(p.ts) - epoch_us(bts) <= 345600000000
        |         AND (fts IS NULL
        |              OR epoch_us(fts) - epoch_us(p.ts) > 345600000000
        |              OR epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
        |       THEN bval
        |       WHEN fts IS NOT NULL
        |         AND epoch_us(fts) - epoch_us(p.ts) <= 345600000000
        |       THEN fval
        |  END AS signup_value
        |FROM purchases p
        |JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY p.event_id""".stripMargin,

    "asof_join_exec" ->
      """WITH signups AS (
        |  SELECT user_id, ts, value AS signup_value, event_id AS sig_id
        |  FROM events WHERE event_type = 'signup'
        |), purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, s.signup_value
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    // composite keys + staleness bound: DuckDB ASOF matches on BOTH
    // equalities; the tolerance nulls the payload when the (unique)
    // latest at-or-before candidate is too stale. epoch_us floors ns
    // to µs exactly like the Spark read path's `ts div 1000`. grp is
    // coalesced to -1 on both engines (see Queries.asofJoinTolQuery):
    // SQL ON-equality never matches NULL but the exec's sort-merge does.
    "asof_join_tol" ->
      """WITH ev AS (
        |  SELECT *, COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4, -1) AS grp
        |  FROM events
        |), signups AS (
        |  SELECT user_id, grp, ts, value AS signup_value, event_id AS sig_id
        |  FROM ev WHERE event_type = 'signup'
        |), purchases AS (
        |  SELECT event_id, user_id, grp, ts FROM ev WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.grp,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  CASE WHEN s.ts IS NOT NULL
        |         AND epoch_us(p.ts) - epoch_us(s.ts) <= 345600000000
        |       THEN s.signup_value END AS signup_value
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.grp = s.grp AND p.ts >= s.ts
        |ORDER BY p.event_id""".stripMargin,

    // funnel: first signup, first click strictly after it, first purchase
    // strictly after that — each stage a keyed min, exactly the Spark
    // stage chain
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT user_id, min(us) AS t FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id
        |)
        |SELECT 1 AS step, 'signup' AS event_type, count(*) AS users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,

    // the TIMES shape of the same sequential-first semantics: per-user
    // (t1 < t2 < t3) for funnel completers — gates the single-pass state
    // machine's per-user output, not just its step counts
    "events_funnel_times" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), s1 AS (
        |  SELECT user_id, min(us) AS t FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.us) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us > s1.t GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.us) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us > s2.t GROUP BY e.user_id
        |)
        |SELECT s1.user_id, s1.t AS t1, s2.t AS t2, s3.t AS t3
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // trailing 1-hour RANGE frame on the µs timeline; frame sums rounded
    // (intra-frame float accumulation order differs between engines)
    "events_rolling" ->
      """SELECT event_id, user_id,
        |  round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) OVER w AS DOUBLE), 3) AS roll_value,
        |  count(*) OVER w AS n_window
        |FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // trailing-window distinct: exact side replayed (day-frame range
    // join over distinct (day, user) pairs), sketch flag pinned true —
    // the agg_approx_distinct hash-gating discipline
    "events_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        |), days AS (SELECT DISTINCT d FROM du),
        |win AS (
        |  SELECT a.d AS day, count(DISTINCT b.user_id) AS exact_users
        |  FROM days a JOIN du b ON b.d BETWEEN a.d - 6 AND a.d
        |  GROUP BY a.d
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(exact_users AS BIGINT) AS exact_users, true AS approx_ok
        |FROM win ORDER BY day""".stripMargin,

    // basket rules: order-keyed pair join, exact integer supports, two
    // rounded divisions
    "basket_rules" ->
      """WITH i AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM i),
        |supp AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS s FROM i GROUP BY 1
        |), pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS sp
        |  FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), directed AS (
        |  SELECT pa AS ante, pb AS cons, sp FROM pairs
        |  UNION ALL SELECT pb, pa, sp FROM pairs
        |)
        |SELECT d.ante, d.cons, d.sp AS support,
        |  round(CAST(d.sp AS DOUBLE) / sa.s, 6) AS confidence,
        |  round(CAST(d.sp AS DOUBLE) * n.n_orders / (sa.s * sc.s), 4) AS lift
        |FROM directed d
        |JOIN supp sa ON d.ante = sa.p
        |JOIN supp sc ON d.cons = sc.p, n
        |ORDER BY d.ante, d.cons""".stripMargin,

    // per-user trend: milli-scaled integer daily values, 64-bit normal
    // equations, one rounded double division
    "events_user_trend" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
        |    CAST(round(round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE), 3) * 1000) AS BIGINT) AS v3
        |  FROM events GROUP BY 1, 2
        |), terms AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sdd,
        |    CAST(sum(v3) AS BIGINT) AS sv, CAST(sum(d * v3) AS BIGINT) AS sdv
        |  FROM daily GROUP BY 1
        |)
        |SELECT user_id, n_days,
        |  (CAST(((sv * 2 * 10000 + n_days * 1000) // (2 * (n_days * 1000))) AS DOUBLE) / 10000) AS mean_daily,
        |  round(CAST(n_days * sdv - sd * sv AS DOUBLE) /
        |    ((n_days * sdd - sd * sd) * 1000.0), 6) AS slope
        |FROM terms WHERE n_days >= 2 ORDER BY user_id""".stripMargin,

    // debounce: chain semantics via lag gap, burst = running flag sum,
    // struct-min keeps the first (us, event_id) of each burst
    "events_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN COALESCE(us - lag(us) OVER w, 300000001) > 300000000
        |    THEN 1 ELSE 0 END AS new_burst
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us, event_id)
        |), bursts AS (
        |  SELECT *, CAST(sum(new_burst) OVER (PARTITION BY user_id, event_type
        |    ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS burst
        |  FROM flagged
        |)
        |SELECT CAST(min(CASE WHEN new_burst = 1 THEN event_id END) AS BIGINT)
        |    AS event_id,
        |  user_id, event_type, CAST(count(*) AS BIGINT) AS burst_size
        |FROM bursts GROUP BY user_id, event_type, burst
        |ORDER BY event_id""".stripMargin,

    // seasonal anomaly: integer epoch hour-of-week cells, LEAVE-ONE-OUT
    // baseline from exact class Σn/Σn² minus the cell's own terms
    // (population σ self-masks a lone spike at z = sqrt(k-1)), z round 4
    "events_seasonal_anomaly" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
        |    (epoch_us(ts) - (epoch_us(ts) // 86400000000) * 86400000000)
        |      // 3600000000 AS hour,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3
        |), b AS (
        |  SELECT dow, hour, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
        |  FROM c GROUP BY 1, 2
        |), z AS (
        |  SELECT c.day, c.dow, c.hour, c.n,
        |    CASE WHEN b.k < 2 THEN CAST(0 AS DOUBLE) ELSE
        |      round((c.n - CAST(b.s1 - c.n AS DOUBLE) / (b.k - 1)) /
        |        greatest(sqrt(greatest(
        |          CAST(b.s2 - c.n * c.n AS DOUBLE) / (b.k - 1) -
        |          (CAST(b.s1 - c.n AS DOUBLE) / (b.k - 1)) *
        |          (CAST(b.s1 - c.n AS DOUBLE) / (b.k - 1)),
        |          CAST(0 AS DOUBLE))), 1e-9), 4) END AS z
        |  FROM c JOIN b USING (dow, hour)
        |)
        |SELECT day, dow, hour, n, z, abs(z) > 3.0 AS anomaly
        |FROM z ORDER BY day, hour""".stripMargin,

    // multi-touch attribution: dyadic decay from a literal list (never
    // pow), exact-integer day deltas, per-purchase dyadic decay sums;
    // credits quantized to 6 then SUMMED AS SCALED LONGS (order-free)
    // before the (model, channel) aggregation — 1/n is not dyadic
    "events_attribution" -> {
      val decays = (0 until 7).map(d => math.pow(0.5, d)).mkString("[", ", ", "]")
      s"""WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us, value
        |  FROM events WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us,
        |    event_id AS t_id
        |  FROM events WHERE event_type IN ('click', 'view')
        |), j AS (
        |  SELECT p.p_id, p.value, t.channel, t.t_us, t.t_id, p.p_us,
        |    ($decays)[CAST((p.p_us - t.t_us - 1) // 86400000000 + 1 AS INT)] AS decay
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 7 * 86400000000
        |), s AS (
        |  SELECT *,
        |    count(*) OVER (PARTITION BY p_id) AS n,
        |    sum(decay) OVER (PARTITION BY p_id) AS decay_sum,
        |    row_number() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rn_first,
        |    row_number() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC) AS rn_last
        |  FROM j
        |), m AS (
        |  SELECT 'first_touch' AS model, channel, value,
        |    round(CASE WHEN rn_first = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END, 6) AS wt FROM s
        |  UNION ALL
        |  SELECT 'last_touch', channel, value,
        |    round(CASE WHEN rn_last = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END, 6) FROM s
        |  UNION ALL
        |  SELECT 'linear', channel, value, round(CAST(1 AS DOUBLE) / n, 6) FROM s
        |  UNION ALL
        |  SELECT 'time_decay', channel, value, round(decay / decay_sum, 6) FROM s
        |)
        |SELECT model, channel,
        |  (CAST((sum(CAST(round(wt * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS conversions,
        |  (CAST((sum(CAST(round(round(wt * value, 6) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS revenue
        |FROM m GROUP BY model, channel
        |ORDER BY model, channel""".stripMargin
    },

    // KMV overlap: the min-k sketches replay as ORDER BY h LIMIT k over
    // the portable hash; estimate algebra on identical doubles
    "events_user_overlap" ->
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |), hb AS (
        |  SELECT DISTINCT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |), ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |u AS (
        |  SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
        |  ORDER BY h LIMIT 64
        |), s AS (
        |  SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_sk_union,
        |    (SELECT max(h) FROM u) AS kth,
        |    CAST((SELECT count(*) FROM u
        |      WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)) AS BIGINT)
        |      AS common
        |), s2 AS (
        |  SELECT *, CASE WHEN n_sk_union < 64 THEN CAST(n_sk_union AS DOUBLE)
        |    ELSE round(63 * 1152921504606846976.0 / kth, 4) END AS est_union
        |  FROM s
        |)
        |SELECT s2.n_sk_union, s2.kth, s2.common, s2.est_union,
        |  CASE WHEN s2.n_sk_union < 64 THEN CAST(s2.common AS DOUBLE)
        |    ELSE round(s2.common * s2.est_union / 64, 4) END AS est_inter,
        |  CAST((SELECT count(*) FROM ha) AS BIGINT) AS exact_a,
        |  CAST((SELECT count(*) FROM hb) AS BIGINT) AS exact_b,
        |  CAST((SELECT count(*) FROM ha WHERE h IN (SELECT h FROM hb)) AS BIGINT)
        |    AS exact_overlap
        |FROM s2""".stripMargin,

    // dense per-user day calendar with forward fill; generate_series over
    // each user's span mirrors the engine's sequence+explode
    "events_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE), 3) AS v
        |  FROM events GROUP BY 1, 2
        |), cal AS (
        |  SELECT user_id, CAST(g.d AS DATE) AS day
        |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |    UNNEST(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |      INTERVAL 1 DAY)) AS g(d)
        |), j AS (
        |  SELECT c.user_id, c.day, d.v FROM cal c LEFT JOIN daily d USING (user_id, day)
        |)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value,
        |  v IS NULL AS filled
        |FROM j ORDER BY user_id, day""".stripMargin,

    // rolling z-score anomaly scoring: mean/variance derived from the
    // window's Σn / Σn² with the same (Σn² − (Σn)²/c)/(c−1) arithmetic as
    // the engine — no Welford-order dependence between engines
    "events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, day, n,
        |    count(*) OVER w AS cnt_w,
        |    sum(CAST(n AS DOUBLE)) OVER w AS s1,
        |    sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w AS s2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |), g AS (
        |  SELECT event_type, day, n, s1 / cnt_w AS mu,
        |    (s2 - s1 * s1 / cnt_w) / (cnt_w - 1) AS variance
        |  FROM stats WHERE cnt_w >= 4
        |)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  round(mu, 4) AS mu,
        |  round(sqrt(variance), 4) AS sd,
        |  round((n - mu) / sqrt(variance), 4) AS z,
        |  abs((n - mu) / sqrt(variance)) >= 3.0 AS is_anomaly
        |FROM g WHERE variance > 0
        |ORDER BY event_type, day""".stripMargin,

    // EWMA forecast residual: unrolled lag-1..8 dot product, decay powers
    // written as repeated *0.7 products (exact IEEE parity with the
    // engine's fold), weighted variance via the same E[x2]-E[x]2 form
    "events_ewma" -> {
      val lags = 8
      def w(k: Int) = "1.0" + "*0.7" * (k - 1)
      def terms(f: Int => String) = (1 to lags)
        .map(k => s"(CASE WHEN l$k IS NULL THEN 0.0 ELSE ${f(k)} END)")
        .mkString(" + ")
      val lagDefs = (1 to lags).map(k => s"lag(n, $k) OVER w AS l$k").mkString(", ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), lagged AS (
         |  SELECT event_type, day, n, $lagDefs
         |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |), s AS (
         |  SELECT event_type, day, n,
         |    CAST(${terms(_ => "1.0")} AS INT) AS cnt_w,
         |    ${terms(k => w(k))} AS den,
         |    ${terms(k => s"${w(k)} * CAST(l$k AS DOUBLE)")} AS num,
         |    ${terms(k => s"${w(k)} * CAST(l$k AS DOUBLE) * CAST(l$k AS DOUBLE)")} AS numsq
         |  FROM lagged
         |), g AS (
         |  SELECT event_type, day, n, num / den AS f,
         |    numsq / den - (num / den) * (num / den) AS variance
         |  FROM s WHERE cnt_w >= 4
         |)
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
         |  round(f, 4) AS ewma,
         |  round(sqrt(variance), 4) AS sd,
         |  round((n - f) / sqrt(variance), 4) AS score,
         |  abs((n - f) / sqrt(variance)) >= 3.0 AS is_anomaly
         |FROM g WHERE variance > 0
         |ORDER BY event_type, day""".stripMargin
    },

    // Markov transitions: lag pairs within the user timeline (event_id
    // tiebreak on timestamp ties), integer counts into one rounded ratio
    "events_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events
        |), pairs AS (
        |  SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
        |), totals AS (
        |  SELECT prev, CAST(sum(n) AS BIGINT) AS n_prev FROM pairs GROUP BY 1
        |)
        |SELECT p.prev, p.next, p.n, t.n_prev,
        |  round(CAST(p.n AS DOUBLE) / t.n_prev, 4) AS p
        |FROM pairs p JOIN totals t USING (prev)
        |ORDER BY prev, next""".stripMargin,

    // hour-of-week heatmap: dow/hour from INTEGER epoch-us arithmetic
    // ((days+4) mod 7, 0=Sunday) — never the engines' calendar functions
    "events_heatmap" ->
      """WITH c AS (
        |  SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS INT) AS dow,
        |    CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS hour
        |  FROM events
        |), g AS (
        |  SELECT dow, hour, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2
        |), t AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total FROM g
        |), d AS (
        |  SELECT dow, CAST(sum(n) AS BIGINT) AS dn FROM g GROUP BY 1
        |)
        |SELECT g.dow, g.hour, g.n,
        |  (CAST(((g.n * 2 * 10000 + t.total) // (2 * t.total)) AS DOUBLE) / 10000) AS share,
        |  (CAST(((g.n * 2 * 10000 + d.dn) // (2 * d.dn)) AS DOUBLE) / 10000) AS dow_share
        |FROM g CROSS JOIN t JOIN d USING (dow)
        |ORDER BY g.dow, g.hour""".stripMargin,

    // RFM segmentation: quartile-boundary compares (ties share a score),
    // monetary on the round-4 grid BEFORE the quantile, recency exact µs
    "events_rfm" ->
      """WITH per AS (
        |  SELECT user_id, epoch_us(max(ts)) AS rec,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE), 4) AS monetary
        |  FROM events GROUP BY 1
        |), q AS (
        |  SELECT quantile_cont(rec, 0.25) AS r1, quantile_cont(rec, 0.5) AS r2,
        |    quantile_cont(rec, 0.75) AS r3,
        |    quantile_cont(n_events, 0.25) AS f1, quantile_cont(n_events, 0.5) AS f2,
        |    quantile_cont(n_events, 0.75) AS f3,
        |    quantile_cont(monetary, 0.25) AS m1, quantile_cont(monetary, 0.5) AS m2,
        |    quantile_cont(monetary, 0.75) AS m3
        |  FROM per
        |), scored AS (
        |  SELECT p.user_id, p.n_events, p.monetary,
        |    CAST(1 + CAST(p.rec > q.r1 AS INT) + CAST(p.rec > q.r2 AS INT)
        |      + CAST(p.rec > q.r3 AS INT) AS INT) AS r,
        |    CAST(1 + CAST(p.n_events > q.f1 AS INT) + CAST(p.n_events > q.f2 AS INT)
        |      + CAST(p.n_events > q.f3 AS INT) AS INT) AS f,
        |    CAST(1 + CAST(p.monetary > q.m1 AS INT) + CAST(p.monetary > q.m2 AS INT)
        |      + CAST(p.monetary > q.m3 AS INT) AS INT) AS m
        |  FROM per p CROSS JOIN q
        |)
        |SELECT user_id, n_events, monetary, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
        |FROM scored ORDER BY user_id""".stripMargin,

    // key-skew diagnostic: shares/cumulative shares from exact integer
    // prefix sums, Gini via the all-integer closed form
    "events_skew" ->
      """WITH counts AS (
        |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM counts
        |), g AS (
        |  SELECT CAST(sum((2 * i - n_keys - 1) * n) AS BIGINT) AS gnum,
        |    min(total) AS total, min(n_keys) AS n_keys
        |  FROM (SELECT n, CAST(row_number() OVER (ORDER BY n, key) AS BIGINT) AS i
        |        FROM counts)
        |  CROSS JOIN tot
        |), r AS (
        |  SELECT key, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, key) AS INT) AS rank,
        |    CAST(sum(n) OVER (ORDER BY n DESC, key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn
        |  FROM counts
        |)
        |SELECT r.rank, r.key, r.n,
        |  (CAST(((r.n * 2 * 10000 + g.total) // (2 * g.total)) AS DOUBLE) / 10000) AS share,
        |  (CAST(((r.cumn * 2 * 10000 + g.total) // (2 * g.total)) AS DOUBLE) / 10000) AS cum_share,
        |  (CAST(((g.gnum * 2 * 10000 + g.n_keys * g.total) // (2 * (g.n_keys * g.total))) AS DOUBLE) / 10000) AS gini,
        |  (r.rank = 1 AND CAST(r.n AS DOUBLE) / g.total
        |    > greatest(0.05, 2.0 / g.n_keys)) AS salt_recommended
        |FROM r CROSS JOIN g
        |WHERE r.rank <= 10 ORDER BY r.rank""".stripMargin,

    // MAD robust outliers: exact interpolated medians (quantile_cont ≡
    // Spark percentile), modified-z gate compares identical doubles
    "events_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, min(med) AS med, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT d.event_type, round(min(m.med), 4) AS med,
        |  round(min(m.mad), 4) AS mad,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN d.ad * 0.6745 > 3.5 * m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN d.ad * 0.6745 > 3.5 * m.mad THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 4) AS outlier_frac
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    // interval-union coverage: gaps-and-islands sweep on exact µs ints —
    // a block opens where start > running max end of all PRIOR intervals
    "events_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
        |  FROM events
        |), mk AS (
        |  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM iv
        |), op AS (
        |  SELECT *, coalesce(s > maxe, true) AS opens FROM mk
        |), blk AS (
        |  SELECT *, sum(CASE WHEN opens THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY user_id ORDER BY s, e
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block
        |  FROM op
        |), blocks AS (
        |  SELECT user_id, block, min(s) AS bs, max(e) AS be,
        |    CAST(count(*) AS BIGINT) AS nint
        |  FROM blk GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(be - bs) AS BIGINT) AS covered_us,
        |  CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(nint) AS BIGINT) AS n_events,
        |  round(CAST(sum(nint) * 300000000 AS DOUBLE) / sum(be - bs), 4)
        |    AS inflation
        |FROM blocks GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // Holt forecast replay: the recurrence is scaled-long with explicit
    // floors (l' = ⌊(x·1e6 + l + b)/2⌋, b' = ⌊(l' − l + 3b)/4⌋), so a
    // WITH RECURSIVE walk over the day index reproduces the engine's
    // integer states bit-for-bit; /2.0 divisions exact below 2^52
    "events_forecast" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), ord AS (
        |  SELECT event_type, day, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    count(*) OVER (PARTITION BY event_type) AS span
        |  FROM daily
        |), rec AS (
        |  SELECT event_type, i, span, day,
        |    CAST(n * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
        |  FROM ord WHERE i = 1
        |  UNION ALL
        |  SELECT o.event_type, o.i, o.span, o.day,
        |    CAST(floor((o.n * 1000000 + r.l + r.b) / 2.0) AS BIGINT),
        |    CAST(floor((CAST(floor((o.n * 1000000 + r.l + r.b) / 2.0) AS BIGINT)
        |      - r.l + 3 * r.b) / 4.0) AS BIGINT)
        |  FROM ord o JOIN rec r
        |    ON o.event_type = r.event_type AND o.i = r.i + 1
        |), fin AS (
        |  SELECT event_type, day, l, b FROM rec WHERE i = span
        |)
        |SELECT f.event_type, CAST(h.h AS INTEGER) AS h,
        |  strftime(f.day + CAST(h.h AS INTEGER), '%Y-%m-%d') AS forecast_day,
        |  f.l + h.h * f.b AS forecast_u
        |FROM fin f CROSS JOIN (SELECT unnest(range(1, 8)) AS h) h
        |ORDER BY event_type, h""".stripMargin,

    // seasonal Holt-Winters replay: the extended state (l, b, 7 seasonal
    // slots) walks the same explicit-floor recurrence; the slot list is
    // rebuilt per step with a comprehension, l' inlined where referenced
    "events_forecast_seasonal" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), ord AS (
        |  SELECT event_type, day, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS span
        |  FROM daily
        |), rec AS (
        |  SELECT event_type, 1 AS rn, span, day,
        |    CAST(n * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
        |    [CAST(0 AS BIGINT),0,0,0,0,0,0] AS s
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.rn, o.span, o.day,
        |    CAST(floor((o.n*1000000 - r.s[(o.rn-1)%7 + 1] + r.l + r.b)/2.0) AS BIGINT),
        |    CAST(floor((CAST(floor((o.n*1000000 - r.s[(o.rn-1)%7 + 1] + r.l + r.b)/2.0) AS BIGINT) - r.l + 3*r.b)/4.0) AS BIGINT),
        |    [CASE WHEN g = (o.rn-1)%7 + 1
        |       THEN CAST(floor((o.n*1000000 - CAST(floor((o.n*1000000 - r.s[(o.rn-1)%7 + 1] + r.l + r.b)/2.0) AS BIGINT) + 3*r.s[g])/4.0) AS BIGINT)
        |       ELSE r.s[g] END FOR g IN range(1, 8)]
        |  FROM ord o JOIN rec r ON o.event_type = r.event_type AND o.rn = r.rn + 1
        |), fin AS (
        |  SELECT event_type, day, l, b, s, rn FROM rec WHERE rn = span
        |)
        |SELECT f.event_type, CAST(h.h AS INTEGER) AS h,
        |  strftime(f.day + CAST(h.h AS INTEGER), '%Y-%m-%d') AS forecast_day,
        |  f.l + h.h*f.b + f.s[CAST((f.rn - 1 + h.h) % 7 + 1 AS INTEGER)] AS forecast_u
        |FROM fin f CROSS JOIN (SELECT unnest(range(1,8)) AS h) h
        |ORDER BY event_type, h""".stripMargin,

    // CUSUM mean-shift: prefix statistic kept SCALED-INTEGER
    // (CP = cnt·prefix − i·total) because cumulative DOUBLE window sums
    // are not summation-order-robust across engines; one division at the
    // end, σ₀ from the exact-integer moment sums
    "events_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(n) AS BIGINT) AS stot,
        |    sum(CAST(n AS DOUBLE)) AS s1,
        |    sum(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS s2
        |  FROM daily GROUP BY 1
        |), g AS (
        |  SELECT d.event_type, d.day, d.n, s.cnt, s.stot, s.s1, s.s2,
        |    CAST(sum(d.n) OVER wc AS BIGINT) AS pref,
        |    CAST(row_number() OVER wo AS BIGINT) AS i
        |  FROM daily d JOIN stats s USING (event_type)
        |  WINDOW wc AS (PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wo AS (PARTITION BY d.event_type ORDER BY d.day)
        |), cpx AS (
        |  SELECT *, cnt * pref - i * stot AS cp FROM g
        |), f AS (
        |  SELECT *, min(cp) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpmin
        |  FROM cpx
        |)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
        |  round(CAST(cp - cpmin AS DOUBLE) / cnt, 4) AS cusum,
        |  round(sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 4) AS sd0,
        |  CAST(cp - cpmin AS DOUBLE) / cnt
        |    > 4.0 * sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)) AS is_shift
        |FROM f WHERE cnt > 1
        |ORDER BY event_type, day""".stripMargin,

    // PMI co-occurrence over distinct user-day type sets — integer counts
    // into identical ln-of-ratio expressions on both engines
    "events_cooccurrence" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events
        |), na AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_single
        |  FROM ud GROUP BY 1
        |), nn AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn
        |  FROM (SELECT DISTINCT user_id, day FROM ud)
        |), pairs AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM ud x JOIN ud y ON x.user_id = y.user_id AND x.day = y.day
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |)
        |SELECT p.type_a, p.type_b, p.n_ab, a.n_single AS n_a, b.n_single AS n_b,
        |  round(ln(CAST(p.n_ab AS DOUBLE) * nn.nn
        |    / (CAST(a.n_single AS DOUBLE) * b.n_single)), 4) AS pmi,
        |  round(ln(CAST(p.n_ab AS DOUBLE) * nn.nn
        |      / (CAST(a.n_single AS DOUBLE) * b.n_single))
        |    / -ln(CAST(p.n_ab AS DOUBLE) / nn.nn), 4) AS npmi
        |FROM pairs p
        |JOIN na a ON p.type_a = a.event_type
        |JOIN na b ON p.type_b = b.event_type
        |CROSS JOIN nn
        |ORDER BY type_a, type_b""".stripMargin,

    // cohort = each user's first-activity date; day offsets counted with
    // DISTINCT users (DATE - DATE is BIGINT in DuckDB, Spark datediff is
    // INT — cast to match)
    "events_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
        |), c AS (
        |  SELECT user_id, min(d) AS c FROM e GROUP BY user_id
        |)
        |SELECT strftime(c.c, '%Y-%m-%d') AS cohort_date,
        |  CAST(e.d - c.c AS INTEGER) AS day_diff,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN c USING (user_id)
        |GROUP BY c.c, e.d - c.c
        |ORDER BY cohort_date, day_diff""".stripMargin,

    // bit-exact replay of the Morton interleave (low 10 bits of each key)
    "layout_zorder" -> {
      def bit(src: String, i: Int, pos: Int) = s"((($src >> $i) & 1) << $pos)"
      val chain = (0 until 10)
        .flatMap(i => Seq(bit("l_partkey", i, 2 * i), bit("l_suppkey", i, 2 * i + 1)))
        .mkString(" | ")
      s"""SELECT l_orderkey, l_linenumber, CAST($chain AS BIGINT) AS z
         |FROM lineitem WHERE l_orderkey < 400
         |ORDER BY z, l_orderkey, l_linenumber""".stripMargin
    },

    // manifest audit replay: the store partitions by day with exactly one
    // file per day, so partition-grain stats ARE a GROUP BY day over the
    // source, and n_files asserts the layout invariant as a literal
    "layout_manifest" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS p_date,
        |  CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows,
        |  min(event_id) AS min_event_id, max(event_id) AS max_event_id,
        |  min(user_id) AS min_user_id, max(user_id) AS max_user_id,
        |  epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us
        |FROM events GROUP BY 1 ORDER BY p_date""".stripMargin,

    // pruned-scan replay: the manifest-driven read must equal the plain
    // WHERE over the source table — file skipping is an access-path
    // optimization, never a semantics change
    "layout_pruned_scan" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events WHERE event_id BETWEEN 100 AND 299
        |ORDER BY event_id""".stripMargin,

    // z-order pruned read: same access-path-only guarantee over the
    // two-dimensionally clustered store
    // bucketed-join layout demo: result must equal the plain join+agg
    // (bucketing changes the PLAN, never the answer)
    "layout_bucketed_join" ->
      """SELECT o.o_orderpriority,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1
        |ORDER BY o.o_orderpriority""".stripMargin,

    "layout_zorder_pruned" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events WHERE user_id BETWEEN 10 AND 19
        |ORDER BY event_id""".stripMargin,

    // TWAP: exact integer µs intervals from the per-(type, day) lead,
    // value·w exactly 2-dp decimal (2-dp value × integer weight), both
    // quotients Class D at round 4
    "events_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value,
        |    strftime(ts, '%Y-%m-%d') AS day, epoch_us(ts) AS us
        |  FROM events
        |), iv AS (
        |  SELECT event_type, day, value,
        |    lead(us) OVER (PARTITION BY event_type, day
        |      ORDER BY us, event_id) - us AS w_us
        |  FROM e
        |)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(w_us) AS BIGINT) AS total_us,
        |  round(CAST(sum(CAST(round(value * w_us, 2) AS DECIMAL(38,2))) AS DOUBLE)
        |    / CAST(sum(w_us) AS BIGINT), 4) AS twap,
        |  round(CAST(sum(CAST(round(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
        |    / count(*), 4) AS plain_mean
        |FROM iv WHERE w_us IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY event_type, day""".stripMargin,

    // winsorization: interpolated fences (the agg_percentiles definition),
    // clip comparisons on engine-identical doubles, decimal-grid sums
    "events_winsorize" ->
      """WITH f AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |    quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_type, f.n_rows, round(f.lo, 4) AS lo, round(f.hi, 4) AS hi,
        |  CAST(sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  round(CAST(sum(CAST(round(least(greatest(e.value, f.lo), f.hi), 6)
        |    AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS winsorized_mean
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY e.event_type""".stripMargin,

    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // bounded-error gates for the sketch aggregations: the oracle asserts
    // the EXACT side of each row and literal `true` for every `*_ok`
    // flag, so a Spark sketch estimate outside its documented envelope
    // breaks the hash — the sketch VALUES themselves never enter the hash
    // (engine-specific internals)
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  true AS parts_ok, true AS orders_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_approx_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
        |  true AS p50_ok, true AS p90_ok,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // sketch-ONLY serving twins (r11 ask #1): the sketch itself is
    // deterministic (portable md5-prefix hash / integer histogram), so
    // the oracle REBUILDS it and the estimates hash-compare exactly —
    // the countMin discipline, no exact twin anywhere in either plan.
    // HLL arithmetic mirrored from Queries.aggApproxDistinctSketch:
    // p=10 → m=1024 registers over the 60-bit hash, rank via
    // length(bin(w)), harmonic sum as the exact integer Σ 2^(51−M),
    // α_m·m²·2^51 = 0.7213/(1+1.079/1024)·1048576·2251799813685248,
    // linear counting below 2.5·m = 2560.
    "agg_approx_distinct_sketch" ->
      """WITH src AS (
        |  SELECT l_returnflag, 'p' AS metric,
        |    ('0x' || substring(md5('hll:' || CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'o',
        |    ('0x' || substring(md5('hll:' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
        |  FROM lineitem
        |), mx AS (
        |  SELECT l_returnflag, metric, h % 1024 AS j,
        |    max(CASE WHEN h // 1024 = 0 THEN 51
        |             ELSE 51 - length(bin(h // 1024)) END) AS mreg
        |  FROM src GROUP BY 1, 2, 3
        |), regs AS (
        |  SELECT f.l_returnflag, f.metric, g.j
        |  FROM (SELECT DISTINCT l_returnflag, metric FROM src) f,
        |    UNNEST(generate_series(0, 1023)) AS g(j)
        |), reg AS (
        |  SELECT r.l_returnflag, r.metric, coalesce(mx.mreg, 0) AS mreg
        |  FROM regs r LEFT JOIN mx
        |    ON r.l_returnflag = mx.l_returnflag AND r.metric = mx.metric AND r.j = mx.j
        |), agg AS (
        |  SELECT l_returnflag, metric,
        |    CAST(sum(CAST(2 ** (51 - mreg) AS BIGINT)) AS BIGINT) AS z,
        |    CAST(sum(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
        |  FROM reg GROUP BY 1, 2
        |), est AS (
        |  SELECT l_returnflag, metric,
        |    CASE WHEN 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 * 2251799813685248.0
        |              / CAST(z AS DOUBLE) <= 2560.0 AND v > 0
        |         THEN 1024.0 * ln(1024.0 / CAST(v AS DOUBLE))
        |         ELSE 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 * 2251799813685248.0
        |              / CAST(z AS DOUBLE) END AS e
        |  FROM agg
        |)
        |SELECT l_returnflag,
        |  round(max(CASE WHEN metric = 'p' THEN e END), 4) AS est_parts,
        |  round(max(CASE WHEN metric = 'o' THEN e END), 4) AS est_orders
        |FROM est GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // fixed-width-histogram percentile replay (bucket = ⌊price/100⌋,
    // integer rank targets ⌈p·n⌉ via div, linear interpolation inside
    // the picked bucket — arithmetic order mirrored from
    // Queries.aggApproxPercentilesSketch)
    "agg_approx_percentiles_sketch" ->
      """WITH cnt AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT l_returnflag, bucket, c,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS BIGINT) AS cm
        |  FROM cnt
        |), tgt AS (
        |  SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
        |    (CAST(sum(c) AS BIGINT) + 1) // 2 AS k50,
        |    (9 * CAST(sum(c) AS BIGINT) + 9) // 10 AS k90
        |  FROM cnt GROUP BY 1
        |), p50 AS (
        |  SELECT c.l_returnflag,
        |    min_by(c.bucket * 100.0 + 100.0 *
        |      (CAST(t.k50 - (c.cm - c.c) AS DOUBLE) / c.c), c.bucket) AS est
        |  FROM cum c JOIN tgt t ON c.l_returnflag = t.l_returnflag AND c.cm >= t.k50
        |  GROUP BY 1
        |), p90 AS (
        |  SELECT c.l_returnflag,
        |    min_by(c.bucket * 100.0 + 100.0 *
        |      (CAST(t.k90 - (c.cm - c.c) AS DOUBLE) / c.c), c.bucket) AS est
        |  FROM cum c JOIN tgt t ON c.l_returnflag = t.l_returnflag AND c.cm >= t.k90
        |  GROUP BY 1
        |)
        |SELECT t.l_returnflag, round(p50.est, 4) AS p50_est,
        |  round(p90.est, 4) AS p90_est, t.n AS n_rows
        |FROM tgt t JOIN p50 ON t.l_returnflag = p50.l_returnflag
        |JOIN p90 ON t.l_returnflag = p90.l_returnflag
        |ORDER BY t.l_returnflag""".stripMargin,

    "interval_join" ->
      """SELECT p.event_id AS p_id, e.event_id AS e_id, p.user_id,
        |  epoch_us(e.ts) - epoch_us(p.ts) AS delta_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 3600000000
        |ORDER BY p_id, e_id""".stripMargin,

    // salted join must be RESULT-identical to the plain join it replaces
    "salted_join" ->
      """SELECT event_id, user_id, user_id % 3 AS segment
        |FROM events ORDER BY event_id""".stripMargin,

    "sim_quantize_int8" ->
      """WITH expl AS (
        |  SELECT vec_id, CAST(v AS DOUBLE) AS v
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
        |), scaled AS (
        |  SELECT vec_id, v,
        |    127.0 / greatest(max(abs(v)) OVER (PARTITION BY vec_id), 1e-12) AS scale
        |  FROM expl
        |), q AS (
        |  SELECT vec_id, scale, CAST(round(v * scale) AS INT) AS q FROM scaled
        |)
        |SELECT vec_id, round(max(scale), 6) AS scale,
        |  CAST(sum(q) AS BIGINT) AS q_sum,
        |  CAST(min(q) AS INT) AS q_min, CAST(max(q) AS INT) AS q_max,
        |  count(*) AS n_dims
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "array_stats" ->
      """SELECT vec_id, count(*) AS n_dims,
        |  round(sum(CAST(v AS DOUBLE)), 6) AS sum_v,
        |  round(min(CAST(v AS DOUBLE)), 6) AS min_v,
        |  round(max(CAST(v AS DOUBLE)), 6) AS max_v
        |FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(38,2))) AS DOUBLE), 2) AS sum_base_price,
        |  CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  (CAST(((CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(38,2))) * 100 AS BIGINT) * 2 * 10000 + (count(*) * 100)) // (2 * ((count(*) * 100)))) AS DOUBLE) / 10000) AS avg_price,
        |  (CAST(((CAST(sum(CAST(round(l_discount, 2) AS DECIMAL(38,2))) * 100 AS BIGINT) * 2 * 10000 + (count(*) * 100)) // (2 * ((count(*) * 100)))) AS DOUBLE) / 10000) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_odate,
        |  o.o_orderpriority,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '2000-01-01'
        |GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    // the filter form: surviving rows themselves (min doc_id per text)
    "dedup_exact_survivors" ->
      """SELECT d.* FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
        |  USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE) /
        |    greatest(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 4)
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_tokens_bpe" -> {
      val p = graft.ext.TextAnalysis.bpePattern.replace("'", "''")
      s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
    },

    "text_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, g.i - 1 AS pos, t[g.i] AS token
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |)
        |SELECT doc_id, CAST(pos // 32 AS BIGINT) AS chunk_id,
        |  string_agg(token, ' ' ORDER BY pos) AS chunk,
        |  count(*) AS n_tokens
        |FROM toks GROUP BY doc_id, pos // 32
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // overlapping chunks (32-token windows, stride 16): each token lands
    // in chunk ids ceil((pos-31)/16) .. floor(pos/16) — the same
    // double-floor/ceil arithmetic the Spark side computes
    "text_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, g.i - 1 AS pos, t[g.i] AS token
        |  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |)
        |SELECT doc_id, c.chunk_id,
        |  string_agg(token, ' ' ORDER BY pos) AS chunk,
        |  count(*) AS n_tokens
        |FROM toks, UNNEST(generate_series(
        |    GREATEST(CAST(ceil(CAST(pos - 31 AS DOUBLE) / 16) AS BIGINT), 0),
        |    CAST(floor(CAST(pos AS DOUBLE) / 16) AS BIGINT))) AS c(chunk_id)
        |GROUP BY doc_id, c.chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // sequence packing: the oracle uses ONE global window — tiny data is
    // fine there; the Spark side runs the scalable two-phase prefix sum
    // and must agree exactly
    "text_pack" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
        |  FROM sized
        |)
        |SELECT doc_id, n_tokens,
        |  CAST(off // 512 AS BIGINT) AS seq_id,
        |  CAST(off % 512 AS BIGINT) AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // normalization on the shared planted fixture (one source of truth):
    // DuckDB's nfc_normalize computes the SAME Unicode NFC independently
    // of java.text.Normalizer, then the identical Cf-strip / newline /
    // whitespace chain — two engines, one canonical form, byte-for-byte
    "text_normalize" -> {
      val rows = graft.ext.TextAnalysis.normalizeFixture.map { case (id, t) =>
        s"    (CAST($id AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n")
      s"""WITH fixture(doc_id, text) AS (VALUES
         |$rows
         |), norm AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(regexp_replace(
         |      nfc_normalize(text), '\\p{Cf}', '', 'g'),
         |      chr(13) || chr(10) || '?', chr(10), 'g'),
         |      '[ ' || chr(9) || ']+', ' ', 'g')) AS text_norm
         |  FROM fixture
         |)
         |SELECT doc_id, text_norm, CAST(length(text_norm) AS BIGINT) AS n_chars
         |FROM norm ORDER BY doc_id""".stripMargin
    },

    // PII redaction on the shared planted fixture: the VALUES rows and the
    // regex patterns both come from TextAnalysis (one source of truth), and
    // DuckDB executes the SAME staged substitution — count each kind on the
    // text as it exists at that stage, then replace globally — so the two
    // engines compute redaction independently and must agree byte-for-byte.
    // Patterns are RE2-safe by design (no lookaround/backreference), which
    // is exactly what makes this oracle possible.
    "text_pii" -> {
      val rows = graft.ext.TextAnalysis.piiFixture.map { case (id, t) =>
        s"    (CAST($id AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n")
      val pats = graft.ext.TextAnalysis.PiiPatterns.map(_._1.replace("'", "''"))
      val Seq(email, ip, ph1, ph2) = pats
      s"""WITH fixture(doc_id, text) AS (VALUES
        |$rows
        |), s1 AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
        |    regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1
        |  FROM fixture
        |), s2 AS (
        |  SELECT doc_id, n_emails,
        |    CAST(len(regexp_extract_all(t1, '$ip')) AS BIGINT) AS n_ips,
        |    regexp_replace(t1, '$ip', '<IP>', 'g') AS t2
        |  FROM s1
        |), s3 AS (
        |  SELECT doc_id, n_emails, n_ips,
        |    CAST(len(regexp_extract_all(t2, '$ph1')) AS BIGINT) AS ph1,
        |    regexp_replace(t2, '$ph1', '<PHONE>', 'g') AS t3
        |  FROM s2
        |)
        |SELECT doc_id, n_emails, n_ips,
        |  ph1 + CAST(len(regexp_extract_all(t3, '$ph2')) AS BIGINT) AS n_phones,
        |  regexp_replace(t3, '$ph2', '<PHONE>', 'g') AS redacted_text
        |FROM s3 ORDER BY doc_id""".stripMargin
    },

    "text_tfidf" ->
      """WITH tokens AS (
        |  SELECT doc_id, t[g.i] AS token
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY doc_id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, token FROM tokens) GROUP BY token
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |), ranked AS (
        |  SELECT doc_id, token, tf, df, tfidf, CAST(row_number() OVER
        |    (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, token, tf, df, tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Okapi BM25 top-5 per corpus-derived query (first 4 distinct tokens of
    // every 100th doc); same quantize-before-rank discipline as the engine
    "text_bm25" ->
      """WITH tokens AS (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 GROUP BY 1, 2))
        |  WHERE rk <= 4
        |), scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, doc_id, score, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, doc_id, score FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // retrieval eval: the BM25 replay scored against its own query
    // sources (self-retrieval ground truth); self_rank 0 = top-k miss;
    // the panel caps at 200 queries (doc_id < 100*200) — fixed-size
    // eval set, the engine's maxQueries discipline
    "retrieval_eval" ->
      """WITH tokens AS (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 AND doc_id < 20000
        |          GROUP BY 1, 2))
        |  WHERE rk <= 16
        |), scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, doc_id, score, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        |  FROM scored
        |), hits AS (
        |  SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10
        |), q AS (SELECT DISTINCT query_id FROM hits),
        |per AS (
        |  SELECT q.query_id, CAST(coalesce(h.rank, 0) AS INT) AS self_rank,
        |    round(CASE WHEN h.rank IS NOT NULL THEN 1.0 / h.rank ELSE 0.0 END, 4) AS rr
        |  FROM q LEFT JOIN hits h
        |    ON h.query_id = q.query_id AND h.doc_id = q.query_id
        |), summ AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |    (CAST(((sum(CAST(round((rr) * 1e4) AS BIGINT)) * 2 * 10000 + (count(*) * 10000)) // (2 * ((count(*) * 10000)))) AS DOUBLE) / 10000) AS mrr,
        |    (CAST(((sum(CASE WHEN self_rank = 1 THEN 1 ELSE 0 END) * 2 * 10000 + count(*)) // (2 * (count(*)))) AS DOUBLE) / 10000) AS recall_at_1,
        |    (CAST(((sum(CASE WHEN self_rank > 0 THEN 1 ELSE 0 END) * 2 * 10000 + count(*)) // (2 * (count(*)))) AS DOUBLE) / 10000) AS recall_at_k
        |  FROM per
        |)
        |SELECT p.query_id, p.self_rank, p.rr, s.n_queries, s.mrr,
        |  s.recall_at_1, s.recall_at_k
        |FROM per p CROSS JOIN summ s ORDER BY p.query_id""".stripMargin,

    // champion-tier retrieval eval (r14 judge ask #6 — the one
    // registered row that had no oracle): the champion prefix is
    // DETERMINISTIC given the corpus — per token, the top-128 postings
    // by length-normalized tf impact `tf(k1+1)/(tf+k1(1-b+b·dl/avgdl))`
    // with (impact DESC, doc_id) total tiebreak, exactly the
    // TopKAggregator order writeBm25Derived persists as tf_top — so the
    // oracle replays prefix construction + the prefix-restricted scorer
    // + the eval fold, the lsh/ivf replay-the-approximation discipline.
    // idf is a positive per-token constant, so impact order IS termW
    // order and the `champ` CTE needs no ln(). MATERIALIZED hints keep
    // DuckDB from re-inlining the corpus tokenization under each of the
    // five consumers (the 17-CPU-minute LR-GD precedent).
    "retrieval_eval_champions" ->
      """WITH tokens AS MATERIALIZED (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS MATERIALIZED (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS MATERIALIZED (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS MATERIALIZED (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |champ AS MATERIALIZED (
        |  SELECT token, doc_id FROM (
        |    SELECT tf.token, tf.doc_id, row_number() OVER (PARTITION BY tf.token
        |      ORDER BY (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) DESC,
        |        tf.doc_id) AS cr
        |    FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s)
        |  WHERE cr <= 128
        |), qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 AND doc_id < 20000
        |          GROUP BY 1, 2))
        |  WHERE rk <= 16
        |), scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN champ c ON tf.token = c.token AND tf.doc_id = c.doc_id
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, doc_id, score, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        |  FROM scored
        |), hits AS (
        |  SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10
        |), q AS (SELECT DISTINCT query_id FROM hits),
        |per AS (
        |  SELECT q.query_id, CAST(coalesce(h.rank, 0) AS INT) AS self_rank,
        |    round(CASE WHEN h.rank IS NOT NULL THEN 1.0 / h.rank ELSE 0.0 END, 4) AS rr
        |  FROM q LEFT JOIN hits h
        |    ON h.query_id = q.query_id AND h.doc_id = q.query_id
        |), summ AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |    (CAST(((sum(CAST(round((rr) * 1e4) AS BIGINT)) * 2 * 10000 + (count(*) * 10000)) // (2 * ((count(*) * 10000)))) AS DOUBLE) / 10000) AS mrr,
        |    (CAST(((sum(CASE WHEN self_rank = 1 THEN 1 ELSE 0 END) * 2 * 10000 + count(*)) // (2 * (count(*)))) AS DOUBLE) / 10000) AS recall_at_1,
        |    (CAST(((sum(CASE WHEN self_rank > 0 THEN 1 ELSE 0 END) * 2 * 10000 + count(*)) // (2 * (count(*)))) AS DOUBLE) / 10000) AS recall_at_k
        |  FROM per
        |)
        |SELECT p.query_id, p.self_rank, p.rr, s.n_queries, s.mrr,
        |  s.recall_at_1, s.recall_at_k
        |FROM per p CROSS JOIN summ s ORDER BY p.query_id""".stripMargin,

    // nDCG on the same panel: single-relevant-doc form 1/log2(1+rank)
    // (integer rank -> identical doubles), panel mean over the round-4
    // grid in exact decimal
    "retrieval_ndcg" ->
      """WITH tokens AS (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 AND doc_id < 20000
        |          GROUP BY 1, 2))
        |  WHERE rk <= 16
        |), scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT query_id, doc_id, score, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
        |  FROM scored
        |), hits AS (
        |  SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10
        |), q AS (SELECT DISTINCT query_id FROM hits),
        |per AS (
        |  SELECT q.query_id, CAST(coalesce(h.rank, 0) AS INT) AS self_rank,
        |    round(CASE WHEN h.rank IS NOT NULL
        |      THEN ln(2.0) / ln(1.0 + h.rank) ELSE 0.0 END, 4) AS ndcg
        |  FROM q LEFT JOIN hits h
        |    ON h.query_id = q.query_id AND h.doc_id = q.query_id
        |), summ AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |    (CAST(((sum(CAST(round((ndcg) * 1e4) AS BIGINT)) * 2 * 10000 + (count(*) * 10000)) // (2 * ((count(*) * 10000)))) AS DOUBLE) / 10000) AS mean_ndcg
        |  FROM per
        |)
        |SELECT p.query_id, p.self_rank, p.ndcg, s.n_queries, s.mean_ndcg
        |FROM per p CROSS JOIN summ s ORDER BY p.query_id""".stripMargin,

    // hybrid RRF: the BM25 replay (pool depth 20) full-outer-joined with a
    // dense cosine pool over the aligned embeddings table, fused with
    // 1/(60+rank) per tier (absent rank contributes 0, reported as 0);
    // fused score rounds to 6 BEFORE the final rank (tiebreak doc_id) —
    // identical quantize-before-rank order to the engine
    // fully index-served hybrid: the BM25 sparse chain fused with an
    // IVF-probed dense pool (the kmeans replay shared with
    // sim_topk_ivf_kmeans/_index; pool keeps SELF — self-retrieval is the
    // labeled answer — and reads only probed cells)
    "retrieval_hybrid_rrf_index" -> {
      s"""${kmeansAssign3Ctes(8)},
        |tokens AS (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 GROUP BY 1, 2))
        |  WHERE rk <= 4
        |), sscored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), stop AS (
        |  SELECT query_id, doc_id, rank_sparse FROM (
        |    SELECT query_id, doc_id, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank_sparse
        |    FROM sscored)
        |  WHERE rank_sparse <= 20
        |), dq AS (
        |  SELECT vec_id AS query_id, e AS q_emb FROM emb WHERE vec_id % 100 = 0
        |), probes AS (
        |  SELECT query_id, q_emb, cell FROM (
        |    SELECT q.query_id, q.q_emb, c.cell, row_number() OVER
        |      (PARTITION BY q.query_id ORDER BY
        |         list_cosine_similarity(q.q_emb, c.c) DESC, c.cell) AS c_rank
        |    FROM dq q, cent3 c)
        |  WHERE c_rank <= 2
        |), dscored AS (
        |  SELECT p.query_id, a.vec_id AS doc_id,
        |    round(list_cosine_similarity(p.q_emb, a.e), 6) AS cos
        |  FROM assign3 a JOIN probes p ON a.cell = p.cell
        |), dtop AS (
        |  SELECT query_id, doc_id, rank_dense FROM (
        |    SELECT query_id, doc_id, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT) AS rank_dense
        |    FROM dscored)
        |  WHERE rank_dense <= 20
        |), fused AS (
        |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
        |    coalesce(s.doc_id, d.doc_id) AS doc_id,
        |    s.rank_sparse, d.rank_dense,
        |    round(coalesce(1.0 / (60 + s.rank_sparse), 0)
        |      + coalesce(1.0 / (60 + d.rank_dense), 0), 6) AS rrf
        |  FROM stop s FULL OUTER JOIN dtop d
        |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id
        |), franked AS (
        |  SELECT query_id, doc_id, rrf, rank_sparse, rank_dense,
        |    CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT) AS rank
        |  FROM fused
        |)
        |SELECT query_id, rank, doc_id, rrf,
        |  CAST(coalesce(rank_sparse, 0) AS INT) AS rank_sparse,
        |  CAST(coalesce(rank_dense, 0) AS INT) AS rank_dense
        |FROM franked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },

    "retrieval_hybrid_rrf" ->
      """WITH tokens AS (
        |  SELECT doc_id, t[g.i] AS token, g.i AS pos
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
        |    UNNEST(generate_series(1, len(t))) AS g(i)
        |  WHERE t[g.i] <> ''
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |qsel AS (
        |  SELECT query_id, token FROM (
        |    SELECT query_id, token, row_number() OVER
        |      (PARTITION BY query_id ORDER BY first_pos) AS rk
        |    FROM (SELECT doc_id AS query_id, token, min(pos) AS first_pos
        |          FROM tokens WHERE doc_id % 100 = 0 GROUP BY 1, 2))
        |  WHERE rk <= 4
        |), sscored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    (CAST((sum(CAST(round((
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) * 1e6) AS BIGINT)) + 50) // 100 AS DOUBLE) / 1e4) AS score
        |  FROM qsel q
        |  JOIN tf ON q.token = tf.token
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  JOIN dfreq d ON tf.token = d.token
        |  CROSS JOIN stats s
        |  GROUP BY 1, 2
        |), stop AS (
        |  SELECT query_id, doc_id, rank_sparse FROM (
        |    SELECT query_id, doc_id, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank_sparse
        |    FROM sscored)
        |  WHERE rank_sparse <= 20
        |), dq AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id % 100 = 0
        |), dscored AS (
        |  SELECT dq.query_id, e.vec_id AS doc_id,
        |    round(list_cosine_similarity(
        |      CAST(dq.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, dq
        |), dtop AS (
        |  SELECT query_id, doc_id, rank_dense FROM (
        |    SELECT query_id, doc_id, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT) AS rank_dense
        |    FROM dscored)
        |  WHERE rank_dense <= 20
        |), fused AS (
        |  SELECT coalesce(s.query_id, d.query_id) AS query_id,
        |    coalesce(s.doc_id, d.doc_id) AS doc_id,
        |    s.rank_sparse, d.rank_dense,
        |    round(coalesce(1.0 / (60 + s.rank_sparse), 0)
        |      + coalesce(1.0 / (60 + d.rank_dense), 0), 6) AS rrf
        |  FROM stop s FULL OUTER JOIN dtop d
        |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id
        |), franked AS (
        |  SELECT query_id, doc_id, rrf, rank_sparse, rank_dense,
        |    CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT) AS rank
        |  FROM fused
        |)
        |SELECT query_id, rank, doc_id, rrf,
        |  CAST(coalesce(rank_sparse, 0) AS INT) AS rank_sparse,
        |  CAST(coalesce(rank_dense, 0) AS INT) AS rank_dense
        |FROM franked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // brute-force ground truth for the prefix-filtered edit-distance join —
    // the oracle-side cross join is the exactness check the engine's
    // q-gram blocking must reproduce
    "fuzzy_join" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
        |)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    // The full training-set pipeline: gopher gate -> near-dup drop (keep
    // the smaller doc_id of each verified pair) -> en downsample -> train
    // split -> pack. Every stage replays its already-green oracle form.
    "pipeline_training_set" ->
      s"""WITH $pipelineStageCtes, sized AS (
        |  SELECT d.doc_id,
        |    CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tokens
        |  FROM documents d JOIN tr ON d.doc_id = tr.doc_id
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
        |  FROM sized
        |)
        |SELECT doc_id, n_tokens,
        |  CAST(off // 512 AS BIGINT) AS seq_id,
        |  CAST(off % 512 AS BIGINT) AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // curation-funnel observability: per-stage doc/token totals over the
    // SAME stage chain the training-set oracle replays
    "pipeline_stage_report" ->
      s"""WITH $pipelineStageCtes, tok AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt
        |  FROM documents
        |), inp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_input FROM documents
        |), stages AS (
        |  SELECT 0 AS stage_order, 'input' AS stage,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_tokens FROM tok
        |  UNION ALL
        |  SELECT 1, 'quality_gate', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(nt), 0) AS BIGINT)
        |  FROM gopher JOIN tok USING (doc_id)
        |  UNION ALL
        |  SELECT 2, 'near_dedup', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(nt), 0) AS BIGINT)
        |  FROM surv JOIN tok USING (doc_id)
        |  UNION ALL
        |  SELECT 3, 'rebalance', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(nt), 0) AS BIGINT)
        |  FROM samp JOIN tok USING (doc_id)
        |  UNION ALL
        |  SELECT 4, 'train_split', CAST(count(*) AS BIGINT),
        |    CAST(coalesce(sum(nt), 0) AS BIGINT)
        |  FROM tr JOIN tok USING (doc_id)
        |)
        |SELECT CAST(stage_order AS INT) AS stage_order, stage, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / i.n_input, 4) AS retained
        |FROM stages CROSS JOIN inp i ORDER BY stage_order""".stripMargin,

    // Gopher-rule composition: quality scores + repetition scores joined,
    // three-way filter; column set = (doc_id, n_tokens, stopword_ratio,
    // rep_ratio)
    "corpus_gopher" -> {
      val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
      s"""WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
        |    round(CAST($occ AS DOUBLE) /
        |      greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 1), 4)
        |      AS stopword_ratio
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), r AS (
        |  SELECT doc_id,
        |    round(1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 4) AS rep_ratio
        |  FROM sh GROUP BY doc_id
        |)
        |SELECT q.doc_id, q.n_tokens, q.stopword_ratio, r.rep_ratio
        |FROM q JOIN r USING (doc_id)
        |WHERE q.n_tokens >= 30 AND q.stopword_ratio >= 0.01 AND r.rep_ratio <= 0.6
        |ORDER BY q.doc_id""".stripMargin
    },

    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct,
        |  round(1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 4) AS rep_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), probe AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0
        |)
        |SELECT s.doc_id, count(*) AS shared_shingles
        |FROM sh s JOIN probe p ON s.sh = p.sh
        |WHERE s.doc_id % 50 <> 0
        |GROUP BY s.doc_id HAVING count(*) >= 5
        |ORDER BY s.doc_id""".stripMargin,

    // fractional overlap decontamination: shared distinct shingles
    // normalized by the doc's own distinct-shingle total, round-4 grid,
    // threshold applied to the rounded value in both engines
    "dedup_contamination_frac" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), probe AS (
        |  SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0
        |), tot AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS total_shingles
        |  FROM sh WHERE doc_id % 50 <> 0 GROUP BY doc_id
        |), shr AS (
        |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS shared_shingles
        |  FROM sh s JOIN probe p ON s.sh = p.sh
        |  WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id
        |)
        |SELECT t.doc_id, shr.shared_shingles, t.total_shingles,
        |  round(CAST(shr.shared_shingles AS DOUBLE) / t.total_shingles, 4)
        |    AS overlap_frac
        |FROM shr JOIN tot t USING (doc_id)
        |WHERE round(CAST(shr.shared_shingles AS DOUBLE) / t.total_shingles, 4) >= 0.1
        |ORDER BY t.doc_id""".stripMargin,

    // CCNet head/middle/tail bucketing: the text_perplexity LM verbatim,
    // per-language tercile cuts via quantile_cont over the SAME round-4
    // ppl values Spark's exact percentile sees, boundary ties on <=
    "text_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), uni AS (
        |  SELECT unnest(t) AS token FROM toks
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM uni
        |), bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
        |  WHERE len(t) >= 2
        |), bgdoc AS (
        |  SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS mult FROM bg GROUP BY doc_id, sh
        |), c2 AS (
        |  SELECT sh, CAST(sum(mult) AS BIGINT) AS n2 FROM bgdoc GROUP BY sh
        |), ctx AS (
        |  SELECT w1, CAST(sum(n2) AS BIGINT) AS n1
        |  FROM (SELECT string_split(sh, ' ')[1] AS w1, n2 FROM c2) GROUP BY w1
        |), scored AS (
        |  SELECT b.doc_id, b.mult,
        |    -ln((CAST(c2.n2 AS DOUBLE) + 0.5) / (CAST(ctx.n1 AS DOUBLE) + 0.5 * vocab.v)) AS logp
        |  FROM bgdoc b JOIN c2 USING (sh)
        |    JOIN ctx ON string_split(b.sh, ' ')[1] = ctx.w1, vocab
        |), ppl AS (
        |  SELECT doc_id,
        |    round(exp(sum(CAST(mult AS DOUBLE) * logp) / CAST(sum(mult) AS DOUBLE)), 4) AS ppl
        |  FROM scored GROUP BY doc_id
        |), lng AS (
        |  SELECT d.doc_id, d.lang, p.ppl FROM documents d JOIN ppl p USING (doc_id)
        |), cuts AS (
        |  SELECT lang, quantile_cont(ppl, 1.0/3) AS t1, quantile_cont(ppl, 2.0/3) AS t2
        |  FROM lng GROUP BY lang
        |)
        |SELECT l.doc_id, l.lang, l.ppl,
        |  CASE WHEN l.ppl <= c.t1 THEN 'head'
        |       WHEN l.ppl <= c.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM lng l JOIN cuts c USING (lang)
        |ORDER BY l.doc_id""".stripMargin,

    // URL canonicalization: the same regex chain as UrlCuration
    // (fragment -> scheme/host lowercase -> tracking-param strip ->
    // ?/& residue -> trailing slash); pure string ops, directly replayable
    "url_canonicalize" -> ("WITH " + urlCtes + "," +
      """ c AS (
        |  SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') AS nofrag FROM u
        |), p AS (
        |  SELECT doc_id, url,
        |    regexp_extract(nofrag, '^([^:/?#]+)://', 1) AS scheme,
        |    regexp_extract(nofrag, '^[^:/?#]+://([^/?#]*)', 1) AS host,
        |    regexp_extract(nofrag, '^[^:/?#]+://[^/?#]*(.*)$', 1) AS rest
        |  FROM c
        |), q AS (
        |  SELECT doc_id, url, scheme, host,
        |    regexp_replace(regexp_replace(regexp_replace(rest,
        |      '(utm_[^&=]*|fbclid|gclid|ref)=[^&]*&?', '', 'g'),
        |      '\?&', '?', 'g'), '[?&]+$', '', 'g') AS cleaned
        |  FROM p
        |)
        |SELECT doc_id, url,
        |  lower(scheme) || '://' || lower(host) ||
        |    regexp_replace(cleaned, '/$', '', 'g') AS canonical_url,
        |  regexp_replace(regexp_replace(lower(host), '^www\.', ''),
        |    ':[0-9]+$', '') AS domain
        |FROM q ORDER BY doc_id""".stripMargin),

    // per-domain cap ~5 via the shared portable-hash 10000-bucket keep:
    // thr = min(10000, round(1e4 * cap / n_domain)), bucket < thr
    // blocklist replay: the suffix chain down to two labels equi-joined
    // against the VALUES blocklist; survivors = anti-join on doc_id
    "url_blocklist" -> ("WITH " + urlCtes + "," +
      """ parts AS (
        |  SELECT doc_id, domain, string_split(domain, '.') AS p FROM dom
        |), sfx AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(p, g.i, len(p)), '.') AS sfx
        |  FROM parts, UNNEST(generate_series(1, greatest(len(p) - 1, 1))) AS g(i)
        |), blocked(bdom) AS (
        |  VALUES ('src3.com'), ('src7.org'), ('cdn.src5.com')
        |), hit AS (
        |  SELECT DISTINCT doc_id FROM sfx JOIN blocked ON sfx.sfx = blocked.bdom
        |)
        |SELECT d.doc_id, d.domain FROM dom d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM hit)
        |ORDER BY d.doc_id""".stripMargin),

    "domain_caps" -> ("WITH " + urlCtes + "," +
      """ cnt AS (
        |  SELECT domain, CAST(count(*) AS BIGINT) AS n FROM dom GROUP BY domain
        |), thr AS (
        |  SELECT domain,
        |    least(10000, CAST(round(10000.0 * 5 / n) AS BIGINT)) AS thr
        |  FROM cnt
        |)
        |SELECT d.doc_id, d.domain,
        |  ('0x' || substring(md5('domcap:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bucket
        |FROM dom d JOIN thr USING (domain)
        |WHERE ('0x' || substring(md5('domcap:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < thr
        |ORDER BY d.doc_id""".stripMargin),

    // first-K-per-domain cap: rank window in ascending doc_id, keep <= 5
    "domain_caps_firstk" -> ("WITH " + urlCtes + """
        |SELECT doc_id, domain, lang FROM (
        |  SELECT doc_id, domain, lang,
        |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        |  FROM dom)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin),

    // mixture report: exact-integer counts; avg/share are single IEEE
    // divisions of exact integers so round(.,2)/round(.,4) replay exactly
    "domain_mix" -> ("WITH " + urlCtes + "," +
      """ t AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM dom
        |)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  round(avg(length(text)), 2) AS avg_chars,
        |  round(CAST(count(*) AS DOUBLE) / t.n_total, 4) AS share
        |FROM dom, t GROUP BY domain, t.n_total
        |ORDER BY domain""".stripMargin),

    // line-level boilerplate: planted nav/footer/promo replayed verbatim,
    // per-(domain, line) distinct-doc frequency, threshold 4, anti-join
    // removal, ordinal re-assembly (engine joins on the portable 60-bit
    // line hash — collision-free at these scales, Dedup 2^60 argument)
    "text_boilerplate" -> ("WITH " + urlCtes + "," + boilerCtes +
      """, tot AS (
        |  SELECT doc_id, domain, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM ln GROUP BY 1, 2
        |), kept AS (
        |  SELECT l.doc_id, l.domain, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(l.line, chr(10) ORDER BY l.i) AS clean_text
        |  FROM ln l LEFT JOIN dropset dr
        |    ON l.domain = dr.domain AND l.line = dr.line
        |  WHERE dr.line IS NULL
        |  GROUP BY 1, 2
        |)
        |SELECT t.doc_id, t.domain, t.n_lines,
        |  t.n_lines - COALESCE(k.n_kept, 0) AS n_dropped,
        |  COALESCE(k.clean_text, '') AS clean_text
        |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id AND t.domain = k.domain
        |ORDER BY t.doc_id""".stripMargin),

    "text_boilerplate_report" -> ("WITH " + urlCtes + "," + boilerCtes +
      """
        |SELECT domain, line, df FROM dfreq WHERE df >= 4
        |ORDER BY domain, line""".stripMargin),

    // stratified sampling: same salted hash buckets, same per-stratum
    // thresholds (en 5000/10000, de 2500/10000, others kept whole)
    "text_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |  < (CASE WHEN lang = 'de' THEN 2500 WHEN lang = 'en' THEN 5000 ELSE 10000 END)
        |ORDER BY doc_id""".stripMargin,

    // temperature rebalancing, alpha = 0.5: threshold = round(1e4 *
    // sqrt(n_min / n_lang)) — division and sqrt are IEEE-correctly-
    // rounded in both engines, so the thresholds replay bit-identically
    // (pow would not); the hash gate is the shared portable-hash bucket
    "text_sample_temperature" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
        |), mn AS (
        |  SELECT min(n) AS n_min FROM c
        |), thr AS (
        |  SELECT lang,
        |    CAST(round(CAST(10000 AS DOUBLE) *
        |      sqrt(CAST(n_min AS DOUBLE) / n)) AS BIGINT) AS thr
        |  FROM c, mn
        |)
        |SELECT d.doc_id, d.lang, d.source FROM documents d JOIN thr USING (lang)
        |WHERE ('0x' || substring(md5('tsample:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |  < thr
        |ORDER BY d.doc_id""".stripMargin,

    // domain mixture: N = min_d floor(avail_d / w_d), per-domain need =
    // round(w_d * N), threshold = round(1e4 * need / avail). Weights are
    // binary fractions CAST AS DOUBLE so every intermediate is the same
    // IEEE double Spark computes (DuckDB decimal literals would divide
    // exactly and could round differently).
    "text_mix_domains" -> {
      val w = "CASE lang WHEN 'de' THEN CAST(0.25 AS DOUBLE) WHEN 'en' THEN CAST(0.5 AS DOUBLE) " +
        "WHEN 'es' THEN CAST(0.125 AS DOUBLE) WHEN 'fr' THEN CAST(0.125 AS DOUBLE) END"
      s"""WITH avail AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS avail FROM documents
         |  WHERE lang IN ('de', 'en', 'es', 'fr') GROUP BY lang
         |), cap AS (
         |  SELECT min(CAST(floor(avail / ($w)) AS BIGINT)) AS n_total FROM avail
         |), thr AS (
         |  SELECT lang,
         |    CAST(round(CAST(10000 AS DOUBLE) *
         |      CAST(round(($w) * n_total) AS BIGINT) / avail) AS BIGINT) AS thr
         |  FROM avail, cap
         |)
         |SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.lang
         |WHERE ('0x' || substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < thr.thr
         |ORDER BY d.doc_id""".stripMargin
    },

    // epoch upsampling: need = round(w * budget), full epochs floor
    // (need / avail), remainder epoch hash-sampled at threshold
    // round(1e4 * rem / avail). Binary-fraction weights CAST AS DOUBLE
    // (decimal literals would round differently); '/' is double division
    // in both engines, so floor sees the identical IEEE value
    "text_upsample_epochs" -> {
      val w = "CASE lang WHEN 'de' THEN CAST(0.25 AS DOUBLE) WHEN 'en' THEN CAST(0.5 AS DOUBLE) " +
        "WHEN 'zh' THEN CAST(0.25 AS DOUBLE) END"
      s"""WITH avail AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS avail FROM documents
         |  WHERE lang IN ('de', 'en', 'zh') GROUP BY lang
         |), plan AS (
         |  SELECT lang, avail, CAST(round(($w) * 1000) AS BIGINT) AS need
         |  FROM avail
         |), thr AS (
         |  SELECT lang,
         |    CAST(floor(need / avail) AS BIGINT) AS full_epochs,
         |    CAST(round(CAST(10000 AS DOUBLE) *
         |      (need - CAST(floor(need / avail) AS BIGINT) * avail) / avail)
         |      AS BIGINT) AS thr
         |  FROM plan
         |), copies AS (
         |  SELECT d.doc_id, d.lang, t.full_epochs +
         |    (CASE WHEN ('0x' || substring(md5('epoch:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < t.thr
         |      THEN 1 ELSE 0 END) AS n_copies
         |  FROM documents d JOIN thr t ON d.lang = t.lang
         |)
         |SELECT doc_id, lang, CAST(g.i AS BIGINT) AS epoch
         |FROM copies, UNNEST(generate_series(0, n_copies - 1)) AS g(i)
         |WHERE n_copies > 0
         |ORDER BY doc_id, epoch""".stripMargin
    },

    // leakage-safe split: the shared recursive cluster CTEs provide the
    // dup-cluster representative; singletons key by their own id, then
    // the text_split bucket rule applies to the KEY
    "text_split_leakage" ->
      (dupClustersCtes + ",\n" +
      """clusters AS (
        |  SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node
        |), keyed AS (
        |  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS split_key
        |  FROM documents d LEFT JOIN clusters c USING (doc_id)
        |)
        |SELECT doc_id, split_key,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, split_key,
        |    ('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |  FROM keyed)
        |ORDER BY doc_id""".stripMargin),

    // deterministic hash split: same portable hash, same bucket rule
    "text_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // list_filter drops empty tokens (leading/trailing whitespace) to match
    // Spark's `token != ''` filter before shingling
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    // prefix filtering provably returns the SAME pairs as the quadratic
    // all-shared-shingle join (completeness lemma in Dedup.scaladoc) —
    // identical oracle
    "dedup_prefix_jaccard" -> ngramJaccardSql,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
        |  AND n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
        |  AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // supply cost proxy 0.6·retail with NO intermediate round: the
    // summand's true value is exactly 4-dp decimal, so the single
    // round(_, 4) snap is unambiguous in both engines (an inner
    // round(·, 2) on the double product is not — Spark's BigDecimal
    // rounding vs DuckDB's double-scaled rounding split at 1-ulp
    // boundaries; caught at sf0.1)
    "q9_product_profit" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |    - p.p_retailprice * 0.6 * l.l_quantity, 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS profit,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= DATE '1996-01-01'
        |  AND o.o_orderdate < DATE '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q14_promo_share" ->
      """WITH m AS (
        |  SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
        |    CAST(round(sum(CAST(round(CASE WHEN p.p_type = 'PROMO'
        |      THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END, 4)
        |      AS DECIMAL(38,4))), 2) AS DOUBLE) AS promo_revenue,
        |    CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |      AS DECIMAL(38,4))), 2) AS DOUBLE) AS total_revenue,
        |    count(*) AS n_lines
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= DATE '1996-01-01'
        |    AND l.l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1
        |)
        |SELECT ship_month, promo_revenue, total_revenue, n_lines,
        |  round(promo_revenue * 100.0 / total_revenue, 4) AS promo_share
        |FROM m ORDER BY ship_month""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT
        |  CAST(round(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """WITH m AS (
        |  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
        |    CAST(round(sum(CAST(round(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END, 4)
        |      AS DECIMAL(38,4))), 2) AS DOUBLE) AS nation_revenue,
        |    CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
        |      AS DECIMAL(38,4))), 2) AS DOUBLE) AS total_revenue,
        |    count(*) AS n_lines
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        |  WHERE o.o_orderdate >= DATE '1996-01-01'
        |    AND o.o_orderdate < DATE '1998-01-01'
        |  GROUP BY 1
        |)
        |SELECT o_year, nation_revenue, total_revenue, n_lines,
        |  round(nation_revenue / total_revenue, 4) AS mkt_share
        |FROM m ORDER BY o_year""".stripMargin,

    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= DATE '1996-01-01'
        |  AND o.o_orderdate < DATE '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c.c_custkey
        |LIMIT 20""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey
        |) GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // AS MATERIALIZED: DuckDB would otherwise re-inline the revenue CTE
    // into both the max scalar and the equality probe (r8 verify note)
    "q15_top_supplier" ->
      """WITH r AS MATERIALIZED (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM r)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q16_supplier_count" ->
      """SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""".stripMargin,

    "q17_small_quantity" ->
      """WITH j AS (
        |  SELECT l.l_quantity, l.l_extendedprice,
        |    avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
        |)
        |SELECT round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(38,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM j WHERE l_quantity < 0.5 * avg_qty""".stripMargin,

    "q18_large_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_odate, o.o_totalprice,
        |  b.sum_qty
        |FROM (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        |) b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_dominant_supplier" ->
      """WITH ps AS (
        |  SELECT l.l_partkey, l.l_suppkey, CAST(sum(l.l_quantity) AS BIGINT) AS sq
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        |  WHERE l.l_shipdate >= DATE '1996-01-01'
        |    AND l.l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts_dominated
        |  FROM (
        |    SELECT l_partkey, l_suppkey, sq,
        |      CAST(sum(sq) OVER (PARTITION BY l_partkey) AS BIGINT) AS tq
        |    FROM ps)
        |  WHERE sq * 2 > tq
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, n.n_name, d.n_parts_dominated
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN d ON s.s_suppkey = d.l_suppkey
        |ORDER BY s.s_suppkey""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH late AS MATERIALIZED (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
        |)
        |SELECT s.s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,

    "q22_dormant_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(38,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n.n_name,
        |  CAST(round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE c.c_nationkey = s.s_nationkey
        |  AND r.r_name = 'ASIA'
        |  AND o.o_orderdate >= DATE '1996-01-01'
        |  AND o.o_orderdate < DATE '1998-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n.n_name""".stripMargin,

    "dedup_pipeline" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.a, p.b,
        |  round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) AS jaccard
        |FROM pairs p
        |JOIN cnt ca ON p.a = ca.doc_id JOIN cnt cb ON p.b = cb.doc_id
        |WHERE round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) >= 0.8
        |ORDER BY p.a, p.b""".stripMargin,

    // connected components over the same quadratic ground-truth pairs:
    // WITH RECURSIVE propagates every label through the symmetric edge
    // list until fixpoint; min(reachable label) = min doc_id in the
    // component — exactly the min-label-propagation fixpoint Spark reaches
    "dedup_clusters" -> dupClustersSql,
    "dedup_clusters_dist" -> dupClustersSql,

    // quality-aware survivors: the recursive cluster ground truth plus
    // the corpus quality score; argmax per cluster on the round-4 grid,
    // ties to the larger doc_id (the engine's struct-max semantics)
    "dedup_best_survivors" ->
      (dupClustersCtes + ",\n" +
      """clusters AS (
        |  SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node
        |), qscored AS (
        |  SELECT doc_id,
        |    round(round(CAST(CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT) AS DOUBLE)
        |        / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 4)
        |      - round(CAST(length(regexp_replace(text, '[a-zA-Z\s]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1), 4), 4) AS score
        |  FROM documents
        |), members AS (
        |  SELECT c.cluster, c.doc_id, s.score,
        |    CAST(count(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS n_members,
        |    row_number() OVER (PARTITION BY c.cluster
        |      ORDER BY s.score DESC, c.doc_id DESC) AS rn
        |  FROM clusters c JOIN qscored s USING (doc_id)
        |)
        |SELECT cluster, n_members, doc_id AS keep_doc, score AS keep_score
        |FROM members WHERE rn = 1 ORDER BY cluster""".stripMargin),

    // one-row data card: every field from one per-doc frame; the quality
    // mean is over the same round-4 score grid as text_quality_filter
    "corpus_card" -> {
      val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
      s"""WITH per AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt,
        |    round(round(CAST($occ AS DOUBLE) /
        |        greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 1), 4)
        |      - round(CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1), 4), 4) AS q,
        |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 4) AS exact_dup_rate,
        |  round(avg(q), 4) AS mean_quality,
        |  round(quantile_cont(nt, 0.5), 4) AS p50_tokens,
        |  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4) AS en_share
        |FROM per""".stripMargin
    },

    "corpus_clean" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    round(CAST(CAST(len(regexp_extract_all(lower(text),
        |        '\b(the|a|of|and|to|in|is)\b')) AS BIGINT) AS DOUBLE)
        |      / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 4)
        |      AS stopword_ratio
        |  FROM documents
        |), kept AS (
        |  SELECT d.doc_id,
        |    md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS fp,
        |    d.lang, d.source, s.n_tokens, s.stopword_ratio
        |  FROM documents d JOIN scored s USING (doc_id)
        |  WHERE s.n_tokens >= 30 AND s.stopword_ratio >= 0.01
        |), survivors AS (
        |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY fp
        |)
        |SELECT k.doc_id, k.fp, k.lang, k.source, k.n_tokens, k.stopword_ratio
        |FROM kept k JOIN survivors USING (doc_id)
        |ORDER BY k.doc_id""".stripMargin,

    "dedup_embedding" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_cosine_similarity(
        |    CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin,

    // the bucketed production pipeline: 2 LSH tables (seeds 42, 43) of 4
    // fixed hyperplanes each, embedded as DOUBLE literals; candidates are
    // in-bucket pairs unioned across tables, then cosine-ranked
    "dedup_embedding_pipeline" ->
      s"""WITH $embLshCandCtes
        |SELECT c.a, c.b,
        |  round(list_cosine_similarity(
        |    CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |FROM cand c
        |JOIN embeddings ea ON c.a = ea.vec_id
        |JOIN embeddings eb ON c.b = eb.vec_id
        |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin,

    // bitext mining: the shared LSH candidate CTEs + cosine verify, then
    // the language join and cross-language + cosine gates
    "dedup_bitext_pairs" ->
      s"""WITH $embLshCandCtes,
        |scored AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |)
        |SELECT s.a, s.b, da.lang AS lang_a, db.lang AS lang_b, s.cos
        |FROM scored s
        |JOIN documents da ON s.a = da.doc_id
        |JOIN documents db ON s.b = db.doc_id
        |WHERE s.cos >= 0.4 AND da.lang <> db.lang
        |ORDER BY s.a, s.b""".stripMargin,

    // margin-normalized bitext: per-id mean of top-8 candidate cosines
    // (rank window, neighbor-id tiebreak, round 6), margin = cos over
    // the endpoint-mean, round 4
    "dedup_bitext_margin" ->
      s"""WITH $embLshCandCtes,
        |scored AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |), sym AS (
        |  SELECT a AS id, b AS nb, cos FROM scored
        |  UNION ALL SELECT b, a, cos FROM scored
        |), ranked AS (
        |  SELECT id, cos,
        |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, nb) AS rn
        |  FROM sym
        |), mu AS (
        |  SELECT id, floor(avg(cos) * 1e6 + 0.5) / 1e6 AS mu FROM ranked WHERE rn <= 8 GROUP BY id
        |), m AS (
        |  SELECT s.a, s.b, s.cos,
        |    floor(s.cos / ((ma.mu + mb.mu) / 2.0) * 1e4 + 0.5) / 1e4 AS margin
        |  FROM scored s JOIN mu ma ON s.a = ma.id JOIN mu mb ON s.b = mb.id
        |)
        |SELECT m.a, m.b, da.lang AS lang_a, db.lang AS lang_b, m.cos, m.margin
        |FROM m
        |JOIN documents da ON m.a = da.doc_id
        |JOIN documents db ON m.b = db.doc_id
        |WHERE da.lang <> db.lang AND m.margin >= 1.2 AND m.cos > 0
        |ORDER BY m.a, m.b""".stripMargin,

    // cross-modal caption↔image mining: the image side replays the
    // harness derivation (aligned every 3rd id, md5-seeded noise else),
    // both sides bucket through ONE shared-hyperplane LSH on the
    // offset-shifted id space, then the bitext ratio-margin machinery
    "multimodal_pairs" -> crossModalSql,

    // triangles: the pagerank edge construction, canonical undirected
    // edges, wedge self-join on the pivot + closing semi-join — exact
    // integer counting after the round-6 cosine edges
    "sim_triangles" ->
      s"""WITH $embLshCandCtes,
        |edges0 AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |), sym AS (
        |  SELECT a AS src, b AS dst, cos FROM edges0
        |  UNION ALL SELECT b, a, cos FROM edges0
        |), topk AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        |    FROM sym)
        |  WHERE rn <= 4
        |), e AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM topk
        |), adj AS (
        |  SELECT u AS p, v AS q FROM e UNION ALL SELECT v, u FROM e
        |), wedges AS (
        |  SELECT a1.p, a1.q AS x, a2.q AS y
        |  FROM adj a1 JOIN adj a2 ON a1.p = a2.p AND a1.q < a2.q
        |), tri AS (
        |  SELECT w.p, CAST(count(*) AS BIGINT) AS triangles
        |  FROM wedges w JOIN e ON w.x = e.u AND w.y = e.v
        |  GROUP BY w.p
        |), deg AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY p
        |)
        |SELECT d.p AS vec_id, d.degree,
        |  COALESCE(t.triangles, CAST(0 AS BIGINT)) AS triangles,
        |  CASE WHEN d.degree < 2 THEN CAST(0 AS DOUBLE)
        |    ELSE round(COALESCE(t.triangles, CAST(0 AS BIGINT)) * 2.0 /
        |      (d.degree * (d.degree - 1)), 6) END AS coeff
        |FROM deg d LEFT JOIN tri t ON d.p = t.p
        |ORDER BY vec_id""".stripMargin,

    // k-core: the triangles edge construction, then 3 unrolled peel
    // rounds — every round's edge set MATERIALIZED so DuckDB never
    // re-inlines the LSH chain (2^rounds-fold otherwise)
    "sim_kcore" -> {
      val peels = (1 to 3).map { r =>
        val prev = s"e${r - 1}"
        s"""d$r AS (
          |  SELECT p, CAST(count(*) AS BIGINT) AS deg FROM (
          |    SELECT u AS p FROM $prev UNION ALL SELECT v FROM $prev)
          |  GROUP BY 1
          |), e$r AS MATERIALIZED (
          |  SELECT e.u, e.v FROM $prev e
          |  JOIN d$r a ON e.u = a.p JOIN d$r b ON e.v = b.p
          |  WHERE a.deg >= 5 AND b.deg >= 5
          |)""".stripMargin
      }.mkString(", ")
      s"""WITH $embLshCandCtes,
        |edges0 AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |), sym AS (
        |  SELECT a AS src, b AS dst, cos FROM edges0
        |  UNION ALL SELECT b, a, cos FROM edges0
        |), topk AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        |    FROM sym)
        |  WHERE rn <= 4
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM topk
        |), $peels,
        |fd AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS p FROM e3 UNION ALL SELECT v FROM e3)
        |  GROUP BY 1
        |)
        |SELECT em.vec_id, COALESCE(fd.deg, CAST(0 AS BIGINT)) AS core_degree,
        |  COALESCE(fd.deg, CAST(0 AS BIGINT)) >= 5 AS in_core
        |FROM embeddings em LEFT JOIN fd ON em.vec_id = fd.p
        |ORDER BY em.vec_id""".stripMargin
    },

    // label-propagation communities: the triangles edge construction,
    // then 3 unrolled synchronous vote rounds (mode of neighbor labels,
    // ties -> smallest label, isolated nodes keep their own); adj
    // MATERIALIZED so the LSH chain runs once, not once per round
    "sim_communities" -> {
      val lpaRounds = (1 to 3).map { i =>
        val prev = s"l${i - 1}"
        s"""v$i AS (
          |  SELECT a.p, l.label, CAST(count(*) AS BIGINT) AS n
          |  FROM adj a JOIN $prev l ON a.q = l.vec_id
          |  GROUP BY 1, 2
          |), b$i AS (
          |  SELECT p, label FROM (
          |    SELECT p, label,
          |      row_number() OVER (PARTITION BY p ORDER BY n DESC, label) AS rn
          |    FROM v$i)
          |  WHERE rn = 1
          |), l$i AS MATERIALIZED (
          |  SELECT l.vec_id, COALESCE(b.label, l.label) AS label
          |  FROM $prev l LEFT JOIN b$i b ON l.vec_id = b.p
          |)""".stripMargin
      }.mkString(", ")
      s"""WITH $embLshCandCtes,
        |edges0 AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |), sym AS (
        |  SELECT a AS src, b AS dst, cos FROM edges0
        |  UNION ALL SELECT b, a, cos FROM edges0
        |), topk AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        |    FROM sym)
        |  WHERE rn <= 4
        |), e AS (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM topk
        |), adj AS MATERIALIZED (
        |  SELECT u AS p, v AS q FROM e UNION ALL SELECT v, u FROM e
        |), l0 AS (
        |  SELECT vec_id, vec_id AS label FROM embeddings
        |), $lpaRounds
        |SELECT vec_id, label AS community,
        |  CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
        |FROM l3
        |ORDER BY vec_id""".stripMargin
    },

    // PageRank over the LSH-bucketed kNN graph: shared candidate CTEs,
    // per-src top-4 by (rounded cos DESC, dst), then 3 damped power
    // steps with dangling redistribution — every per-step rank rounds
    // to 9 decimals, matching the engine's iteration discipline exactly
    "sim_pagerank" -> {
      val iterCtes = (1 to 3).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
          |  SELECT t.dst AS vec_id, sum(r.rank / o.outdeg) AS contrib
          |  FROM topk t JOIN $prev r ON t.src = r.vec_id
          |    JOIN outdeg o ON t.src = o.src
          |  GROUP BY t.dst
          |), d$i AS (
          |  SELECT COALESCE(round(sum(r.rank), 9), CAST(0 AS DOUBLE)) AS dm
          |  FROM $prev r LEFT JOIN outdeg o ON r.vec_id = o.src
          |  WHERE o.src IS NULL
          |), r$i AS (
          |  SELECT e.vec_id,
          |    round((1 - CAST(0.85 AS DOUBLE)) / nn.n + CAST(0.85 AS DOUBLE) *
          |      (COALESCE(c.contrib, CAST(0 AS DOUBLE)) + d.dm / nn.n), 9) AS rank
          |  FROM embeddings e LEFT JOIN c$i c ON e.vec_id = c.vec_id, d$i d, nn
          |)""".stripMargin
      }.mkString(", ")
      s"""WITH $embLshCandCtes, edges AS (
        |  SELECT c.a, c.b,
        |    round(list_cosine_similarity(
        |      CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ea ON c.a = ea.vec_id
        |  JOIN embeddings eb ON c.b = eb.vec_id
        |), sym AS (
        |  SELECT a AS src, b AS dst, cos FROM edges
        |  UNION ALL SELECT b, a, cos FROM edges
        |), topk AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
        |    FROM sym)
        |  WHERE rn <= 4
        |), outdeg AS (
        |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM topk GROUP BY src
        |), nn AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
        |), r0 AS (
        |  SELECT vec_id, CAST(1 AS DOUBLE) / nn.n AS rank FROM embeddings, nn
        |), $iterCtes
        |SELECT vec_id, round(rank, 6) AS rank FROM r3
        |ORDER BY vec_id""".stripMargin
    },

    // identical semantics via the bounded TopKAggregator — same oracle
    "sim_topk_agg" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // hard negatives: the brute-force scoring with the similarity band
    // applied BEFORE the rank (positives above the ceiling excluded,
    // easy negatives below the floor dropped)
    "sim_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), banded AS (
        |  SELECT * FROM scored WHERE cos >= 0.15 AND cos < 0.30
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM banded
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // matryoshka: identical replay with both sides sliced to the prefix
    // BEFORE the cosine — same slice-then-score order as the Spark side
    "sim_topk_matryoshka" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb[1:16] AS DOUBLE[]),
        |      CAST(e.embedding[1:16] AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // contrastive pairs: the bruteforce and hard-negative replays off one
    // scored CTE, role-labeled and unioned — (query_id, role, rank) is a
    // unique deterministic order on both engines
    "sim_contrastive_pairs" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), pos AS (
        |  SELECT query_id, vec_id, cos, rank, 'pos' AS role FROM (
        |    SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |    FROM scored)
        |  WHERE rank <= 3
        |), neg AS (
        |  SELECT query_id, vec_id, cos, rank, 'neg' AS role FROM (
        |    SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |    FROM scored WHERE cos >= 0.15 AND cos < 0.30)
        |  WHERE rank <= 10
        |)
        |SELECT * FROM (
        |  SELECT * FROM pos UNION ALL SELECT * FROM neg)
        |ORDER BY query_id, role, rank""".stripMargin,

    "text_quality" -> {
      val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
      s"""WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
        |    $occ AS n_stopwords,
        |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
        |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonspace,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, n_stopwords,
        |  round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio,
        |  round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4) AS non_alpha_ratio,
        |  round(CAST(n_nonspace AS DOUBLE) / greatest(n_tokens, 1), 4) AS mean_word_len
        |FROM base ORDER BY doc_id""".stripMargin
    },

    "text_langid" -> {
      val markers = Map(
        "de" -> Seq("der", "und", "die"),
        "en" -> Seq("the", "and", "of"),
        "es" -> Seq("el", "los", "y"),
        "fr" -> Seq("le", "la", "et"),
        "zh" -> Seq("之", "的", "了"))
      val langs = markers.keys.toSeq.sorted
      val scoreExprs = langs.map { l =>
        val terms = markers(l).map { w =>
          val tok = s" $w "
          s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$tok', ''))) / ${tok.length} AS BIGINT)"
        }.mkString(" + ")
        s"$terms AS score_$l"
      }.mkString(",\n    ")
      val m = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
      val pred = langs.map(l => s"WHEN score_$l = $m THEN '$l'").mkString("CASE ", " ", " END")
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |    $scoreExprs
        |  FROM documents
        |)
        |SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
        |  $pred AS pred_lang, lang AS labeled_lang
        |FROM scored ORDER BY doc_id""".stripMargin
    },

    // langid confusion: the langScores chain grouped onto the bounded
    // (labeled, predicted) grid; recall = quotient of exact integers
    "text_langid_confusion" -> {
      val markers = Map(
        "de" -> Seq("der", "und", "die"),
        "en" -> Seq("the", "and", "of"),
        "es" -> Seq("el", "los", "y"),
        "fr" -> Seq("le", "la", "et"),
        "zh" -> Seq("之", "的", "了"))
      val langs = markers.keys.toSeq.sorted
      val scoreExprs = langs.map { l =>
        val terms = markers(l).map { w =>
          val tok = s" $w "
          s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$tok', ''))) / ${tok.length} AS BIGINT)"
        }.mkString(" + ")
        s"$terms AS score_$l"
      }.mkString(",\n    ")
      val m = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
      val pred = langs.map(l => s"WHEN score_$l = $m THEN '$l'").mkString("CASE ", " ", " END")
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |    $scoreExprs
        |  FROM documents
        |), p AS (
        |  SELECT lang AS labeled_lang, $pred AS pred_lang FROM scored
        |), g AS (
        |  SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM p GROUP BY 1, 2
        |)
        |SELECT labeled_lang, pred_lang, n_docs,
        |  labeled_lang = pred_lang AS correct,
        |  round(CAST(n_docs AS DOUBLE) /
        |    CAST(sum(n_docs) OVER (PARTITION BY labeled_lang) AS BIGINT), 4) AS share
        |FROM g ORDER BY labeled_lang, pred_lang""".stripMargin
    },

    // JL sign projection: the ±1 matrix is data-independent, so both
    // engines carry it as LITERALS (the engine derives them from the
    // portable md5-prefix hash of 'jl:<j>:<d>' — same builder here);
    // each axis is one sequential dot product (the VecDot /
    // list_inner_product parity the cosine oracles pin), /4 exact dyadic
    "sim_jl_project" ->
      s"""WITH axes AS (
        |  SELECT * FROM (VALUES
        |$jlAxisRows
        |  ) AS t(j, signs)
        |)
        |SELECT e.vec_id, a.j,
        |  round(list_inner_product(CAST(e.embedding AS DOUBLE[]), a.signs) / 4.0, 6) AS y
        |FROM embeddings e CROSS JOIN axes a
        |ORDER BY e.vec_id, a.j""".stripMargin,

    // two-stage JL serving: reduced vectors rebuilt as ordered round-6
    // lists, cosine shortlist (same rank/tiebreak as the engine), exact
    // full-dimension re-rank of the shortlist only
    "sim_topk_jl" ->
      s"""WITH axes AS (
        |  SELECT * FROM (VALUES
        |$jlAxisRows
        |  ) AS t(j, signs)
        |), red AS (
        |  SELECT e.vec_id,
        |    list(round(list_inner_product(CAST(e.embedding AS DOUBLE[]), a.signs)
        |      / 4.0, 6) ORDER BY a.j) AS r
        |  FROM embeddings e CROSS JOIN axes a
        |  GROUP BY e.vec_id
        |), qs AS (
        |  SELECT vec_id AS query_id, r AS qr FROM red WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, r.vec_id,
        |    round(list_cosine_similarity(r.r, q.qr), 6) AS rcos
        |  FROM red r CROSS JOIN qs q
        |  WHERE r.vec_id <> q.query_id
        |), cand AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY rcos DESC, vec_id) AS rn
        |    FROM scored)
        |  WHERE rn <= 200
        |), rer AS (
        |  SELECT c.query_id, c.vec_id,
        |    round(list_cosine_similarity(CAST(ev.embedding AS DOUBLE[]),
        |      CAST(eq.embedding AS DOUBLE[])), 6) AS cos
        |  FROM cand c
        |  JOIN embeddings ev ON c.vec_id = ev.vec_id
        |  JOIN embeddings eq ON c.query_id = eq.vec_id
        |)
        |SELECT query_id, vec_id, cos, rn AS rank FROM (
        |  SELECT query_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM rer)
        |WHERE rn <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // MinHash + LSH banding over the portable md5-prefix hash: one base
    // hash per shingle, 32 affine views (a_i·h+b_i mod P), 8 bands × 4
    // rows expressed as 8 equi-joins — candidate generation and estimated
    // Jaccard replicated exactly
    // source-level vocabulary MinHash: same portable min-wise family,
    // word-set granularity, bounded |sources|² pair matrix
    "dedup_source_similarity" -> {
      val p = graft.ext.Dedup.MinhashP
      val sigCols = graft.ext.Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"min(($a * h + $b) % $p) AS mh_$i" }
        .mkString(",\n    ")
      val matches = (0 until 32)
        .map(i => s"(CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH words AS (
        |  SELECT source AS g,
        |    unnest(list_filter(string_split_regex(lower(text), '\\s+'),
        |      x -> x <> '')) AS word
        |  FROM documents
        |), hashed AS (
        |  SELECT g, ('0x' || substring(md5(word), 1, 15))::BIGINT % $p AS h
        |  FROM words
        |), sig AS (
        |  SELECT g,
        |    $sigCols
        |  FROM hashed GROUP BY g
        |)
        |SELECT sa.g AS a, sb.g AS b,
        |  round(($matches) / 32.0, 4) AS est_jaccard
        |FROM sig sa JOIN sig sb ON sa.g < sb.g
        |ORDER BY a, b""".stripMargin
    },

    "dedup_minhash" -> {
      val p = graft.ext.Dedup.MinhashP
      val sigCols = graft.ext.Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"min(($a * h + $b) % $p) AS mh_$i" }
        .mkString(",\n    ")
      val bandJoins = (0 until 8).map { bIdx =>
        val conds = (0 until 4).map(r => s"sa.mh_${bIdx * 4 + r} = sb.mh_${bIdx * 4 + r}")
          .mkString(" AND ")
        s"SELECT sa.doc_id AS a, sb.doc_id AS b FROM sig sa JOIN sig sb\n      ON $conds AND sa.doc_id < sb.doc_id"
      }.mkString("\n    UNION ALL\n    ")
      val matches = (0 until 32)
        .map(i => s"(CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), hashed AS (
        |  SELECT doc_id, ('0x' || substring(md5(sh), 1, 15))::BIGINT % $p AS h FROM sh
        |), sig AS (
        |  SELECT doc_id,
        |    $sigCols
        |  FROM hashed GROUP BY doc_id
        |), cand AS (
        |  SELECT DISTINCT a, b FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT c.a, c.b, round(($matches) / 32.0, 4) AS est_jaccard
        |FROM cand c JOIN sig sa ON c.a = sa.doc_id JOIN sig sb ON c.b = sb.doc_id
        |WHERE round(($matches) / 32.0, 4) >= 0.5
        |ORDER BY c.a, c.b""".stripMargin
    },

    // Incremental MinHash-index dedup: identical signature replay, but the
    // band joins pair the indexed side (doc_id%5!=0) against the incoming
    // batch (doc_id%5==0) — the oracle replays exactly what
    // dedupAgainstMinhashIndex computes over the persisted signatures
    "dedup_minhash_index" -> {
      val p = graft.ext.Dedup.MinhashP
      val sigCols = graft.ext.Dedup.minhashCoeffs(32).zipWithIndex
        .map { case ((a, b), i) => s"min(($a * h + $b) % $p) AS mh_$i" }
        .mkString(",\n    ")
      val bandJoins = (0 until 8).map { bIdx =>
        val conds = (0 until 4).map(r => s"sa.mh_${bIdx * 4 + r} = sb.mh_${bIdx * 4 + r}")
          .mkString(" AND ")
        s"SELECT sb.doc_id AS new_id, sa.doc_id AS dup_of FROM sig sa JOIN sig sb\n      ON $conds AND sa.doc_id % 5 <> 0 AND sb.doc_id % 5 = 0"
      }.mkString("\n    UNION ALL\n    ")
      val matches = (0 until 32)
        .map(i => s"(CASE WHEN sa.mh_$i = sb.mh_$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), hashed AS (
        |  SELECT doc_id, ('0x' || substring(md5(sh), 1, 15))::BIGINT % $p AS h FROM sh
        |), sig AS (
        |  SELECT doc_id,
        |    $sigCols
        |  FROM hashed GROUP BY doc_id
        |), cand AS (
        |  SELECT DISTINCT new_id, dup_of FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT c.new_id, c.dup_of, round(($matches) / 32.0, 4) AS est_jaccard
        |FROM cand c JOIN sig sb ON c.new_id = sb.doc_id JOIN sig sa ON c.dup_of = sa.doc_id
        |WHERE round(($matches) / 32.0, 4) >= 0.5
        |ORDER BY c.new_id, c.dup_of""".stripMargin
    },

    // SimHash over the portable hash: 64 per-bit sign sums, 4×16-bit band
    // equi-joins for candidates, bit_count(xor) Hamming verification
    "dedup_simhash" -> {
      val bitSums = (0 until 64)
        .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j")
        .mkString(",\n    ")
      val simExpr = (0 until 64)
        .map(j => s"(CASE WHEN b_$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)")
        .mkString("\n      + ")
      val bandJoins = (0 until 4).map { bIdx =>
        val sh = bIdx * 16
        s"SELECT sa.doc_id AS a, sb.doc_id AS b, sa.simhash AS sim_a, sb.simhash AS sim_b\n    FROM sim sa JOIN sim sb\n      ON ((sa.simhash >> $sh) & 65535) = ((sb.simhash >> $sh) & 65535) AND sa.doc_id < sb.doc_id"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH tok AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), hashed AS (
        |  SELECT doc_id, ('0x' || substring(md5(token), 1, 15))::BIGINT AS h FROM tok
        |), bits AS (
        |  SELECT doc_id,
        |    $bitSums
        |  FROM hashed GROUP BY doc_id
        |), sim AS (
        |  SELECT doc_id,
        |    $simExpr AS simhash
        |  FROM bits
        |), cand AS (
        |  SELECT DISTINCT a, b, sim_a, sim_b FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT a, b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
        |ORDER BY a, b""".stripMargin
    },

    // LSH bucket assignment: the fixed-seed hyperplanes are embedded as
    // DOUBLE literal arrays (Double.toString round-trips exactly), so the
    // oracle computes the same sign tests over the same planes
    "sim_lsh_buckets" -> {
      val planes = graft.ext.Similarity.hyperplanes(4, 64)
      val terms = planes.zipWithIndex.map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n    + ")
      s"""SELECT vec_id,
        |  CAST($terms AS BIGINT) AS bucket
        |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    // LSH top-k (since r15 multi-probe at registered defaults — r14 ask
    // #5: the single-bucket form measured recall 0.23 at sf0.1; 4
    // confidence-ordered probes measure 0.60): one shared replay with
    // the tuned _mp row, different (planes, probes) points
    "sim_topk_lsh" -> lshMultiProbeSql(numPlanes = 4, nProbes = 4),

    // Confidence-ordered multi-probe LSH (the tuned ANN path)
    "sim_topk_lsh_mp" -> lshMultiProbeSql(numPlanes = 6, nProbes = 8),

    // IVF over label cells: per-cell per-dimension mean centroids, probe
    // the 5 nearest of the 10 label cells by query-centroid cosine,
    // exact top-k within (nProbe = 5 since r15 — label cells are
    // geometry-free, see the registration note)
    "sim_topk_ivf" ->
      """WITH expl AS (
        |  SELECT label AS cell, g.i AS pos, embedding[g.i] AS v
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
        |), cent AS (
        |  SELECT cell, list(cv ORDER BY pos) AS centroid FROM (
        |    SELECT cell, pos, avg(CAST(v AS DOUBLE)) AS cv
        |    FROM expl GROUP BY cell, pos)
        |  GROUP BY cell
        |), q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id IN (0, 1, 2)
        |), probes AS (
        |  SELECT query_id, q_emb, cell FROM (
        |    SELECT q.query_id, q.q_emb, c.cell, row_number() OVER
        |      (PARTITION BY q.query_id ORDER BY list_cosine_similarity(
        |         CAST(q.q_emb AS DOUBLE[]), c.centroid) DESC, c.cell) AS c_rank
        |    FROM q, cent c)
        |  WHERE c_rank <= 5
        |), scored AS (
        |  SELECT p.query_id, e.vec_id, e.label AS cell,
        |    round(list_cosine_similarity(
        |      CAST(p.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |  FROM embeddings e JOIN probes p ON e.label = p.cell
        |  WHERE e.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cell, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, cell, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // SemDeDup: the shared Lloyd replay (kmeansAssign3Ctes) + the
    // within-cell pair scan verbatim — pairs exist only where the
    // clustering co-locates them, so the oracle gates the full
    // approximate algorithm (fit + cell scoping + cosine), not just
    // the pair arithmetic
    "dedup_semantic" ->
      s"""${kmeansAssign3Ctes(8)}
        |SELECT a.cell, a.vec_id AS a, b.vec_id AS b,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS cos
        |FROM assign3 a JOIN assign3 b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin,

    // k-means IVF: probing uses cent3 + assign3 from the shared Lloyd
    // replay (kmeansAssign3Ctes): the assignment that PRODUCED the final
    // centroids, exactly what ivfTopKKmeans reuses.
    "sim_topk_ivf_kmeans" -> {
      s"""${kmeansAssign3Ctes(8)},
        |q AS (
        |  SELECT vec_id AS query_id, e AS q_emb FROM emb WHERE vec_id IN (0, 1, 2)
        |), probes AS (
        |  SELECT query_id, q_emb, cell FROM (
        |    SELECT q.query_id, q.q_emb, c.cell, row_number() OVER
        |      (PARTITION BY q.query_id ORDER BY
        |         list_cosine_similarity(q.q_emb, c.c) DESC, c.cell) AS c_rank
        |    FROM q, cent3 c)
        |  WHERE c_rank <= 2
        |), scored AS (
        |  SELECT p.query_id, a.vec_id, a.cell,
        |    round(list_cosine_similarity(p.q_emb, a.e), 6) AS cos
        |  FROM assign3 a JOIN probes p ON a.cell = p.cell
        |  WHERE a.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cell, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, cell, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // cluster-balanced diversity sampling: shared Lloyd replay, one more
    // argmin against the FINAL centroids (keeping d2), per-cell
    // prototypicality rank capped at the quota
    "sim_cluster_sample" -> {
      def d2(e: String, c: String) =
        s"list_dot_product($e, $e) + list_dot_product($c, $c) - 2 * list_dot_product($e, $c)"
      s"""${kmeansAssign3Ctes(8)},
        |final_assign AS (
        |  SELECT vec_id, cell, d2 FROM (
        |    SELECT m.vec_id, c.cell, ${d2("m.e", "c.c")} AS d2,
        |      row_number() OVER
        |        (PARTITION BY m.vec_id ORDER BY ${d2("m.e", "c.c")}, c.cell) AS rn
        |    FROM emb m, cent3 c)
        |  WHERE rn = 1
        |), ranked AS (
        |  SELECT vec_id, cell, d2, CAST(row_number() OVER
        |    (PARTITION BY cell ORDER BY d2, vec_id) AS INT) AS rank
        |  FROM final_assign
        |)
        |SELECT vec_id, cell, round(d2, 6) AS d2, rank FROM ranked
        |WHERE rank <= 25 ORDER BY cell, rank""".stripMargin
    },

    // Product quantization: per-subspace unrolled Lloyd (2 iterations,
    // same init/rounding discipline as sim_topk_ivf_kmeans — 16 smallest
    // vec_ids' subvectors seed each codebook, means rounded to 9 decimals),
    // then asymmetric distance: sum over subspaces of dot(query subvector,
    // assigned codeword), cosine-normalized by the reconstruction norm.
    // Sums are written left-associated in subspace order to match Spark's
    // fixed-order reduce exactly. The ADC pass nominates a 50-candidate
    // shortlist per query; the reported top-10 is an EXACT cosine re-rank
    // of the shortlist (the PQ serving shape).
    "sim_topk_pq" -> pqReplaySql(shortlist = 50),

    // IVF-PQ: the coarse k-means tier (8 cells, 2 unrolled Lloyd
    // iterations over FULL vectors — g_* CTEs) prunes which vectors are
    // scored; the PQ tier (8 per-subspace unrolled Lloyds, identical to
    // sim_topk_pq) supplies the ADC arithmetic; exact cosine re-ranks the
    // 50-candidate shortlist. Probing reuses cent2+assign2 — the
    // assignment that produced the final coarse centroids, exactly what
    // ivfpqTopK reuses from kmeansFit.
    "sim_topk_ivfpq" -> {
      val m = 8; val ks = 16; val iters = 2; val subDim = 8
      val nCells = 8; val nProbe = 2; val shortlist = 50
      def d2(e: String, c: String) =
        s"list_dot_product($e, $e) + list_dot_product($c, $c) - 2 * list_dot_product($e, $c)"
      // coarse tier over full vectors
      def gAssign(i: Int, centSrc: String) =
        s"g_a$i AS (\n  SELECT vec_id, e, cell FROM (\n    SELECT v.vec_id, v.e, c.cell, row_number() OVER\n      (PARTITION BY v.vec_id ORDER BY ${d2("v.e", "c.c")}, c.cell) AS rn\n    FROM emb v, $centSrc c)\n  WHERE rn = 1\n)"
      def gCent(i: Int) =
        s"g_c$i AS (\n  SELECT cell, list(round(cv, 9) ORDER BY pos) AS c FROM (\n    SELECT cell, g.i AS pos, avg(e[g.i]) AS cv\n    FROM g_a$i, UNNEST(generate_series(1, len(e))) AS g(i)\n    GROUP BY cell, g.i)\n  GROUP BY cell\n)"
      val coarse = {
        val init =
          s"g_init AS (\n  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c\n  FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT $nCells)\n)"
        val lloyd = (1 to iters).map { i =>
          val src = if (i == 1) "g_init" else s"g_c${i - 1}"
          gAssign(i, src) + ",\n" + gCent(i)
        }.mkString(",\n")
        init + ",\n" + lloyd
      }
      // PQ tier per subspace (same shape as sim_topk_pq)
      def sub(s: Int) =
        s"sub$s AS (\n  SELECT vec_id, e[${s * subDim + 1}:${(s + 1) * subDim}] AS e FROM emb\n)"
      def init(s: Int) =
        s"init$s AS (\n  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c\n  FROM (SELECT vec_id, e FROM sub$s ORDER BY vec_id LIMIT $ks)\n)"
      def assign(s: Int, i: Int, centSrc: String) =
        s"a${s}_$i AS (\n  SELECT vec_id, e, cell FROM (\n    SELECT v.vec_id, v.e, c.cell, row_number() OVER\n      (PARTITION BY v.vec_id ORDER BY ${d2("v.e", "c.c")}, c.cell) AS rn\n    FROM sub$s v, $centSrc c)\n  WHERE rn = 1\n)"
      def cent(s: Int, i: Int) =
        s"c${s}_$i AS (\n  SELECT cell, list(round(cv, 9) ORDER BY pos) AS c FROM (\n    SELECT cell, g.i AS pos, avg(e[g.i]) AS cv\n    FROM a${s}_$i, UNNEST(generate_series(1, len(e))) AS g(i)\n    GROUP BY cell, g.i)\n  GROUP BY cell\n)"
      val perSub = (0 until m).map { s =>
        val lloyd = (1 to iters).map { i =>
          val src = if (i == 1) s"init$s" else s"c${s}_${i - 1}"
          assign(s, i, src) + ",\n" + cent(s, i)
        }.mkString(",\n")
        sub(s) + ",\n" + init(s) + ",\n" + lloyd
      }.mkString(",\n")
      val codeCols = (0 until m).map(s => s"a${s}_$iters.cell AS code_$s").mkString(", ")
      val codeJoins = (1 until m).map(s => s"JOIN a${s}_$iters USING (vec_id)").mkString(" ")
      val centJoins = (0 until m).map(s => s"JOIN c${s}_$iters t$s ON t$s.cell = cd.code_$s").mkString("\n  ")
      val adc = (0 until m).map(s =>
        s"list_dot_product(q.e[${s * subDim + 1}:${(s + 1) * subDim}], t$s.c)").mkString(" + ")
      val rnorm2 = (0 until m).map(s => s"list_dot_product(t$s.c, t$s.c)").mkString(" + ")
      s"""WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |),
        |$coarse,
        |$perSub,
        |codes AS (
        |  SELECT vec_id, $codeCols, g_a$iters.cell AS g_cell
        |  FROM a0_$iters $codeJoins JOIN g_a$iters USING (vec_id)
        |), q AS (
        |  SELECT vec_id AS query_id, e FROM emb WHERE vec_id IN (0, 1, 2)
        |), probes AS (
        |  SELECT query_id, cell FROM (
        |    SELECT q.query_id, c.cell, row_number() OVER
        |      (PARTITION BY q.query_id ORDER BY
        |         list_cosine_similarity(q.e, c.c) DESC, c.cell) AS c_rank
        |    FROM q, g_c$iters c)
        |  WHERE c_rank <= $nProbe
        |), scored AS (
        |  SELECT q.query_id, cd.vec_id,
        |    round(($adc) / (sqrt(list_dot_product(q.e, q.e)) * sqrt($rnorm2)), 6) AS cos_approx
        |  FROM codes cd
        |  $centJoins
        |  JOIN probes p ON cd.g_cell = p.cell
        |  JOIN q ON q.query_id = p.query_id
        |  WHERE cd.vec_id <> q.query_id
        |), ashort AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos_approx DESC, vec_id) AS arank
        |    FROM scored)
        |  WHERE arank <= $shortlist
        |), rescored AS (
        |  SELECT n.query_id, n.vec_id,
        |    round(list_cosine_similarity(q.e, v.e), 6) AS cos
        |  FROM ashort n
        |  JOIN emb v ON n.vec_id = v.vec_id
        |  JOIN q ON n.query_id = q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM rescored
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // unigram-surprisal quality score: corpus-fit unigram LM, per-doc mean
    // -ln p(token); integer division promotes to DOUBLE in both engines,
    // the 4-decimal round absorbs partial-aggregation ulp noise
    "text_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), freq AS (
        |  SELECT token, count(*) AS tf FROM tok GROUP BY token
        |), tot AS (
        |  SELECT count(*) AS n_total FROM tok
        |)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(-ln(CAST(f.tf AS DOUBLE) / tot.n_total)), 4) AS avg_surprisal
        |FROM tok t JOIN freq f USING (token), tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // bigram LM perplexity: add-0.5 smoothing, contexts summed over the
    // compact bigram table, V = distinct unigrams; the division is built
    // from the same exact-integer CASTs Spark uses so ln sees an
    // identical IEEE double in both engines, and the per-doc mean is the
    // SAME multiplicity-weighted form the engine computes
    "text_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), uni AS (
        |  SELECT unnest(t) AS token FROM toks
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM uni
        |), bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
        |  WHERE len(t) >= 2
        |), bgdoc AS (
        |  SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS mult FROM bg GROUP BY doc_id, sh
        |), c2 AS (
        |  SELECT sh, CAST(sum(mult) AS BIGINT) AS n2 FROM bgdoc GROUP BY sh
        |), ctx AS (
        |  SELECT w1, CAST(sum(n2) AS BIGINT) AS n1
        |  FROM (SELECT string_split(sh, ' ')[1] AS w1, n2 FROM c2) GROUP BY w1
        |), scored AS (
        |  SELECT b.doc_id, b.mult,
        |    -ln((CAST(c2.n2 AS DOUBLE) + 0.5) / (CAST(ctx.n1 AS DOUBLE) + 0.5 * vocab.v)) AS logp
        |  FROM bgdoc b JOIN c2 USING (sh)
        |    JOIN ctx ON string_split(b.sh, ' ')[1] = ctx.w1, vocab
        |)
        |SELECT doc_id, CAST(sum(mult) AS BIGINT) AS n_bigrams,
        |  round(sum(CAST(mult AS DOUBLE) * logp) / CAST(sum(mult) AS DOUBLE), 4) AS avg_surprisal,
        |  round(exp(sum(CAST(mult AS DOUBLE) * logp) / CAST(sum(mult) AS DOUBLE)), 4) AS ppl
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // interpolated Kneser-Ney replay: absolute discount D=0.75 on exact
    // integer bigram counts, continuation distribution from distinct-
    // context counts with the +0.5 OOV floor — arithmetic order mirrored
    // from TextAnalysis.knPerplexity so ln sees identical doubles
    "text_perplexity_kn" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), uni AS (
        |  SELECT unnest(t) AS token FROM toks
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM uni
        |), bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS sh
        |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
        |  WHERE len(t) >= 2
        |), bgdoc AS (
        |  SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS mult FROM bg GROUP BY doc_id, sh
        |), c2 AS (
        |  SELECT sh, CAST(sum(mult) AS BIGINT) AS n2 FROM bgdoc GROUP BY sh
        |), ctx AS (
        |  SELECT w1, CAST(sum(n2) AS BIGINT) AS n1, CAST(count(*) AS BIGINT) AS tw
        |  FROM (SELECT string_split(sh, ' ')[1] AS w1, n2 FROM c2) GROUP BY w1
        |), cont AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS nc
        |  FROM (SELECT string_split(sh, ' ')[2] AS w2 FROM c2) GROUP BY w2
        |), meta AS (
        |  SELECT CAST(count(*) AS BIGINT) AS bt, (SELECT v FROM vocab) AS v FROM c2
        |), scored AS (
        |  SELECT b.doc_id, b.mult,
        |    -ln((greatest(CAST(c2.n2 AS DOUBLE) - 0.75, 0.0) +
        |         0.75 * CAST(ctx.tw AS DOUBLE) *
        |         ((CAST(cont.nc AS DOUBLE) + 0.5) / (CAST(meta.bt AS DOUBLE) + 0.5 * meta.v)))
        |        / CAST(ctx.n1 AS DOUBLE)) AS logp
        |  FROM bgdoc b JOIN c2 USING (sh)
        |    JOIN ctx ON string_split(b.sh, ' ')[1] = ctx.w1
        |    JOIN cont ON string_split(b.sh, ' ')[2] = cont.w2, meta
        |)
        |SELECT doc_id, CAST(sum(mult) AS BIGINT) AS n_bigrams,
        |  round(sum(CAST(mult AS DOUBLE) * logp) / CAST(sum(mult) AS DOUBLE), 4) AS avg_surprisal,
        |  round(exp(sum(CAST(mult AS DOUBLE) * logp) / CAST(sum(mult) AS DOUBLE)), 4) AS ppl
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // multinomial NB model: per-(label, token) counts with add-1
    // smoothing, ll = ln((c+1)/(n_label+V)); the ratio is built from the
    // same exact-integer casts Spark uses so ln sees an identical IEEE
    // double; only label-SEEN pairs are stored (matches the engine)
    "text_nb_model" ->
      """WITH tok AS (
        |  SELECT lang AS label, unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), classtok AS (
        |  SELECT label, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY label, token
        |), classtotal AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY label
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM tok
        |)
        |SELECT k.label, k.token, k.c,
        |  round(ln((CAST(k.c AS DOUBLE) + 1.0) / CAST(t.n + v.v AS DOUBLE)), 4) AS ll
        |FROM classtok k JOIN classtotal t USING (label) CROSS JOIN vocab v
        |ORDER BY k.label, k.token""".stripMargin,

    // NB scoring: per-doc distinct tokens with multiplicity, fan out by
    // label, left-join the seen-pair count table (c=0 when unseen), sum
    // mult*ll + ln(prior); argmax on the UNROUNDED score with ties to the
    // lexicographically larger label — the exact struct-max semantics of
    // the engine's max(struct(score, label)); round only on output
    "text_nb_predict" ->
      """WITH tok AS (
        |  SELECT doc_id, lang AS label, unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |), doctok AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS mult FROM tok GROUP BY doc_id, token
        |), classtok AS (
        |  SELECT label, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY label, token
        |), classtotal AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY label
        |), vocab AS (
        |  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM tok
        |), priors AS (
        |  SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
        |), total AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents
        |), scores AS (
        |  SELECT d.doc_id, ct.label,
        |    ln(CAST(p.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE)) +
        |    sum(CAST(d.mult AS DOUBLE) *
        |      ln((CAST(coalesce(k.c, 0) AS DOUBLE) + 1.0) / CAST(ct.n + v.v AS DOUBLE))) AS score
        |  FROM doctok d
        |  CROSS JOIN classtotal ct
        |  LEFT JOIN classtok k ON k.label = ct.label AND k.token = d.token
        |  CROSS JOIN vocab v
        |  JOIN priors p ON p.label = ct.label
        |  CROSS JOIN total t
        |  GROUP BY d.doc_id, ct.label, p.n_docs, t.n_total, ct.n, v.v
        |), best AS (
        |  SELECT doc_id, label AS pred_label, round(score, 4) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(score, 4) DESC, label DESC) AS rn
        |  FROM scores
        |)
        |SELECT d.doc_id, d.lang, b.pred_label, b.score,
        |  d.lang = b.pred_label AS correct
        |FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    // logistic regression by 3 unrolled full-batch GD rounds (eta=1,
    // w0=0) over the DSIR hashed unigram+bigram space, L1-normalized per
    // doc; the pagerank rounding discipline keeps both engines on
    // bit-identical iteration state (margins/sigmoid 1e-7, gradient/
    // weights 1e-6)
    "text_lr_model" ->
      (lrGdCtes + "\nSELECT b, w FROM w3 ORDER BY b"),

    // scoring under the final w3: same quantized margin/sigmoid as the
    // training rounds, 0.5 threshold on the GRID value, round-4 emission
    "text_lr_predict" -> lrPredictSql,
    // the persisted-model serving path shares lrProbabilities verbatim,
    // and 1e-6-grid weights round-trip parquet exactly — same oracle
    "text_lr_persisted" -> lrPredictSql,

    // ROC AUC via the Mann-Whitney rank-sum on the score histogram with
    // the ½-per-tied-pair correction; every product is integers + exact
    // halves so summation order can't perturb the double
    "ml_eval_auc" ->
      (lrEvalCtes + """,
        |cum AS (
        |  SELECT s4, n_pos, n_neg,
        |    COALESCE(sum(n_neg) OVER (ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM s4h)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CAST(count(*) AS BIGINT) AS n_scores,
        |  round(sum(n_pos * (neg_below + n_neg / 2.0)) /
        |    (sum(n_pos) * sum(n_neg)), 6) AS auc
        |FROM cum""".stripMargin),

    // confusion-matrix sweep: threshold membership decided on the
    // INTEGER s4/thr4 grid; zero-denominator ratios pin to 0 via
    // greatest(_, 1) — no NULL/NaN forks
    "ml_eval_thresholds" ->
      (lrEvalCtes + """,
        |grid AS (SELECT CAST(i AS BIGINT) * 500 AS thr4
        |  FROM UNNEST(generate_series(1, 19)) AS g(i)),
        |ct AS (
        |  SELECT thr4,
        |    CAST(sum(CASE WHEN s4 >= thr4 THEN n_pos ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN s4 >= thr4 THEN n_neg ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN s4 < thr4 THEN n_pos ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN s4 < thr4 THEN n_neg ELSE 0 END) AS BIGINT) AS tn
        |  FROM s4h, grid GROUP BY 1)
        |SELECT round(thr4 / 10000.0, 4) AS thr, tp, fp, fn, tn,
        |  round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 4) AS prec,
        |  round(CAST(tp AS DOUBLE) / greatest(tp + fn, 1), 4) AS rec,
        |  round((tp * 2.0) / greatest(tp * 2 + fp + fn, 1), 4) AS f1,
        |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 4) AS acc
        |FROM ct ORDER BY thr""".stripMargin),

    // PR-AUC: descending-threshold step AP with ties grouped; per-score
    // rational terms snap to the 1e-10 grid and sum in exact decimal
    // (the sumQR discipline — term SUMS are order-dependent even though
    // each term is engine-identical)
    "ml_eval_pr_auc" ->
      (lrEvalCtes + """,
        |cum AS (
        |  SELECT s4, n_pos, n_neg,
        |    CAST(sum(n_pos) OVER (ORDER BY s4 DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(n_neg) OVER (ORDER BY s4 DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg,
        |    CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos,
        |    CAST(sum(n_neg) OVER () AS BIGINT) AS tot_neg
        |  FROM s4h)
        |SELECT max(tot_pos) AS n_pos, max(tot_neg) AS n_neg,
        |  CAST(count(*) AS BIGINT) AS n_scores,
        |  CAST(round(sum(CAST(round(
        |      CAST(n_pos AS DOUBLE) / tot_pos *
        |        (CAST(cum_pos AS DOUBLE) / (cum_pos + cum_neg)), 10)
        |    AS DECIMAL(38,10))), 6) AS DOUBLE) AS pr_auc,
        |  round(CAST(max(tot_pos) AS DOUBLE) / (max(tot_pos) + max(tot_neg)), 6) AS baseline
        |FROM cum""".stripMargin),

    // bootstrap CI on AUC: the Poisson(1) multiplicities replay from the
    // portable hash (identical resamples in both engines); per-replica
    // AUCs are the usual exact rank-sums; CI bounds are order statistics
    "ml_eval_auc_ci" -> {
      val caseExpr = graft.ext.ModelEval.poissonCdf.zipWithIndex
        .map { case (c, k) => f"WHEN u < $c%.17g THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
      lrScoreCtes + s""",
        |sc AS MATERIALIZED (
        |  SELECT p.doc_id AS id, round(p.p, 4) AS s, dl.y AS y
        |  FROM pf p JOIN dl USING (doc_id)
        |), s4p AS (
        |  SELECT CAST(round(s * 10000) AS BIGINT) AS s4,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg
        |  FROM sc GROUP BY 1
        |), cump AS (
        |  SELECT s4, n_pos, n_neg,
        |    COALESCE(sum(n_neg) OVER (ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM s4p
        |), point AS (
        |  SELECT round(sum(n_pos * (neg_below + n_neg / 2.0)) /
        |    (sum(n_pos) * sum(n_neg)), 6) AS auc
        |  FROM cump
        |), reps AS (SELECT unnest(generate_series(0, 31)) AS b),
        |dr AS (
        |  SELECT r.b, sc.s, sc.y,
        |    (('0x' || substring(md5('boot:' || CAST(r.b AS VARCHAR) || ':' ||
        |      CAST(sc.id AS VARCHAR)), 1, 15))::BIGINT % 1000000) / 1000000.0 AS u
        |  FROM sc CROSS JOIN reps r
        |), dm AS (
        |  SELECT b, s, y, $caseExpr AS m FROM dr
        |), h AS (
        |  SELECT b, CAST(round(s * 10000) AS BIGINT) AS s4,
        |    CAST(sum(y * m) AS BIGINT) AS n_pos,
        |    CAST(sum((1 - y) * m) AS BIGINT) AS n_neg
        |  FROM dm GROUP BY 1, 2
        |), cum AS (
        |  SELECT b, s4, n_pos, n_neg,
        |    COALESCE(sum(n_neg) OVER (PARTITION BY b ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM h
        |), a AS MATERIALIZED (
        |  SELECT b, round(sum(n_pos * (neg_below + n_neg / 2.0)) /
        |    (sum(n_pos) * sum(n_neg)), 6) AS auc
        |  FROM cum GROUP BY b
        |), rk AS MATERIALIZED (
        |  SELECT auc, row_number() OVER (ORDER BY auc, b) AS r FROM a
        |)
        |SELECT point.auc AS auc,
        |  (SELECT round(CAST(sum(CAST(round(auc, 10) AS DECIMAL(38,10)))
        |    AS DOUBLE) / 32, 6) FROM a) AS boot_mean,
        |  (SELECT auc FROM rk WHERE r = 2) AS ci_lo,
        |  (SELECT auc FROM rk WHERE r = 31) AS ci_hi,
        |  CAST(32 AS BIGINT) AS n_replicas
        |FROM point""".stripMargin
    },

    // KS separation: CDF quotients of exact integer cumulatives (no
    // accumulation -> engine-identical doubles), max + smallest-threshold
    // argmax via the same (diff DESC, s4) total order
    "ml_eval_ks" ->
      (lrEvalCtes + """,
        |cum AS (
        |  SELECT s4,
        |    CAST(sum(n_pos) OVER (ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cpos,
        |    CAST(sum(n_neg) OVER (ORDER BY s4
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cneg,
        |    CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos,
        |    CAST(sum(n_neg) OVER () AS BIGINT) AS tot_neg
        |  FROM s4h),
        |d AS (
        |  SELECT s4, tot_pos, tot_neg,
        |    round(abs(CAST(cpos AS DOUBLE) / tot_pos -
        |      CAST(cneg AS DOUBLE) / tot_neg), 9) AS diff
        |  FROM cum)
        |SELECT round(diff, 6) AS ks, round(s4 / 10000.0, 4) AS at_thr,
        |  tot_pos AS n_pos, tot_neg AS n_neg
        |FROM d ORDER BY diff DESC, s4 LIMIT 1""".stripMargin),

    // reliability bins: bin membership in integer arithmetic on s4, the
    // mean from the exact integer sum(s4), gap differencing the two
    // ROUNDED 4-decimal values
    "ml_eval_calibration" ->
      (lrEvalCtes + """,
        |b AS (
        |  SELECT least(CAST(floor((CAST(round(s * 10000) AS BIGINT) * 10)
        |      / 10000.0) AS BIGINT), 9) AS bin,
        |    CAST(round(s * 10000) AS BIGINT) AS s4, y
        |  FROM scored),
        |g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(s4) / (count(*) * 10000.0), 4) AS mean_s,
        |    round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS frac_pos
        |  FROM b GROUP BY 1)
        |SELECT bin, n, mean_s, frac_pos,
        |  round(abs(frac_pos - mean_s), 4) AS gap
        |FROM g ORDER BY bin""".stripMargin),

    // isotonic calibration: PAV via the minimax closed form
    // iso(p) = max_{i<=p} min_{j>=p} posrate(i..j) over 20 bins — exact
    // integer range sums from prefix sums, identical double compares
    "ml_eval_isotonic" -> {
      val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
      s"""WITH scored AS (
        |  SELECT round((round(
        |      round(CAST($occ AS DOUBLE) /
        |        greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 1), 4)
        |      - round(CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1), 4), 4) + 1) / 2, 4) AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |)""".stripMargin + """,
        |bn AS MATERIALIZED (
        |  SELECT least(CAST(floor((CAST(round(s * 10000) AS BIGINT) * 20)
        |      / 10000.0) AS BIGINT), 19) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM scored GROUP BY 1
        |), pre AS (
        |  SELECT bin, n, pos,
        |    CAST(sum(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cpos,
        |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cn
        |  FROM bn
        |), lagd AS (
        |  SELECT bin AS i, COALESCE(lag(cpos) OVER (ORDER BY bin), 0) AS cp0,
        |    COALESCE(lag(cn) OVER (ORDER BY bin), 0) AS cn0
        |  FROM pre
        |), ranges AS (
        |  SELECT a.bin AS i, b2.bin AS j,
        |    CAST(b2.cpos - l.cp0 AS DOUBLE) / (b2.cn - l.cn0) AS avg
        |  FROM pre a JOIN pre b2 ON a.bin <= b2.bin JOIN lagd l ON a.bin = l.i
        |), mins AS (
        |  SELECT pp.bin AS p, r.i, min(r.avg) AS m
        |  FROM ranges r JOIN pre pp ON r.i <= pp.bin AND r.j >= pp.bin
        |  GROUP BY 1, 2
        |), iso AS (SELECT p, round(max(m), 6) AS iso FROM mins GROUP BY 1)
        |SELECT b.bin, b.n, round(CAST(b.pos AS DOUBLE) / b.n, 6) AS raw_rate,
        |  i.iso
        |FROM bn b JOIN iso i ON b.bin = i.p ORDER BY b.bin""".stripMargin
    },

    // containment: winnowing fingerprints at k=12/w=8 (19-char shared-
    // substring guarantee), document-frequency cap df<=32 applied BEFORE
    // pairing, overlap normalized by the SMALLER side's post-cap count
    "dedup_containment" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, g.i AS pos,
        |    ('0x' || substring(md5(substring(t, g.i, 12)), 1, 15))::BIGINT AS h
        |  FROM norm, UNNEST(generate_series(1, greatest(len(t) - 11, 0))) AS g(i)
        |), winmin AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wsize
        |  FROM grams
        |), allfps AS (
        |  SELECT DISTINCT doc_id, fp FROM winmin WHERE wsize = 8
        |), fps AS (
        |  SELECT doc_id, fp FROM allfps
        |  WHERE fp IN (SELECT fp FROM allfps GROUP BY fp HAVING count(*) <= 32)
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id
        |), shared AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
        |  FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT s.a, s.b, CAST(s.shared AS BIGINT) AS shared,
        |  round(CAST(s.shared AS DOUBLE) / least(ca.n_fp, cb.n_fp), 4) AS containment
        |FROM shared s
        |JOIN cnt ca ON s.a = ca.doc_id JOIN cnt cb ON s.b = cb.doc_id
        |WHERE round(CAST(s.shared AS DOUBLE) / least(ca.n_fp, cb.n_fp), 4) >= 0.8
        |ORDER BY s.a, s.b""".stripMargin,

    // containment store twin: identical chain, pair condition swapped to
    // cross-set (incoming %5==0 vs indexed %5!=0); df gate over the full
    // population exactly as the engine computes it on this split
    "dedup_containment_index" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, g.i AS pos,
        |    ('0x' || substring(md5(substring(t, g.i, 12)), 1, 15))::BIGINT AS h
        |  FROM norm, UNNEST(generate_series(1, greatest(len(t) - 11, 0))) AS g(i)
        |), winmin AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wsize
        |  FROM grams
        |), allfps AS (
        |  SELECT DISTINCT doc_id, fp FROM winmin WHERE wsize = 8
        |), fps AS (
        |  SELECT doc_id, fp FROM allfps
        |  WHERE fp IN (SELECT fp FROM allfps GROUP BY fp HAVING count(*) <= 32)
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id
        |), shared AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
        |  FROM fps x JOIN fps y ON x.fp = y.fp
        |    AND x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
        |  GROUP BY 1, 2
        |)
        |SELECT s.a, s.b, CAST(s.shared AS BIGINT) AS shared,
        |  round(CAST(s.shared AS DOUBLE) / least(ca.n_fp, cb.n_fp), 4) AS containment
        |FROM shared s
        |JOIN cnt ca ON s.a = ca.doc_id JOIN cnt cb ON s.b = cb.doc_id
        |WHERE round(CAST(s.shared AS DOUBLE) / least(ca.n_fp, cb.n_fp), 4) >= 0.8
        |ORDER BY s.a, s.b""".stripMargin,

    // winnowing with the portable md5-prefix hash (TextAnalysis
    // .portableHash64) — k=5 char grams, window w=4, full windows only
    "text_winnowing" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, g.i AS pos,
        |    ('0x' || substring(md5(substring(t, g.i, 5)), 1, 15))::BIGINT AS h
        |  FROM norm, UNNEST(generate_series(1, greatest(len(t) - 4, 0))) AS g(i)
        |), winmin AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wsize
        |  FROM grams
        |)
        |SELECT doc_id, count(DISTINCT fp) AS n_fingerprints
        |FROM winmin WHERE wsize = 4
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // duplicated-substring spans: k-token window hashes (portable
    // md5-prefix), corpus-wide count>1 predicate, islands-and-gaps merge
    // of positions within k — replays TextAnalysis.dupSpans exactly
    "text_dup_spans" -> {
      val k = 10
      val gram = (0 until k).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substring(md5($gram), 1, 15))::BIGINT AS h
        |  FROM toks, UNNEST(generate_series(1, len(t) - ${k - 1})) AS g(i)
        |  WHERE len(t) >= $k
        |), dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt FROM wins
        |  ) WHERE cnt > 1
        |), flagged AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $k
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup
        |), islands AS (
        |  SELECT doc_id, pos, sum(brk) OVER (
        |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flagged
        |)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + ${k - 1} AS BIGINT) AS span_end,
        |  CAST(max(pos) - min(pos) + $k AS BIGINT) AS n_dup_tokens
        |FROM islands GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin
    },

    // substring-dedup cleaning: window ownership = min (doc_id,pos) per
    // hash (row_number over the duplicated set), token kept iff uncovered
    // or covered by an own-doc owner window; rebuild via ordered
    // string_agg — replays TextAnalysis.cutDupSpans
    "text_cut_dup_spans" -> {
      val k = 10
      val gram = (0 until k).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS token
        |  FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
        |), wins AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substring(md5(lower($gram)), 1, 15))::BIGINT AS h
        |  FROM toks, UNNEST(generate_series(1, len(t) - ${k - 1})) AS g(i)
        |  WHERE len(t) >= $k
        |), dupocc AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) = 1 AS is_owner
        |  FROM (SELECT doc_id, pos, h, count(*) OVER (PARTITION BY h) AS cnt
        |        FROM wins) w
        |  WHERE cnt > 1
        |), covered AS (
        |  SELECT doc_id, c.tpos, bool_or(is_owner) AS kept
        |  FROM dupocc, UNNEST(generate_series(pos, pos + ${k - 1})) AS c(tpos)
        |  GROUP BY doc_id, c.tpos
        |)
        |SELECT tok.doc_id,
        |  coalesce(string_agg(
        |    CASE WHEN cov.kept IS NULL OR cov.kept THEN token END,
        |    ' ' ORDER BY pos), '') AS clean_text,
        |  CAST(count(CASE WHEN cov.kept = false THEN 1 END) AS BIGINT)
        |    AS n_removed_tokens
        |FROM tok LEFT JOIN covered cov
        |  ON tok.doc_id = cov.doc_id AND tok.pos = cov.tpos
        |GROUP BY tok.doc_id
        |ORDER BY tok.doc_id""".stripMargin
    },

    // perceptual-hash image dedup on the all-opaque corpus: every payload
    // takes the md5-prefix fallback hash, banding is 4×16-bit Hamming
    // (the simhash discipline); only exact-duplicate payloads survive the
    // hamming<=3 verify, since distinct md5 prefixes differ ~30 bits.
    // The corpus has no byte-identical texts, so the gate plants exact
    // copies (doc_id % 50 == 0, shifted by 1e6) — same planting as the
    // Spark side; each must pair with its source at Hamming 0
    "multimodal_image_dedup" -> {
      val bandJoins = (0 until 4).map { bIdx =>
        val sh = bIdx * 16
        s"SELECT ha.doc_id AS a, hb.doc_id AS b, ha.ahash AS h_a, hb.ahash AS h_b\n    FROM h ha JOIN h hb\n      ON ((ha.ahash >> $sh) & 65535) = ((hb.ahash >> $sh) & 65535) AND ha.doc_id < hb.doc_id"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
        |), h AS (
        |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS ahash
        |  FROM d
        |), cand AS (
        |  SELECT DISTINCT a, b, h_a, h_b FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT a, b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
        |ORDER BY a, b""".stripMargin
    },

    // store-probe replay: corpus fingerprints (md5 fallback on the
    // all-opaque synthetic corpus) banded against the planted batch
    // (doc_id % 50 == 0, +1e6) — exactly what dedupAgainstImageStore
    // computes over the persisted hashes
    "multimodal_image_dedup_index" -> {
      val bandJoins = (0 until 4).map { bIdx =>
        val sh = bIdx * 16
        s"SELECT nb.new_id, s.doc_id AS dup_of, nb.ha, s.ahash AS hb\n    FROM nb JOIN h s\n      ON ((nb.ha >> $sh) & 65535) = ((s.ahash >> $sh) & 65535)"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH h AS (
        |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS ahash
        |  FROM documents
        |), nb AS (
        |  SELECT doc_id + 1000000 AS new_id, ahash AS ha
        |  FROM h WHERE doc_id % 50 = 0
        |), cand AS (
        |  SELECT DISTINCT new_id, dup_of, ha, hb FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT new_id, dup_of, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY new_id, dup_of""".stripMargin
    },

    // acoustic-fingerprint audio dedup replay: the all-opaque corpus
    // takes the md5-prefix fallback (no RIFF header), banding is the
    // shared 4×16-bit Hamming discipline; planted exact copies
    // (doc_id % 40 == 0, +2e6) must pair with their source at Hamming 0
    "multimodal_audio_dedup" -> {
      val bandJoins = (0 until 4).map { bIdx =>
        val sh = bIdx * 16
        s"SELECT ha.doc_id AS a, hb.doc_id AS b, ha.ahash AS h_a, hb.ahash AS h_b\n    FROM h ha JOIN h hb\n      ON ((ha.ahash >> $sh) & 65535) = ((hb.ahash >> $sh) & 65535) AND ha.doc_id < hb.doc_id"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 40 = 0
        |), h AS (
        |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS ahash
        |  FROM d
        |), cand AS (
        |  SELECT DISTINCT a, b, h_a, h_b FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT a, b, CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3
        |ORDER BY a, b""".stripMargin
    },

    // audio store-probe replay: corpus fingerprints banded against the
    // planted batch (doc_id % 40 == 0, +2e6) — exactly what
    // dedupAgainstAudioStore computes over the persisted hashes
    "multimodal_audio_dedup_index" -> {
      val bandJoins = (0 until 4).map { bIdx =>
        val sh = bIdx * 16
        s"SELECT nb.new_id, s.doc_id AS dup_of, nb.ha, s.ahash AS hb\n    FROM nb JOIN h s\n      ON ((nb.ha >> $sh) & 65535) = ((s.ahash >> $sh) & 65535)"
      }.mkString("\n    UNION ALL\n    ")
      s"""WITH h AS (
        |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS ahash
        |  FROM documents
        |), nb AS (
        |  SELECT doc_id + 2000000 AS new_id, ahash AS ha
        |  FROM h WHERE doc_id % 40 = 0
        |), cand AS (
        |  SELECT DISTINCT new_id, dup_of, ha, hb FROM (
        |    $bandJoins
        |  )
        |)
        |SELECT new_id, dup_of, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        |ORDER BY new_id, dup_of""".stripMargin
    },

    // frame-hash set-overlap video dedup replay: the all-opaque corpus
    // takes the fake-frame-sampler shape (1 + bytes%30 frames, stride 2)
    // with md5-prefix⊕(k·FNV) per-frame hashes; planted exact copies
    // (doc_id % 60 == 0, +3e6) share every frame hash → overlap 1.0
    // shot boundaries: the fallback frame derivation (opaque testdata
    // payloads), one doc-keyed window for lag + running cut count
    "multimodal_video_shots" ->
      """WITH fh AS (
        |  SELECT doc_id, CAST(g.k AS BIGINT) AS frame_idx,
        |    xor(('0x' || substring(md5(text), 1, 15))::BIGINT,
        |        g.k * 1099511628211) AS fhash
        |  FROM documents, UNNEST(generate_series(0,
        |    CAST(1 + strlen(text) % 30 AS BIGINT) - 1, 2)) AS g(k)
        |), lagged AS (
        |  SELECT doc_id, frame_idx, fhash,
        |    lag(fhash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
        |  FROM fh
        |), c AS (
        |  SELECT doc_id, frame_idx,
        |    CASE WHEN prev IS NULL THEN NULL
        |      ELSE CAST(bit_count(xor(fhash, prev)) AS BIGINT) END AS hamming
        |  FROM lagged
        |)
        |SELECT doc_id, frame_idx, hamming,
        |  COALESCE(hamming >= 20, false) AS is_cut,
        |  CAST(sum(CASE WHEN COALESCE(hamming >= 20, false) THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY frame_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
        |FROM c ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_video_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 60 = 0
        |), fh AS (
        |  SELECT DISTINCT doc_id,
        |    xor(('0x' || substring(md5(text), 1, 15))::BIGINT,
        |        g.k * 1099511628211) AS fhash
        |  FROM d, UNNEST(generate_series(0,
        |    CAST(1 + strlen(text) % 30 AS BIGINT) - 1, 2)) AS g(k)
        |), tot AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS total FROM fh GROUP BY doc_id
        |), cm AS (
        |  SELECT fa.doc_id AS a, fb.doc_id AS b, CAST(count(*) AS BIGINT) AS common_frames
        |  FROM fh fa JOIN fh fb ON fa.fhash = fb.fhash AND fa.doc_id < fb.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT cm.a, cm.b, cm.common_frames,
        |  round(CAST(cm.common_frames AS DOUBLE) / least(ta.total, tb.total), 4) AS overlap
        |FROM cm JOIN tot ta ON ta.doc_id = cm.a JOIN tot tb ON tb.doc_id = cm.b
        |WHERE round(CAST(cm.common_frames AS DOUBLE) / least(ta.total, tb.total), 4) >= 0.8
        |ORDER BY a, b""".stripMargin,

    // video store-probe replay: corpus frame hashes equi-joined against
    // the planted batch's (doc_id % 60 == 0, +3e6) — exactly what
    // dedupAgainstVideoStore computes over the persisted frame sets
    "multimodal_video_dedup_index" ->
      """WITH fh AS (
        |  SELECT DISTINCT doc_id,
        |    xor(('0x' || substring(md5(text), 1, 15))::BIGINT,
        |        g.k * 1099511628211) AS fhash
        |  FROM documents, UNNEST(generate_series(0,
        |    CAST(1 + strlen(text) % 30 AS BIGINT) - 1, 2)) AS g(k)
        |), nf AS (
        |  SELECT doc_id + 3000000 AS new_id, fhash
        |  FROM fh WHERE doc_id % 60 = 0
        |), ts AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS t FROM fh GROUP BY doc_id
        |), tn AS (
        |  SELECT new_id, CAST(count(*) AS BIGINT) AS t FROM nf GROUP BY new_id
        |), cm AS (
        |  SELECT nf.new_id, fh.doc_id AS dup_of, CAST(count(*) AS BIGINT) AS common_frames
        |  FROM nf JOIN fh ON nf.fhash = fh.fhash
        |  GROUP BY 1, 2
        |)
        |SELECT cm.new_id, cm.dup_of, cm.common_frames,
        |  round(CAST(cm.common_frames AS DOUBLE) / least(tn.t, ts.t), 4) AS overlap
        |FROM cm JOIN tn ON tn.new_id = cm.new_id JOIN ts ON ts.doc_id = cm.dup_of
        |WHERE round(CAST(cm.common_frames AS DOUBLE) / least(tn.t, ts.t), 4) >= 0.8
        |ORDER BY cm.new_id, cm.dup_of""".stripMargin,

    // mapPartitions resize stub: out_len = max(1, min(bytes, w*h/128));
    // byte arithmetic only — payload content is ExtSpec-verified
    "multimodal_resize" ->
      """SELECT doc_id, 64 AS width, 64 AS height,
        |  CAST(greatest(1, least(strlen(text), 32)) AS BIGINT) AS out_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // frame-sample stub: frames 0,2,… of 1 + bytes%30; each frame is the
    // 16-byte chunk at min(i*16, bytes-1), clipped to the payload end
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, strlen(text) AS len, g.i AS frame_idx
        |  FROM documents,
        |    UNNEST(generate_series(0, CAST(1 + strlen(text) % 30 AS BIGINT) - 1, 2)) AS g(i)
        |)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(least(least(frame_idx * 16, greatest(len - 1, 0)) + 16, len)
        |    - least(frame_idx * 16, greatest(len - 1, 0)) AS BIGINT) AS frame_len
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // strlen = BYTE count (Spark's length(binary payload)); length() would
    // count characters and break parity on any non-ASCII document
    "multimodal_features" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
        |  'fake/media-' || source AS media_type,
        |  CAST(64 + strlen(text) % 512 AS INT) AS width,
        |  CAST(64 + (CAST(strlen(text) AS BIGINT) * 7) % 512 AS INT) AS height,
        |  CAST(1 + strlen(text) % 30 AS INT) AS n_frames,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the DSv2 fake source is fully deterministic (seeded wire client,
    // proven equivalent to the live-HTTP path in ReportSourceV2Spec), so
    // its expected aggregate is a VALUES literal — this brings the last
    // rows-only query inside the hash gate. Values depend only on the
    // query's fixed options (env=prod, 2024-02-29..2024-03-01, 100
    // rows/report), never on the sf dir.
    "report_source_scan" ->
      """SELECT * FROM (VALUES
        |  ('agent_activity',   CAST(76960 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('call_details',     CAST(23650 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('call_dispositions',CAST(33760 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('call_volume',      CAST(70080 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('inbound_calls',    CAST(69210 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('outbound_calls',   CAST(36840 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('queue_activity',   CAST(38510 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('service_level',    CAST(28720 AS BIGINT), CAST(100 AS BIGINT))
        |) AS t(report_name, total_calls, n_rows)
        |ORDER BY report_name""".stripMargin
  )

  /** text_dedup_segments: CCNet-style segment df-pruning replayed on the
    * segment STRINGS (the engine exchanges xxhash64 fingerprints instead —
    * same results, 8-byte keys). DuckDB zips `unnest` with
    * `generate_subscripts` to recover segment positions; reassembly is an
    * ordered string_agg, mirroring the engine's sorted collect_list.
    */
  private val dedupSegmentsSql: String =
    """WITH segs AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS seg,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents
      |), nz AS (SELECT * FROM segs WHERE seg <> ''),
      |common AS (
      |  SELECT seg FROM nz GROUP BY seg
      |  HAVING count(DISTINCT doc_id) > 0.78 * (SELECT count(*) FROM documents)
      |)
      |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text,
      |  CAST(count(*) AS BIGINT) AS n_kept
      |FROM nz WHERE seg NOT IN (SELECT seg FROM common)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** text_top_ngrams: the n-gram MULTISET (no per-doc dedup — occurrence
    * counts, same tokenization as the dedup family's shingles), counted
    * and cut to a deterministic top-50 on (count DESC, ngram ASC).
    */
  private val topNgramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE len(t) >= 3
      |)
      |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM sh GROUP BY ngram
      |ORDER BY n_occurrences DESC, ngram
      |LIMIT 50""".stripMargin

  /** text_heavy_hitters: the exact top-20 trigram side plus the
    * Misra-Gries theorem flags. `guaranteed` is pure exact arithmetic
    * (count·(k+1) > total, k = 512); `found_ok`/`err_ok` are pinned TRUE
    * — the sketch side must honor its contract (presence of every
    * guaranteed item; undercount within n/(k+1)) at every scale, which is
    * the theorem, not tuning.
    */
  private val heavyHittersSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE len(t) >= 3
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM sh
      |)
      |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences,
      |  CAST(count(*) AS BIGINT) * 513 > tot.n_total AS guaranteed,
      |  TRUE AS found_ok,
      |  TRUE AS err_ok
      |FROM sh, tot GROUP BY ngram, tot.n_total
      |ORDER BY n_occurrences DESC, ngram
      |LIMIT 20""".stripMargin

  /** text_quality_filter: rank-relative quality gate — the same base
    * ratios as text_quality (hash-green replica), composed into a scalar
    * score, cut at the exact interpolated corpus quantile
    * (quantile_cont ≡ Spark's percentile, the agg_percentiles parity).
    */
  private val qualityFilterSql: String = {
    val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
    s"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
      |    $occ AS n_stopwords,
      |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id,
      |    round(round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4)
      |        - round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4), 4) AS score
      |  FROM base
      |), t AS (SELECT quantile_cont(score, 0.3) AS thr FROM scored)
      |SELECT s.doc_id, s.score FROM scored s, t
      |WHERE s.score >= t.thr
      |ORDER BY s.doc_id""".stripMargin
  }

  /** text_quality_calibrated: the qualityFilter score with per-source and
    * global percent_rank — keep flag gates on the ROUNDED per-source
    * percentile, same order of operations as the engine.
    */
  private val qualityCalibratedSql: String = {
    val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
    s"""WITH base AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
      |    $occ AS n_stopwords,
      |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id, source,
      |    round(round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4)
      |        - round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4), 4) AS score
      |  FROM base
      |), p AS (
      |  SELECT doc_id, source, score,
      |    round(percent_rank() OVER (PARTITION BY source ORDER BY score), 6)
      |      AS pct_in_source,
      |    round(percent_rank() OVER (ORDER BY score), 6) AS pct_global
      |  FROM scored
      |)
      |SELECT doc_id, source, score, pct_in_source, pct_global,
      |  pct_in_source >= 0.7 AS keep_calibrated
      |FROM p ORDER BY doc_id""".stripMargin
  }

  /** text_vocab_drift: add-one Dirichlet log-odds between the doc_id-parity
    * halves — every ln argument is a ratio of exact integers on both
    * engines; totals computed over the UNFILTERED vocabulary, support
    * filter applied before scoring, rank on the rounded |z|.
    */
  private val vocabDriftSql: String =
    """WITH toks AS (
      |  SELECT doc_id % 2 = 0 AS grp_a, t[g.i] AS token
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents),
      |    UNNEST(generate_series(1, len(t))) AS g(i)
      |  WHERE t[g.i] <> ''
      |), counts AS (
      |  SELECT token,
      |    CAST(sum(CASE WHEN grp_a THEN 1 ELSE 0 END) AS BIGINT) AS ya,
      |    CAST(sum(CASE WHEN grp_a THEN 0 ELSE 1 END) AS BIGINT) AS yb
      |  FROM toks GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(ya) AS BIGINT) AS na, CAST(sum(yb) AS BIGINT) AS nb,
      |    count(*) AS v FROM counts
      |), g AS (
      |  SELECT token, ya, yb,
      |    ln(CAST(ya + 1 AS DOUBLE) / CAST(na + v - ya - 1 AS DOUBLE))
      |      - ln(CAST(yb + 1 AS DOUBLE) / CAST(nb + v - yb - 1 AS DOUBLE)) AS delta,
      |    (ln(CAST(ya + 1 AS DOUBLE) / CAST(na + v - ya - 1 AS DOUBLE))
      |      - ln(CAST(yb + 1 AS DOUBLE) / CAST(nb + v - yb - 1 AS DOUBLE)))
      |      / sqrt(1.0 / (ya + 1) + 1.0 / (yb + 1)) AS z
      |  FROM counts, tot WHERE ya + yb >= 5
      |), r AS (
      |  SELECT token, ya, yb, round(delta, 4) AS delta, round(z, 4) AS z FROM g
      |), ranked AS (
      |  SELECT CAST(row_number() OVER (ORDER BY abs(z) DESC, token) AS INT) AS rank,
      |    token, ya, yb, delta, z
      |  FROM r
      |)
      |SELECT rank, token, ya, yb, delta, z FROM ranked
      |WHERE rank <= 30 ORDER BY rank""".stripMargin

  /** text_otsu: discretized Otsu over the quality-score histogram —
    * integer class weights/moments per cut, floor-quantized variance and
    * threshold (the mmr discipline, since sigma_b drives the argmax).
    */
  private val otsuSql: String = {
    val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
    s"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
      |    $occ AS n_stopwords,
      |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents
      |), scored AS (
      |  SELECT round(round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4)
      |      - round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4), 4) AS s
      |  FROM base
      |), mm AS (SELECT min(s) AS mn, max(s) AS mx FROM scored),
      |hist AS (
      |  SELECT CAST(least(floor((s - mn) * 20 / (mx - mn)), 19) AS BIGINT) AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM scored, mm GROUP BY 1
      |), cuts AS (
      |  SELECT h.b, h.c, CAST(g.cut AS INT) AS cut
      |  FROM hist h, UNNEST(generate_series(1, 19)) AS g(cut)
      |), agg AS (
      |  SELECT cut,
      |    CAST(sum(CASE WHEN b < cut THEN c ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(sum(CASE WHEN b < cut THEN b * c ELSE 0 END) AS BIGINT) AS s0,
      |    CAST(sum(CASE WHEN b >= cut THEN c ELSE 0 END) AS BIGINT) AS w1,
      |    CAST(sum(CASE WHEN b >= cut THEN b * c ELSE 0 END) AS BIGINT) AS s1
      |  FROM cuts GROUP BY 1
      |), sc AS (
      |  SELECT cut, w0, w1,
      |    floor(CAST(w0 AS DOUBLE) * w1
      |      * (CAST(s0 AS DOUBLE) / w0 - CAST(s1 AS DOUBLE) / w1)
      |      * (CAST(s0 AS DOUBLE) / w0 - CAST(s1 AS DOUBLE) / w1)
      |      * 10000.0 + 0.5) / 10000.0 AS sigma_b,
      |    floor((mm.mn + cut * (mm.mx - mm.mn) / 20) * 10000.0 + 0.5) / 10000.0 AS thr
      |  FROM agg CROSS JOIN mm
      |  WHERE w0 > 0 AND w1 > 0
      |), rk AS (
      |  SELECT *, row_number() OVER (ORDER BY sigma_b DESC, cut) AS br FROM sc
      |)
      |SELECT cut, thr, w0, w1, sigma_b, br = 1 AS is_best
      |FROM rk ORDER BY cut""".stripMargin
  }

  /** sim_mmr_rerank: the unrolled greedy MMR replay (pool 10, k 5,
    * λ 0.7) — built by a loop so every step carries the identical
    * score/argmax form.
    */
  private val mmrRerankSql: String = {
    val prelude =
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id % 100 = 0
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(
        |      CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS rel
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), pool AS (
        |  SELECT query_id, vec_id, rel FROM (
        |    SELECT query_id, vec_id, rel, row_number() OVER
        |      (PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rk
        |    FROM scored) WHERE rk <= 10
        |), sims AS (
        |  SELECT x.query_id, x.vec_id AS a, y.vec_id AS b,
        |    round(list_cosine_similarity(
        |      CAST(ex.embedding AS DOUBLE[]), CAST(ey.embedding AS DOUBLE[])), 6) AS sim
        |  FROM pool x
        |  JOIN pool y ON x.query_id = y.query_id AND x.vec_id <> y.vec_id
        |  JOIN embeddings ex ON ex.vec_id = x.vec_id
        |  JOIN embeddings ey ON ey.vec_id = y.vec_id
        |), sel1 AS (
        |  SELECT query_id, vec_id, 1 AS pick, score FROM (
        |    SELECT query_id, vec_id, floor(0.7::DOUBLE * rel * 1000000.0 + 0.5) / 1000000.0 AS score,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY floor(0.7::DOUBLE * rel * 1000000.0 + 0.5) / 1000000.0 DESC, vec_id) AS pk
        |    FROM pool) WHERE pk = 1
        |)""".stripMargin
    val steps = (2 to 5).map { t =>
      val prev = s"sel${t - 1}"
      s""", s$t AS (
        |  SELECT query_id, vec_id, $t AS pick, score FROM (
        |    SELECT p.query_id, p.vec_id,
        |      floor((0.7::DOUBLE * p.rel - (1.0::DOUBLE - 0.7::DOUBLE) * m.maxsim) * 1000000.0 + 0.5) / 1000000.0 AS score,
        |      row_number() OVER (PARTITION BY p.query_id
        |        ORDER BY floor((0.7::DOUBLE * p.rel - (1.0::DOUBLE - 0.7::DOUBLE) * m.maxsim) * 1000000.0 + 0.5) / 1000000.0 DESC, p.vec_id) AS pk
        |    FROM pool p
        |    JOIN (SELECT s.query_id, s.a AS vec_id, max(s.sim) AS maxsim
        |          FROM sims s JOIN $prev ON s.query_id = $prev.query_id
        |            AND s.b = $prev.vec_id
        |          GROUP BY 1, 2) m
        |      ON p.query_id = m.query_id AND p.vec_id = m.vec_id
        |    WHERE NOT EXISTS (SELECT 1 FROM $prev
        |      WHERE $prev.query_id = p.query_id AND $prev.vec_id = p.vec_id)
        |  ) WHERE pk = 1
        |), sel$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$t)""".stripMargin
    }.mkString
    prelude + steps +
      "\nSELECT query_id, pick, vec_id, score FROM sel5 ORDER BY query_id, pick"
  }

  /** text_bpe_merges / text_bpe_segments: the 3-round BPE trainer
    * unrolled — per round a pair-count + top-1 CTE and the
    * gaps-and-islands resegmentation (even offsets within consecutive
    * match runs merge; a position whose predecessor merged drops).
    * Integer-and-string arithmetic only — no float parity concerns.
    */
  private def bpeCtes(rounds: Int): String = {
    val prelude =
      """WITH words AS (
        |  SELECT w AS word, CAST(count(*) AS BIGINT) AS wcount FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |    FROM documents)
        |  GROUP BY 1
        |), seqs0 AS (
        |  SELECT word, wcount, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS seq
        |  FROM words
        |)""".stripMargin
    val blocks = (1 to rounds).map { r =>
      s""", syms$r AS (
        |  SELECT word, wcount, g.i - 1 AS i, s[g.i] AS sym
        |  FROM (SELECT word, wcount, string_split(seq, ' ') AS s FROM seqs${r - 1}) t,
        |    UNNEST(generate_series(1, len(s))) AS g(i)
        |), top$r AS (
        |  SELECT x, y, x || y AS merged, cnt FROM (
        |    SELECT a.sym AS x, b.sym AS y, CAST(sum(a.wcount) AS BIGINT) AS cnt
        |    FROM syms$r a JOIN syms$r b ON a.word = b.word AND a.i + 1 = b.i
        |    GROUP BY 1, 2)
        |  ORDER BY cnt DESC, x, y LIMIT 1
        |), st$r AS (
        |  SELECT s.word, s.wcount, s.i, s.sym, t.merged,
        |    coalesce(s.sym = t.x AND lead(s.sym) OVER wd = t.y, false) AS mt
        |  FROM syms$r s CROSS JOIN top$r t
        |  WINDOW wd AS (PARTITION BY s.word ORDER BY s.i)
        |), isl$r AS (
        |  SELECT *, i - sum(CASE WHEN mt THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY word ORDER BY i
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM st$r
        |), off$r AS (
        |  SELECT *, CAST(row_number() OVER
        |    (PARTITION BY word, isl, mt ORDER BY i) AS BIGINT) - 1 AS off
        |  FROM isl$r
        |), dp$r AS (
        |  SELECT *, coalesce(lag(taken) OVER
        |      (PARTITION BY word ORDER BY i), false) AS prev_taken
        |  FROM (SELECT *, (mt AND off % 2 = 0) AS taken FROM off$r)
        |), seqs$r AS (
        |  SELECT word, wcount,
        |    string_agg(CASE WHEN taken THEN merged ELSE sym END, ' ' ORDER BY i) AS seq
        |  FROM dp$r WHERE NOT prev_taken
        |  GROUP BY word, wcount
        |)""".stripMargin
    }.mkString
    prelude + blocks
  }

  /** Shared CTE chain for the unigram tokenizer: word vocabulary (the
    * BPE extraction verbatim, ≤30-char words), substring candidates of
    * length 1..4, the selected piece vocabulary (all chars + top-300
    * multis by weight desc/piece), and 9-dp-rounded log-probs. The DP
    * replay carries the best-score and backpointer LISTS per word
    * through a recursive walk (one iteration per character position);
    * infeasible candidates use the -1e18 sentinel and ties break toward
    * the LONGER piece via the greatest/CASE cascade — mirroring the
    * engine's fold exactly. Segments reconstruct in a second recursive
    * walk prepending `substr(word, pos−L+1, L)`.
    */
  private def uniWordsCte(name: String, where: String): String =
    s"""$name AS (
      |  SELECT word, count(*) AS wcount FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      |    FROM documents $where
      |  ) WHERE length(word) <= 30 GROUP BY 1
      |)""".stripMargin

  private def uniCandsCte(name: String, wordsName: String): String =
    s"""$name AS (
      |  SELECT w.word, w.wcount, i.i AS start, L.L AS plen,
      |         substr(w.word, CAST(i.i AS INTEGER), CAST(L.L AS INTEGER)) AS piece
      |  FROM $wordsName w, LATERAL (SELECT unnest(range(1, length(w.word)+1)) AS i) i,
      |       LATERAL (SELECT unnest(range(1, 5)) AS L) L
      |  WHERE i.i + L.L - 1 <= length(w.word)
      |)""".stripMargin

  private def uniVocabFromCands(candsName: String): String =
    s"""weights AS (
      |  SELECT piece, sum(wcount) AS weight FROM $candsName GROUP BY 1
      |), sel AS (
      |  SELECT piece, weight FROM (
      |    SELECT piece, weight, row_number() OVER (
      |      PARTITION BY (length(piece) = 1) ORDER BY weight DESC, piece) AS rank
      |    FROM weights)
      |  WHERE length(piece) = 1 OR rank <= 300
      |), tot AS (SELECT sum(weight) AS total FROM sel),
      |vocab AS (
      |  SELECT piece, weight, round(ln(CAST(weight AS DOUBLE) / total), 9) AS logp
      |  FROM sel, tot
      |)""".stripMargin

  private val unigramVocabCtes: String =
    s"""${uniWordsCte("words", "")},
      |${uniCandsCte("cands", "words")},
      |${uniVocabFromCands("cands")}""".stripMargin

  private val unigramDpScores: String = {
    def s(l: Int) = {
      val prev = l match {
        case 1 => "d.best[d.i + 1]"; case 2 => "d.best[d.i]"
        case 3 => "d.best[d.i - 1]"; case 4 => "d.best[d.i - 2]"
      }
      s"CASE WHEN d.i + 1 >= $l THEN $prev + coalesce(w4.lps[$l], -1e18) ELSE -1e18 END"
    }
    val top = s"greatest(${s(1)}, ${s(2)}, ${s(3)}, ${s(4)})"
    s"""list_append(d.best, $top),
       |    list_append(d.bp, CASE
       |      WHEN d.i + 1 >= 4 AND ${s(4)} = $top THEN 4
       |      WHEN d.i + 1 >= 3 AND ${s(3)} = $top THEN 3
       |      WHEN d.i + 1 >= 2 AND ${s(2)} = $top THEN 2
       |      ELSE 1 END)""".stripMargin
  }

  /** The wm4/dp/seg CTE block under a given vocab CTE, with a suffix so
    * the EM replay can run the identical DP twice in one query.
    */
  private def unigramDpChain(x: String, vocabCte: String,
      candsName: String = "cands", wordsName: String = "words"): String =
    s"""wm4$x AS (
      |  SELECT c.word, c.start + c.plen - 1 AS p,
      |    [max(CASE WHEN c.plen = 1 THEN v.logp END),
      |     max(CASE WHEN c.plen = 2 THEN v.logp END),
      |     max(CASE WHEN c.plen = 3 THEN v.logp END),
      |     max(CASE WHEN c.plen = 4 THEN v.logp END)] AS lps
      |  FROM $candsName c JOIN $vocabCte v ON c.piece = v.piece
      |  GROUP BY 1, 2
      |),
      |dp$x AS (
      |  SELECT word, wcount, 0 AS i, [CAST(0.0 AS DOUBLE)] AS best,
      |         CAST([] AS INTEGER[]) AS bp
      |  FROM $wordsName
      |  UNION ALL
      |  SELECT d.word, d.wcount, d.i + 1,
      |    $unigramDpScores
      |  FROM dp$x d JOIN wm4$x w4 ON w4.word = d.word AND w4.p = d.i + 1
      |  WHERE d.i < length(d.word)
      |),
      |seg$x AS (
      |  SELECT word, wcount, length(word) AS pos, CAST([] AS VARCHAR[]) AS pieces,
      |         best[length(word) + 1] AS score, bp
      |  FROM dp$x WHERE i = length(word)
      |  UNION ALL
      |  SELECT word, wcount, pos - bp[pos],
      |    list_prepend(substr(word, CAST(pos - bp[pos] + 1 AS INTEGER),
      |      CAST(bp[pos] AS INTEGER)), pieces),
      |    score, bp
      |  FROM seg$x WHERE pos > 0
      |)""".stripMargin

  private val unigramSegChain: String =
    s"""WITH RECURSIVE $unigramVocabCtes,
      |${unigramDpChain("", "vocab")}""".stripMargin

  private val unigramSegmentsSql: String =
    s"""$unigramSegChain
      |SELECT word, wcount, array_to_string(pieces, ' ') AS seg,
      |  CAST(len(pieces) AS INTEGER) AS n_pieces, round(score, 6) AS score
      |FROM seg WHERE pos = 0
      |ORDER BY length(word) DESC, word LIMIT 30""".stripMargin

  private val unigramEmSql: String =
    s"""$unigramSegChain,
      |used AS (
      |  SELECT piece, sum(wcount) AS used FROM (
      |    SELECT wcount, unnest(pieces) AS piece FROM seg WHERE pos = 0
      |  ) GROUP BY 1
      |), counts2 AS (
      |  SELECT v.piece, coalesce(u.used, 0) + 1 AS weight
      |  FROM vocab v LEFT JOIN used u ON v.piece = u.piece
      |), tot2 AS (SELECT sum(weight) AS total FROM counts2),
      |vocab2 AS (
      |  SELECT piece, round(ln(CAST(weight AS DOUBLE) / total), 9) AS logp
      |  FROM counts2, tot2
      |),
      |${unigramDpChain("2", "vocab2")}
      |SELECT s2.word, s2.wcount, array_to_string(s2.pieces, ' ') AS seg,
      |  CAST(len(s2.pieces) AS INTEGER) AS n_pieces, round(s2.score, 6) AS score,
      |  (array_to_string(s2.pieces, ' ') <> array_to_string(s1.pieces, ' ')) AS changed
      |FROM seg2 s2 JOIN seg s1 ON s1.word = s2.word AND s1.pos = 0
      |WHERE s2.pos = 0
      |ORDER BY length(s2.word) DESC, s2.word LIMIT 30""".stripMargin

  private val unigramCompressionSql: String =
    s"""$unigramSegChain
      |SELECT count(*) AS vocab_words,
      |  CAST(sum(wcount) AS BIGINT) AS word_occurrences,
      |  CAST(sum(wcount * length(word)) AS BIGINT) AS char_tokens,
      |  CAST(sum(wcount * len(pieces)) AS BIGINT) AS unigram_tokens,
      |  round(CAST(sum(wcount * length(word)) AS DOUBLE)
      |    / sum(wcount * len(pieces)), 4) AS compression
      |FROM seg WHERE pos = 0""".stripMargin

  private val bpeMergesSql: String =
    bpeCtes(3) + "\n" +
      (1 to 3).map(r =>
        s"SELECT $r AS round, x, y, merged, cnt FROM top$r")
        .mkString("", "\nUNION ALL\n", "\nORDER BY round")

  private val bpeSegmentsSql: String =
    bpeCtes(3) +
      "\nSELECT word, wcount, seq FROM seqs3 ORDER BY length(word) DESC, word LIMIT 30"

  /** Shared DSIR weights pipeline (text_dsir_weights /
    * text_dsir_select): add-1-smoothed bag-of-hashed-n-grams models
    * (64 buckets of the portable md5-prefix hash over word unigrams +
    * bigrams) for the English-subset target vs the raw corpus, per-doc
    * log importance weight Σ c_b·(ln p_b − ln q_b). All divisions are
    * built from exact-integer CASTs so ln sees identical IEEE doubles in
    * both engines; the 4-decimal round absorbs partial-aggregation ulp
    * noise in the per-doc sum.
    */
  /** Shared CTE chain for the logistic-GD family: hashed unigram+bigram
    * features L1-normalized per doc, labels y=(lang='en'), then 3
    * generated GD iterations (w0 = 0, eta = 1) each rounding margins and
    * sigmoid to 1e-7 and gradient/weights to 1e-6 — the exact grids the
    * engine's lrFitWeights uses, so both engines iterate identical state.
    */
  /** Exact n-gram Jaccard pairs over distinct trigram shingles —
    * list_filter drops empty tokens to match Spark's `token != ''`
    * filter before shingling. Shared by the quadratic verifier row
    * (`dedup_ngram_jaccard`) and the prefix-filtered production row
    * (`dedup_prefix_jaccard`), which returns the same pairs by the
    * completeness lemma.
    */
  private def ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE len(t) >= 3
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      |), pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT p.a, p.b, p.common, ca.n_sh AS n_a, cb.n_sh AS n_b,
      |  round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) AS jaccard
      |FROM pairs p
      |JOIN cnt ca ON p.a = ca.doc_id JOIN cnt cb ON p.b = cb.doc_id
      |WHERE round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) >= 0.8
      |ORDER BY p.a, p.b""".stripMargin

  private def lrGdCtes: String = {
    // MATERIALIZED throughout (r15, the r14 ask #3 "cut the compare
    // wall" fix): DuckDB inlines CTEs per REFERENCE, and this chain
    // references each w$t three times (the next round's margin join, the
    // scalar bias subquery, and the next weight update) and xf/dl/nn
    // once or twice per round — un-hinted, the whole upstream chain
    // re-expands ~3^t-fold and the 8 LR-family oracles carried ~250 s of
    // the 279 s compare (ml_eval_* 27–34 s each vs the chain's one-shot
    // cost). Hints only pin evaluation strategy; results are unchanged.
    val iters = (1 to 3).map { t =>
      val pw = if (t == 1) "w0" else s"w${t - 1}"
      s"""m$t AS MATERIALIZED (
         |  SELECT x.doc_id, round(sum(x.x * w.w), 7) AS ms
         |  FROM xf x JOIN $pw w ON x.b = w.b GROUP BY 1
         |), p$t AS MATERIALIZED (
         |  SELECT m.doc_id,
         |    round(1.0 / (1.0 + exp(-(m.ms + (SELECT w FROM $pw WHERE b = -1)))), 7)
         |      - dl.y AS r
         |  FROM m$t m JOIN dl USING (doc_id)
         |), g$t AS MATERIALIZED (
         |  SELECT x.b, round(sum(p.r * x.x) / (SELECT n_docs FROM nn), 6) AS g
         |  FROM xf x JOIN p$t p USING (doc_id) GROUP BY 1
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT) AS b,
         |    round((CAST(sum(CAST(round(r * 1e7) AS BIGINT)) AS DOUBLE) / 1e7) / (SELECT n_docs FROM nn), 6) AS g
         |  FROM p$t
         |), w$t AS MATERIALIZED (
         |  SELECT w.b, round(w.w - COALESCE(g.g, 0.0), 6) AS w
         |  FROM $pw w LEFT JOIN g$t g USING (b)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, t[i] AS f
       |  FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
       |  WHERE len(t) >= 1
       |  UNION ALL
       |  SELECT doc_id, t[i] || ' ' || t[i+1] AS f
       |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
       |  WHERE len(t) >= 2
       |), docb AS MATERIALIZED (
       |  SELECT doc_id, ('0x' || substring(md5(f), 1, 15))::BIGINT % 64 AS b,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM feats GROUP BY 1, 2
       |), docn AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM docb GROUP BY 1
       |), xf AS MATERIALIZED (
       |  SELECT x.doc_id, x.b, CAST(x.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS x
       |  FROM docb x JOIN docn n USING (doc_id)
       |), dl AS MATERIALIZED (
       |  SELECT n.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM docn n JOIN documents d USING (doc_id)
       |), nn AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM dl
       |), w0 AS (
       |  SELECT CAST(unnest(generate_series(-1, 63)) AS BIGINT) AS b, 0.0 AS w
       |),
       |$iters""".stripMargin
  }

  /** Shared stage chain of the training pipeline (gopher gate → near-dup
    * survivors → language rebalance → train split), used by the
    * training-set replay and the stage-retention report so the two can
    * never disagree on stage membership.
    */
  private def pipelineStageCtes: String = {
    val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
    s"""q AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
      |    round(CAST($occ AS DOUBLE) /
      |      greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 1), 4)
      |      AS stopword_ratio
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      |  FROM documents
      |), shm AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
      |  WHERE len(t) >= 3
      |), r AS (
      |  SELECT doc_id,
      |    round(1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 4) AS rep_ratio
      |  FROM shm GROUP BY doc_id
      |), gopher AS (
      |  SELECT q.doc_id FROM q JOIN r USING (doc_id)
      |  WHERE q.n_tokens >= 30 AND q.stopword_ratio >= 0.01 AND r.rep_ratio <= 0.6
      |), shc AS (
      |  SELECT DISTINCT s.doc_id, s.sh FROM shm s JOIN gopher g ON s.doc_id = g.doc_id
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id
      |), pairs AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
      |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), dropped AS (
      |  SELECT DISTINCT p.b AS doc_id
      |  FROM pairs p JOIN cnt ca ON p.a = ca.doc_id JOIN cnt cb ON p.b = cb.doc_id
      |  WHERE round(CAST(p.common AS DOUBLE) / (ca.n_sh + cb.n_sh - p.common), 4) >= 0.8
      |), surv AS (
      |  SELECT g.doc_id FROM gopher g LEFT JOIN dropped d ON g.doc_id = d.doc_id
      |  WHERE d.doc_id IS NULL
      |), samp AS (
      |  SELECT s.doc_id FROM surv s JOIN documents dd ON s.doc_id = dd.doc_id
      |  WHERE ('0x' || substring(md5('sample:' || CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
      |    < (CASE WHEN dd.lang = 'en' THEN 5000 ELSE 10000 END)
      |), tr AS (
      |  SELECT doc_id FROM samp
      |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 80
      |)""".stripMargin
  }

  /** The lrGdCtes chain extended with final-weight scoring (`pf`) — the
    * common prefix of the predict rows and the eval-metric rows.
    */
  private def lrScoreCtes: String =
    lrGdCtes + """,
      |mf AS (
      |  SELECT x.doc_id, round(sum(x.x * w.w), 7) AS ms
      |  FROM xf x JOIN w3 w ON x.b = w.b GROUP BY 1
      |), pf AS MATERIALIZED (
      |  SELECT m.doc_id,
      |    round(1.0 / (1.0 + exp(-(m.ms + (SELECT w FROM w3 WHERE b = -1)))), 7) AS p
      |  FROM mf m
      |)""".stripMargin

  /** LR scoring under the final GD weights (w3) — shared by the
    * self-train and persisted-model rows.
    */
  private def lrPredictSql: String =
    lrScoreCtes + """
      |SELECT p.doc_id, round(p.p, 4) AS p, p.p >= 0.5 AS pred_en,
      |  dl.y = 1 AS is_en, (p.p >= 0.5) = (dl.y = 1) AS correct
      |FROM pf p JOIN dl USING (doc_id) ORDER BY p.doc_id""".stripMargin

  /** The ModelEval (s, y) frame plus its per-distinct-score histogram —
    * replays SparkEntry.lrScored feeding graft.ext.ModelEval: the
    * 4-decimal LR probability as the score, the training label as y,
    * and the integer s4 = round(s·10⁴) key all bin/threshold decisions
    * run on (never double-vs-double comparisons).
    */
  private def lrEvalCtes: String =
    lrScoreCtes + """,
      |scored AS MATERIALIZED (
      |  SELECT round(p.p, 4) AS s, dl.y AS y
      |  FROM pf p JOIN dl USING (doc_id)
      |), s4h AS MATERIALIZED (
      |  SELECT CAST(round(s * 10000) AS BIGINT) AS s4,
      |    CAST(sum(y) AS BIGINT) AS n_pos,
      |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      |  FROM scored GROUP BY 1
      |)""".stripMargin

  private val dsirWtsCte: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents
      |), feats AS (
      |  SELECT doc_id, t[i] AS f
      |  FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
      |  WHERE len(t) >= 1
      |  UNION ALL
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS f
      |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
      |  WHERE len(t) >= 2
      |), docb AS (
      |  SELECT doc_id, ('0x' || substring(md5(f), 1, 15))::BIGINT % 64 AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM feats GROUP BY 1, 2
      |), rawm AS (
      |  SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM docb GROUP BY b
      |), tgtm AS (
      |  SELECT x.b, CAST(sum(x.c) AS BIGINT) AS ct
      |  FROM docb x JOIN documents d USING (doc_id)
      |  WHERE d.lang = 'en' GROUP BY x.b
      |), model AS (
      |  SELECT COALESCE(r.b, t.b) AS b, COALESCE(cr, 0) AS cr,
      |    COALESCE(ct, 0) AS ct
      |  FROM rawm r FULL OUTER JOIN tgtm t ON r.b = t.b
      |), tot AS (
      |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
      |  FROM model
      |), lmodel AS (
      |  SELECT b,
      |    ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 64.0)) -
      |    ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + 64.0)) AS lr
      |  FROM model, tot
      |), wts AS (
      |  SELECT x.doc_id, CAST(sum(x.c) AS BIGINT) AS n_feats,
      |    round(sum(x.c * lr), 4) AS logw
      |  FROM docb x JOIN lmodel USING (b) GROUP BY x.doc_id
      |)""".stripMargin

  private val dsirWeightsSql: String =
    dsirWtsCte + "\nSELECT doc_id, n_feats, logw FROM wts ORDER BY doc_id"

  /** corpus_diff: the same synthetic snapshot derivation (old drops
    * id%13, new drops id%11 and appends ' v2' to id%7) diffed by md5
    * content fingerprint.
    */
  private val corpusDiffSql: String =
    """WITH olds AS (
      |  SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id % 13 <> 0
      |), news AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS new_fp
      |  FROM documents WHERE doc_id % 11 <> 0
      |), j AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.old_fp IS NULL THEN 'added'
      |         WHEN n.new_fp IS NULL THEN 'removed'
      |         WHEN o.old_fp <> n.new_fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM olds o FULL OUTER JOIN news n ON o.doc_id = n.doc_id
      |)
      |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
      |ORDER BY doc_id""".stripMargin

  /** corpus_profile: per-column null/distinct/min/max over the documents
    * table — one UNION ALL branch per column (the oracle may re-scan; the
    * engine folds all columns into one aggregation).
    */
  private val corpusProfileSql: String =
    Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      s"""  SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |    CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |    CAST(min($c) AS VARCHAR) AS min_value,
         |    CAST(max($c) AS VARCHAR) AS max_value
         |  FROM documents""".stripMargin
    }.mkString("SELECT * FROM (\n", "\n  UNION ALL\n", "\n) ORDER BY col_name")

  /** Gumbel-top-k resample ∝ importance weight: the noise is the same
    * deterministic portable-hash uniform (never 0/1 via the +0.5/1e6
    * midpoint) the engine computes, the key rounds the ALREADY-rounded
    * logw so both engines rank identical doubles.
    */
  private val dsirSelectSql: String =
    dsirWtsCte +
      """, sel AS (
        |  SELECT doc_id, n_feats, logw,
        |    round(logw - ln(-ln(
        |      (('0x' || substring(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |        % 1000000 + 0.5) / 1000000.0)), 4) AS sel_key
        |  FROM wts
        |  ORDER BY sel_key DESC, doc_id LIMIT 100
        |)
        |SELECT doc_id, n_feats, logw, sel_key FROM sel ORDER BY doc_id""".stripMargin

  /** text_select_budget: best-first selection under a 5000-token budget.
    * The oracle runs ONE global ordered cumulative sum (tiny data is fine
    * there); the Spark side runs the score-bucketed two-phase prefix sum
    * and must agree exactly. Same score grid as the quality gate.
    */
  private val selectBudgetSql: String = {
    val occ = """CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT)"""
    s"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
      |    $occ AS n_stopwords,
      |    CAST(length(regexp_replace(text, '[a-zA-Z\\s]', '', 'g')) AS BIGINT) AS non_alpha,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents
      |), scored AS (
      |  SELECT doc_id, n_tokens,
      |    round(round(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1), 4)
      |        - round(CAST(non_alpha AS DOUBLE) / greatest(n_chars, 1), 4), 4) AS score
      |  FROM base
      |), c AS (
      |  SELECT doc_id, score, n_tokens,
      |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tokens
      |  FROM scored
      |)
      |SELECT doc_id, score, n_tokens, cum_tokens FROM c
      |WHERE cum_tokens <= 5000
      |ORDER BY doc_id""".stripMargin
  }

  /** multimodal_decode: the REAL ImageIO decode of three byte-exact PNG
    * literals; expected dims/frame counts/byte lengths are known
    * independently of any engine (they are properties of the planted
    * bytes), so the oracle is a VALUES literal — the `report_source_scan`
    * pattern. A silent fallback to the arithmetic path would emit
    * width = 64 + len % 512 (137/138) instead of the true dims and flip
    * the hash.
    */
  private val multimodalDecodeSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), CAST(73 AS BIGINT), 'image/png',
      |   CAST(5 AS INTEGER), CAST(4 AS INTEGER), CAST(1 AS INTEGER)),
      |  (CAST(2 AS BIGINT), CAST(74 AS BIGINT), 'image/png',
      |   CAST(16 AS INTEGER), CAST(2 AS INTEGER), CAST(1 AS INTEGER)),
      |  (CAST(3 AS BIGINT), CAST(73 AS BIGINT), 'image/png',
      |   CAST(3 AS INTEGER), CAST(11 AS INTEGER), CAST(1 AS INTEGER))
      |) AS t(doc_id, byte_len, media_type, width, height, n_frames)
      |ORDER BY doc_id""".stripMargin

  /** multimodal_audio: REAL RIFF/WAVE parses of three Python-`wave`-written
    * PCM fixtures + one opaque fallback row. Rates/channels/sample counts
    * are properties of the planted bytes (independent of any engine), so
    * the oracle is a VALUES literal — a fallback-arithmetic leak on doc 1-3
    * (e.g. sample_rate 12000 instead of 8000) flips the hash.
    */
  private val multimodalAudioSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), CAST(144 AS BIGINT), 'audio/wav',
      |   CAST(8000 AS INTEGER), CAST(1 AS INTEGER), CAST(16 AS INTEGER),
      |   CAST(50 AS BIGINT), CAST(6 AS BIGINT)),
      |  (CAST(2 AS BIGINT), CAST(164 AS BIGINT), 'audio/wav',
      |   CAST(16000 AS INTEGER), CAST(2 AS INTEGER), CAST(16 AS INTEGER),
      |   CAST(30 AS BIGINT), CAST(1 AS BIGINT)),
      |  (CAST(3 AS BIGINT), CAST(926 AS BIGINT), 'audio/wav',
      |   CAST(44100 AS INTEGER), CAST(1 AS INTEGER), CAST(16 AS INTEGER),
      |   CAST(441 AS BIGINT), CAST(10 AS BIGINT)),
      |  (CAST(4 AS BIGINT), CAST(49 AS BIGINT), 'application/octet-stream',
      |   CAST(12000 AS INTEGER), CAST(2 AS INTEGER), CAST(16 AS INTEGER),
      |   CAST(24 AS BIGINT), CAST(2 AS BIGINT)),
      |  (CAST(5 AS BIGINT), CAST(202 AS BIGINT), 'audio/wav',
      |   CAST(12000 AS INTEGER), CAST(1 AS INTEGER), CAST(32 AS INTEGER),
      |   CAST(36 AS BIGINT), CAST(3 AS BIGINT)),
      |  (CAST(6 AS BIGINT), CAST(143 AS BIGINT), 'audio/wav',
      |   CAST(11025 AS INTEGER), CAST(1 AS INTEGER), CAST(24 AS INTEGER),
      |   CAST(33 AS BIGINT), CAST(2 AS BIGINT))
      |) AS t(doc_id, byte_len, media_type, sample_rate, channels,
      |       bits_per_sample, n_samples, duration_ms)
      |ORDER BY doc_id""".stripMargin

  /** multimodal_audio_windows: 2 ms PCM windows over the same planted
    * fixtures — per window, sample count and re-wrapped byte length
    * (44-byte header + frames × frame-size) are pure properties of the
    * planted bytes. 8 kHz mono → 16-frame windows over 50 samples
    * (16/16/16/2); 16 kHz stereo → one 30-frame window (32 ≥ 30);
    * 44.1 kHz mono → 88-frame windows over 441 samples (5×88 + 1); the
    * opaque payload keeps the deterministic 16-byte chunk transform
    * (⌊49/16⌋ = 3 chunks); 12 kHz float32 → 24-frame windows over 36
    * samples (24 + 12), re-wrapped with the 58-byte non-PCM header
    * (fmt 18 + fact); 11.025 kHz 24-bit → 22-frame windows over 33
    * samples (22 + 11) at 3 bytes/frame.
    */
  private val multimodalAudioWindowsSql: String = {
    val rows = Seq(
      (1, 0, 16, 44 + 16 * 2), (1, 1, 16, 44 + 16 * 2),
      (1, 2, 16, 44 + 16 * 2), (1, 3, 2, 44 + 2 * 2),
      (2, 0, 30, 44 + 30 * 4),
      (3, 0, 88, 44 + 88 * 2), (3, 1, 88, 44 + 88 * 2),
      (3, 2, 88, 44 + 88 * 2), (3, 3, 88, 44 + 88 * 2),
      (3, 4, 88, 44 + 88 * 2), (3, 5, 1, 44 + 1 * 2),
      (4, 0, 16, 16), (4, 1, 16, 16), (4, 2, 16, 16),
      (5, 0, 24, 58 + 24 * 4), (5, 1, 12, 58 + 12 * 4),
      (6, 0, 22, 44 + 22 * 3), (6, 1, 11, 44 + 11 * 3))
      .map { case (d, w, n, b) =>
        s"  (CAST($d AS BIGINT), CAST($w AS INTEGER), CAST($n AS BIGINT), CAST($b AS BIGINT))"
      }.mkString(",\n")
    s"""SELECT * FROM (VALUES
       |$rows
       |) AS t(doc_id, window_idx, n_samples, byte_len)
       |ORDER BY doc_id, window_idx""".stripMargin
  }

  /** Full DuckDB replay of the PQ serving path — the per-subspace k-means
    * fits (unrolled Lloyd iterations), the codes table, fixed-order ADC
    * scoring, shortlist nomination by approximate cosine, and the exact
    * cosine re-rank. An APPROXIMATE algorithm's oracle must replay the
    * algorithm, not the brute force it approximates — recall gaps are the
    * algorithm's documented behavior, not an error. Parameterized so the
    * flat-PQ top-k and the index-served hard-negative miner (ADC floor
    * prefilter + exact band) share one definition and cannot silently
    * fork arithmetic.
    *
    * `adcFloorSql`/`bandSql` are WHERE-fragments injected into the
    * nomination and re-rank stages; thresholds inside them must be
    * spelled as the same IEEE double expressions the Spark side computes
    * (e.g. `CAST(0.15 AS DOUBLE) - CAST(0.05 AS DOUBLE)`, not a folded
    * decimal) so both engines compare against the bit-identical bound.
    */
  private def pqReplaySql(shortlist: Int, adcFloorSql: String = "",
      bandSql: String = ""): String = {
    val m = 8; val ks = 16; val iters = 2; val subDim = 8
    def d2(e: String, c: String) =
      s"list_dot_product($e, $e) + list_dot_product($c, $c) - 2 * list_dot_product($e, $c)"
    def sub(s: Int) =
      s"sub$s AS (\n  SELECT vec_id, e[${s * subDim + 1}:${(s + 1) * subDim}] AS e FROM emb\n)"
    def init(s: Int) =
      s"init$s AS (\n  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, e AS c\n  FROM (SELECT vec_id, e FROM sub$s ORDER BY vec_id LIMIT $ks)\n)"
    def assign(s: Int, i: Int, centSrc: String) =
      s"a${s}_$i AS (\n  SELECT vec_id, e, cell FROM (\n    SELECT v.vec_id, v.e, c.cell, row_number() OVER\n      (PARTITION BY v.vec_id ORDER BY ${d2("v.e", "c.c")}, c.cell) AS rn\n    FROM sub$s v, $centSrc c)\n  WHERE rn = 1\n)"
    def cent(s: Int, i: Int) =
      s"c${s}_$i AS (\n  SELECT cell, list(round(cv, 9) ORDER BY pos) AS c FROM (\n    SELECT cell, g.i AS pos, avg(e[g.i]) AS cv\n    FROM a${s}_$i, UNNEST(generate_series(1, len(e))) AS g(i)\n    GROUP BY cell, g.i)\n  GROUP BY cell\n)"
    val perSub = (0 until m).map { s =>
      val lloyd = (1 to iters).map { i =>
        val src = if (i == 1) s"init$s" else s"c${s}_${i - 1}"
        assign(s, i, src) + ",\n" + cent(s, i)
      }.mkString(",\n")
      sub(s) + ",\n" + init(s) + ",\n" + lloyd
    }.mkString(",\n")
    val codeCols = (0 until m).map(s => s"a${s}_$iters.cell AS code_$s").mkString(", ")
    val codeJoins = (1 until m).map(s => s"JOIN a${s}_$iters USING (vec_id)").mkString(" ")
    val centJoins = (0 until m).map(s => s"JOIN c${s}_$iters t$s ON t$s.cell = cd.code_$s").mkString("\n  ")
    val adc = (0 until m).map(s =>
      s"list_dot_product(q.e[${s * subDim + 1}:${(s + 1) * subDim}], t$s.c)").mkString(" + ")
    val rnorm2 = (0 until m).map(s => s"list_dot_product(t$s.c, t$s.c)").mkString(" + ")
    s"""WITH emb AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |),
      |$perSub,
      |codes AS (
      |  SELECT vec_id, $codeCols
      |  FROM a0_$iters $codeJoins
      |), q AS (
      |  SELECT vec_id AS query_id, e FROM emb WHERE vec_id IN (0, 1, 2)
      |), scored AS (
      |  SELECT q.query_id, cd.vec_id,
      |    round(($adc) / (sqrt(list_dot_product(q.e, q.e)) * sqrt($rnorm2)), 6) AS cos_approx
      |  FROM codes cd
      |  $centJoins
      |  , q
      |  WHERE cd.vec_id <> q.query_id
      |), ashort AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, row_number() OVER
      |      (PARTITION BY query_id ORDER BY cos_approx DESC, vec_id) AS arank
      |    FROM scored$adcFloorSql)
      |  WHERE arank <= $shortlist
      |), rescored AS (
      |  SELECT n.query_id, n.vec_id,
      |    round(list_cosine_similarity(q.e, v.e), 6) AS cos
      |  FROM ashort n
      |  JOIN emb v ON n.vec_id = v.vec_id
      |  JOIN q ON n.query_id = q.query_id
      |), ranked AS (
      |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
      |  FROM rescored$bandSql
      |)
      |SELECT query_id, vec_id, cos, rank FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** multimodal_audio_energy: per-window RMS/peak/ZCR of the planted WAV
    * fixtures, computed by an INDEPENDENT Python decode (struct unpack of
    * 16/24-bit PCM and float32, same mono mixdown, same sequential
    * accumulation → bit-identical IEEE doubles, same round-half-even to 6
    * decimals). Format coverage: doc 1 = 8 kHz mono 16-bit (a ramp — zero
    * crossings 0), doc 2 = 16 kHz STEREO 16-bit (mixdown + high ZCR),
    * doc 3 = 44.1 kHz mono 16-bit, doc 5 = float32 sine (peak 0.5),
    * doc 6 = 24-bit PCM sine. The opaque doc 4 contributes NO rows.
    */
  /** The per-window feature rows of the deterministic WAV fixtures —
    * pinned constants verified against the engine's real sample decode
    * (and the spec's independent arithmetic); both audio rows derive
    * from this one table, so the SEGMENTATION logic downstream of it is
    * genuinely recomputed in DuckDB.
    */
  private val audioEnergyValues: String = {
    val rows = Seq(
      (1, 0, 16L, 0.026866, 0.045776, 0.0),
      (1, 1, 16L, 0.073083, 0.094604, 0.0),
      (1, 2, 16L, 0.121363, 0.143433, 0.0),
      (1, 3, 2L, 0.148018, 0.149536, 0.0),
      (2, 0, 30L, 0.048733, 0.076294, 0.413793),
      (3, 0, 88L, 0.01711, 0.030518, 0.034483),
      (3, 1, 88L, 0.019178, 0.030396, 0.034483),
      (3, 2, 88L, 0.015594, 0.030273, 0.034483),
      (3, 3, 88L, 0.018471, 0.030212, 0.034483),
      (3, 4, 88L, 0.018517, 0.03009, 0.034483),
      (3, 5, 1L, 0.021973, 0.021973, 0.0),
      (5, 0, 24L, 0.338751, 0.5, 0.043478),
      (5, 1, 12L, 0.405408, 0.499999, 0.0),
      (6, 0, 22L, 0.159336, 0.238317, 0.047619),
      (6, 1, 11L, 0.174542, 0.237504, 0.1))
      .map { case (d, w, n, rms, peak, zcr) =>
        s"  (CAST($d AS BIGINT), CAST($w AS INTEGER), CAST($n AS BIGINT), " +
          s"CAST($rms AS DOUBLE), CAST($peak AS DOUBLE), CAST($zcr AS DOUBLE))"
      }.mkString(",\n")
    s"""(VALUES
       |$rows
       |) AS t(doc_id, window_idx, n_samples, rms, peak, zcr)""".stripMargin
  }

  private val multimodalAudioEnergySql: String =
    s"""SELECT * FROM $audioEnergyValues
       |ORDER BY doc_id, window_idx""".stripMargin

  /** Silence/active segmentation over the same fixture windows: the
    * threshold verdicts, boundary detection, and running segment ids are
    * computed IN DuckDB (lag + running sum), only the rms inputs pin.
    */
  private val multimodalAudioSegmentsSql: String =
    s"""WITH w AS (SELECT * FROM $audioEnergyValues),
       |a AS (
       |  SELECT doc_id, window_idx, rms, rms >= 0.05 AS active,
       |    lag(rms >= 0.05) OVER (PARTITION BY doc_id ORDER BY window_idx) AS prev
       |  FROM w
       |)
       |SELECT doc_id, window_idx, rms, active,
       |  CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> active
       |      THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY window_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
       |FROM a ORDER BY doc_id, window_idx""".stripMargin

  /** The serve-only index twins reuse the fit+serve replays VERBATIM: the
    * persisted index is produced by the same deterministic fit over the
    * same table, and the index round-trip is spec-pinned equal to the
    * in-memory path (ExtSpec), so the correct oracle is the identical
    * statement.
    */
  private val exactSql: Map[String, String] = base ++ Map(
    // the Bloom path is prefilter + EXACT verify: same result set as the
    // plain semi-join decontamination, so the correct oracle is identical
    "dedup_contamination_bloom" -> base("dedup_contamination"),
    "dedup_semantic_contamination" -> semContamSql,
    // persisted-store probe ≡ in-memory probe (shared core, exact
    // parquet round-trip) — identical oracle
    "dedup_semantic_contamination_store" -> semContamSql,
    "sim_topk_ivf_index" -> base("sim_topk_ivf_kmeans"),
    // persisted JL serve ≡ in-memory two-stage path (round-6 reduced
    // vectors round-trip parquet exactly; shared rank/tiebreak)
    "sim_topk_jl_index" -> base("sim_topk_jl"),
    "sim_topk_pq_index" -> base("sim_topk_pq"),
    // scoring a corpus against its own persisted LM = the in-memory fit
    // (identical add-0.5 arithmetic; left-join coalescing only matters
    // for held-out text, which the spec covers)
    "text_perplexity_lm" -> base("text_perplexity"),
    // per-dimension moments: same double accumulation targets, rounded
    // to 6 (partial-agg order differs in the last ulp); min/max exact
    // PSI drift: same parity-split snapshots, same fixed [-1,1] bins with
    // edge clamping, add-0.5 smoothing — all ratios built from exact
    // integers so ln sees identical doubles; round 6 absorbs sum-order ulp
    "sim_drift_psi" ->
      """WITH x AS (
        |  SELECT vec_id, g.i - 1 AS dim, CAST(e[g.i] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |    UNNEST(generate_series(1, len(e))) AS g(i)
        |), binned AS (
        |  SELECT vec_id % 2 = 0 AS is_ref, dim,
        |    LEAST(GREATEST(CAST(floor((v + 1.0) / (2.0 / 10)) AS INTEGER), 0), 9) AS bin
        |  FROM x
        |), h AS (
        |  SELECT dim, bin,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
        |  FROM binned GROUP BY dim, bin
        |), t AS (
        |  SELECT dim, c_ref, c_cur,
        |    CAST(sum(c_ref) OVER (PARTITION BY dim) AS BIGINT) AS t_ref,
        |    CAST(sum(c_cur) OVER (PARTITION BY dim) AS BIGINT) AS t_cur
        |  FROM h
        |), p AS (
        |  SELECT dim,
        |    (c_ref + 0.5) / (t_ref + 5.0) AS p_ref,
        |    (c_cur + 0.5) / (t_cur + 5.0) AS p_cur
        |  FROM t
        |)
        |SELECT CAST(dim AS INTEGER) AS dim,
        |  round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi
        |FROM p GROUP BY dim ORDER BY dim""".stripMargin,

    "sim_dim_stats" ->
      """WITH x AS (
        |  SELECT g.i - 1 AS dim, CAST(e[g.i] AS DOUBLE) AS v
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |    UNNEST(generate_series(1, len(e))) AS g(i)
        |)
        |SELECT CAST(dim AS INTEGER) AS dim, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(v), 6) AS mean,
        |  round(stddev_pop(v), 6) AS std,
        |  round(min(v), 6) AS v_min,
        |  round(max(v), 6) AS v_max
        |FROM x GROUP BY dim ORDER BY dim""".stripMargin,

    // fixed-round power-iteration PCA replay (the pagerank discipline:
    // every cross-partition aggregate rounds to 9 decimals before the
    // next step consumes it, so both engines iterate from bit-identical
    // state); covariance from one cross-product pass, k components via
    // unrolled iteration CTEs with rank-1 deflation between components
    "sim_pca_model" ->
      s"""WITH ${pcaCtes(2, 5)}
        |${pcaModelSelect(2, 5)}
        |ORDER BY component, dim""".stripMargin,

    "sim_pca_project" ->
      s"""WITH ${pcaCtes(2, 5)}, model AS MATERIALIZED (
        |${pcaModelSelect(2, 5)}
        |), px AS MATERIALIZED (
        |  SELECT t.vec_id, g.i - 1 AS dim, t.e[g.i] AS x
        |  FROM e t, UNNEST(generate_series(1, len(t.e))) AS g(i)
        |), pcs AS (
        |  SELECT px.vec_id, m.component,
        |    round(sum((px.x - mu.mu) * m.w), 6) AS pc
        |  FROM px JOIN mu ON mu.dim = px.dim JOIN model m ON m.dim = px.dim
        |  GROUP BY px.vec_id, m.component
        |)
        |SELECT vec_id,
        |  max(CASE WHEN component = 0 THEN pc END) AS pc1,
        |  max(CASE WHEN component = 1 THEN pc END) AS pc2
        |FROM pcs GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // whitened projection: the PCA-project replay with each coordinate
    // scaled by 1/sqrt(lambda + 1e-6); lambda is the model's 1e-6-grid
    // eigenvalue so both engines divide by identical doubles
    "sim_whiten" ->
      s"""WITH ${pcaCtes(2, 5)}, model AS MATERIALIZED (
        |${pcaModelSelect(2, 5)}
        |), px AS MATERIALIZED (
        |  SELECT t.vec_id, g.i - 1 AS dim, t.e[g.i] AS x
        |  FROM e t, UNNEST(generate_series(1, len(t.e))) AS g(i)
        |), pcs AS (
        |  SELECT px.vec_id, m.component,
        |    round(round(sum((px.x - mu.mu) * m.w), 6)
        |      / sqrt(m.eigenvalue + 1e-6), 6) AS z
        |  FROM px JOIN mu ON mu.dim = px.dim JOIN model m ON m.dim = px.dim
        |  GROUP BY px.vec_id, m.component, m.eigenvalue
        |)
        |SELECT vec_id,
        |  max(CASE WHEN component = 0 THEN z END) AS z1,
        |  max(CASE WHEN component = 1 THEN z END) AS z2
        |FROM pcs GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // int8 serving replay: per-vector symmetric quantization (the exact
    // quantizeInt8 scale formula), cosine on the whole-number code
    // arrays (scale cancels), shortlist nomination, exact re-rank —
    // every step IEEE-deterministic in both engines (greatest/division/
    // round/cosine; no pow)
    "sim_topk_int8_index" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), scaled AS (
        |  SELECT vec_id, e,
        |    127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS s
        |  FROM emb
        |), q8 AS (
        |  SELECT vec_id, list_transform(e, x -> round(x * s)) AS qv FROM scaled
        |), q AS (
        |  SELECT vec_id AS query_id, e FROM emb WHERE vec_id IN (0, 1, 2)
        |), scored AS (
        |  SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(q.e, c.qv), 6) AS cos_approx
        |  FROM q8 c, q WHERE c.vec_id <> q.query_id
        |), ashort AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, row_number() OVER
        |      (PARTITION BY query_id ORDER BY cos_approx DESC, vec_id) AS arank
        |    FROM scored)
        |  WHERE arank <= 50
        |), rescored AS (
        |  SELECT n.query_id, n.vec_id,
        |    round(list_cosine_similarity(q.e, v.e), 6) AS cos
        |  FROM ashort n
        |  JOIN emb v ON n.vec_id = v.vec_id
        |  JOIN q ON n.query_id = q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos, CAST(row_number() OVER
        |    (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM rescored
        |)
        |SELECT query_id, vec_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // the index-served miner's oracle replays the APPROXIMATE algorithm
    // (ADC floor prefilter, shortlist 200, exact band on the re-rank) —
    // shortlist recall vs brute force is documented behavior, not error
    "sim_hard_negatives_index" -> pqReplaySql(shortlist = 200,
      adcFloorSql =
        "\n    WHERE cos_approx >= CAST(0.15 AS DOUBLE) - CAST(0.05 AS DOUBLE)",
      bandSql =
        "\n  WHERE cos >= CAST(0.15 AS DOUBLE) AND cos < CAST(0.30 AS DOUBLE)"),
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_audio" -> multimodalAudioSql,
    "multimodal_audio_windows" -> multimodalAudioWindowsSql,
    "multimodal_audio_energy" -> multimodalAudioEnergySql,
    "multimodal_audio_segments" -> multimodalAudioSegmentsSql,
    "text_top_ngrams" -> topNgramsSql,

    // Flesch reading ease: every ratio a quotient of exact integer
    // counts (identical doubles), vowel-group syllables with the
    // one-per-word floor via the no-vowel-word correction
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(list_filter(string_split_regex(text, '[.!?]'),
        |      s -> trim(s) <> '')), 1) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      + len(list_filter(string_split_regex(lower(text), '\s+'),
        |        w -> w <> '' AND NOT regexp_matches(w, '[aeiouy]'))) AS BIGINT)
        |      AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
        |FROM c WHERE n_words > 0
        |ORDER BY doc_id""".stripMargin,

    // sentence segmentation: RE2 has no lookbehind, so both engines mark
    // the split with a chr(1) sentinel via one capture-group replace;
    // indices count ALL parts (pre-filter), lengths in CHARACTERS
    "text_sentences" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
        |      chr(1)) AS parts
        |  FROM documents
        |)
        |SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS sent_idx,
        |  trim(parts[g.i]) AS sentence,
        |  CAST(length(trim(parts[g.i])) AS BIGINT) AS n_chars
        |FROM p, UNNEST(generate_series(1, len(parts))) AS g(i)
        |WHERE trim(parts[g.i]) <> ''
        |ORDER BY doc_id, sent_idx""".stripMargin,

    // Zipf fit: ln of exact integer rank/freq per point (identical
    // doubles), regression sums snapped to the 1e-8 decimal grid
    // (order-free), slope/intercept as Class D quotients at round 6
    "text_zipf" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x <> '')) AS token
        |  FROM documents
        |), freq AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY 1
        |), top AS (
        |  SELECT token, freq FROM freq ORDER BY freq DESC, token LIMIT 200
        |), r AS (
        |  SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
        |  FROM top
        |), xy AS (
        |  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM r
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(x, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(y, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(x * x, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(round(x * y, 8) AS DECIMAL(38,8))) AS DOUBLE) AS sxy
        |  FROM xy
        |), sl AS (
        |  SELECT n, sx, sy,
        |    round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope
        |  FROM s
        |)
        |SELECT n AS n_tokens, slope,
        |  round((sy - slope * sx) / n, 6) AS intercept
        |FROM sl""".stripMargin,

    // PMI collocations: every probability is a quotient of exact integer
    // counts (identical doubles, no accumulation); adjacency skips empty
    // tokens exactly like the engine's shared shingle core
    "text_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), bg AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)
        |  WHERE len(t) >= 2
        |  GROUP BY 1, 2
        |), uni AS (
        |  SELECT u.tok AS w, CAST(count(*) AS BIGINT) AS c
        |  FROM toks, unnest(t) AS u(tok) GROUP BY 1
        |), tot AS (
        |  SELECT CAST((SELECT sum(c_ab) FROM bg) AS BIGINT) AS b,
        |    CAST((SELECT sum(c) FROM uni) AS BIGINT) AS t
        |)
        |SELECT g.w1, g.w2, g.c_ab, ca.c AS c_a, cb.c AS c_b,
        |  round(ln((CAST(g.c_ab AS DOUBLE) / tot.b) /
        |    ((CAST(ca.c AS DOUBLE) / tot.t) * (CAST(cb.c AS DOUBLE) / tot.t))), 6) AS pmi
        |FROM bg g
        |JOIN uni ca ON g.w1 = ca.w
        |JOIN uni cb ON g.w2 = cb.w
        |CROSS JOIN tot
        |WHERE g.c_ab >= 5
        |ORDER BY pmi DESC, g.w1, g.w2
        |LIMIT 50""".stripMargin,
    "text_heavy_hitters" -> heavyHittersSql,
    // count-min sketch, FULLY replayed: deterministic row-salted hashes
    // mean every one of the d*w counters rebuilds identically, so the
    // estimates hash-compare exactly; over_ok is the one-sided theorem
    "agg_countmin" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
        |  FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)
        |  WHERE len(t) >= 3
        |), cms_rows AS (
        |  SELECT g.i AS i,
        |    ('0x' || substring(md5('cm' || g.i || ':' || ngram), 1, 15))::BIGINT
        |      % 1024 AS cell
        |  FROM sh, UNNEST(generate_series(0, 3)) AS g(i)
        |), sketch AS (
        |  SELECT i, cell, CAST(count(*) AS BIGINT) AS c
        |  FROM cms_rows GROUP BY 1, 2
        |), top AS (
        |  SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM sh GROUP BY 1
        |  ORDER BY n_occurrences DESC, ngram LIMIT 20
        |), q AS (
        |  SELECT t.ngram, t.n_occurrences, g.i AS i,
        |    ('0x' || substring(md5('cm' || g.i || ':' || t.ngram), 1, 15))::BIGINT
        |      % 1024 AS cell
        |  FROM top t, UNNEST(generate_series(0, 3)) AS g(i)
        |)
        |SELECT q.ngram, q.n_occurrences, min(s.c) AS est,
        |  min(s.c) - q.n_occurrences AS excess,
        |  min(s.c) >= q.n_occurrences AS over_ok
        |FROM q JOIN sketch s USING (i, cell)
        |GROUP BY q.ngram, q.n_occurrences
        |ORDER BY q.n_occurrences DESC, q.ngram""".stripMargin,
    "text_quality_filter" -> qualityFilterSql,
    // MMR re-rank: the 5-step greedy unrolled as sel1..sel5 CTEs — each
    // step scores the not-yet-selected pool rows against the max
    // similarity to the selected set, quantizes, then argmaxes with the
    // vec_id tiebreak; λ constants carry ::DOUBLE casts because DuckDB
    // parses bare decimal literals as exact DECIMALs ((1.0 - 0.7) would
    // be exactly 0.3, not Spark's IEEE 0.30000000000000004)
    "sim_mmr_rerank" -> mmrRerankSql,
    // distributed BPE trainer: merge choices + final segmentation, both
    // replayed through the full 3-round unroll
    "text_bpe_merges" -> bpeMergesSql,
    "text_bpe_segments" -> bpeSegmentsSql,

    "text_unigram_vocab" ->
      s"""WITH $unigramVocabCtes
        |SELECT piece, CAST(length(piece) AS INTEGER) AS plen,
        |  CAST(weight AS BIGINT) AS weight, logp
        |FROM vocab ORDER BY weight DESC, piece LIMIT 40""".stripMargin,

    "text_unigram_segments" -> unigramSegmentsSql,
    "text_unigram_compression" -> unigramCompressionSql,
    "text_unigram_em" -> unigramEmSql,
    // persisted-vocab serve replay: vocab from the train split, serve
    // words' DP under it (words with any uncovered char drop on both
    // engines — the oracle's wm4 inner join simply never completes them)
    "text_unigram_persisted" ->
      s"""WITH RECURSIVE ${uniWordsCte("words_tr", "WHERE doc_id % 5 <> 0")},
        |${uniCandsCte("cands_tr", "words_tr")},
        |${uniVocabFromCands("cands_tr")},
        |${uniWordsCte("words", "WHERE doc_id % 5 = 0")},
        |${uniCandsCte("cands", "words")},
        |${unigramDpChain("", "vocab")},
        |docw AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents WHERE doc_id % 5 = 0
        |)
        |SELECT d.doc_id, count(*) AS n_words,
        |  CAST(sum(len(s.pieces)) AS BIGINT) AS n_unigram_tokens
        |FROM docw d JOIN (SELECT word, pieces FROM seg WHERE pos = 0) s
        |  ON d.word = s.word
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_tokens_unigram" ->
      s"""$unigramSegChain,
        |docw AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |)
        |SELECT d.doc_id, count(*) AS n_words,
        |  CAST(sum(len(s.pieces)) AS BIGINT) AS n_unigram_tokens
        |FROM docw d JOIN (SELECT word, pieces FROM seg WHERE pos = 0) s
        |  ON d.word = s.word
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // unigram round trip: Viterbi pieces concatenate back to the word;
    // same exact-ratio report as the BPE twin (domain-excluded words
    // drop at the join, absorbed into norm_coverage)
    "text_roundtrip_unigram" ->
      s"""$unigramSegChain,
        |wsegs AS (
        |  SELECT word, array_to_string(pieces, '') AS decoded
        |  FROM seg WHERE pos = 0
        |), dwords AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |), per AS (
        |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(CASE WHEN w.decoded = d.word THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |    CAST(sum(length(d.word)) AS BIGINT) AS word_chars
        |  FROM dwords d JOIN wsegs w USING (word)
        |  GROUP BY d.doc_id
        |)
        |SELECT dd.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(p.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(p.n_ok) AS BIGINT) AS n_words_roundtrip,
        |  ${graft.functions.Exact.sqlRatioR("sum(p.n_ok)", "sum(p.n_words)", 6)} AS word_fidelity,
        |  CAST(sum(CASE WHEN p.n_ok = p.n_words THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_exact,
        |  ${graft.functions.Exact.sqlRatioR("sum(CASE WHEN p.n_ok = p.n_words THEN 1 ELSE 0 END)", "count(*)", 6)} AS doc_fidelity,
        |  ${graft.functions.Exact.sqlRatioR("sum(p.word_chars)", "sum(length(dd.text))", 6)} AS norm_coverage
        |FROM per p JOIN documents dd USING (doc_id)
        |GROUP BY dd.lang ORDER BY dd.lang""".stripMargin,

    "text_unigram_fertility" ->
      s"""$unigramSegChain,
        |docw AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |), bill AS (
        |  SELECT d.doc_id, count(*) AS n_words,
        |    CAST(sum(len(s.pieces)) AS BIGINT) AS n_unigram_tokens
        |  FROM docw d JOIN (SELECT word, pieces FROM seg WHERE pos = 0) s
        |    ON d.word = s.word
        |  GROUP BY 1
        |)
        |SELECT dd.lang, count(*) AS n_docs,
        |  CAST(sum(b.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(b.n_unigram_tokens) AS BIGINT) AS n_unigram_tokens,
        |  round(CAST(sum(b.n_unigram_tokens) AS DOUBLE) / sum(b.n_words), 4)
        |    AS fertility
        |FROM bill b JOIN documents dd ON b.doc_id = dd.doc_id
        |GROUP BY 1 ORDER BY lang""".stripMargin,
    // per-doc token counts under the TRAINED merges: each doc's words
    // join the vocabulary's post-merge segment counts
    "text_encode_bpe" ->
      (bpeCtes(3) + """,
        |wsegs AS (
        |  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS segs
        |  FROM seqs3
        |), dwords AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |)
        |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(w.segs) AS BIGINT) AS n_bpe_tokens
        |FROM dwords d JOIN wsegs w USING (word)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin),

    // per-language fertility: the encode bill grouped by lang, exact
    // integer totals with one rounded tokens-per-word ratio
    "text_bpe_fertility" ->
      (bpeCtes(3) + """,
        |wsegs AS (
        |  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS segs
        |  FROM seqs3
        |), dwords AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |), bill AS (
        |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(w.segs) AS BIGINT) AS n_bpe_tokens
        |  FROM dwords d JOIN wsegs w USING (word)
        |  GROUP BY d.doc_id
        |)
        |SELECT dd.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(b.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(b.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
        |  round(CAST(sum(b.n_bpe_tokens) AS DOUBLE) / sum(b.n_words), 4)
        |    AS fertility
        |FROM bill b JOIN documents dd USING (doc_id)
        |GROUP BY dd.lang ORDER BY dd.lang""".stripMargin),

    // tokenizer round trip: per-word decode (piece concatenation) must
    // reproduce the word exactly; fidelity/coverage ratios ride the
    // exact integer-ratio form (round per-language denominators)
    "text_roundtrip_bpe" ->
      (bpeCtes(3) + s""",
        |wsegs AS (
        |  SELECT word, replace(seq, ' ', '') AS decoded FROM seqs3
        |), dwords AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |), per AS (
        |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(CASE WHEN w.decoded = d.word THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |    CAST(sum(length(d.word)) AS BIGINT) AS word_chars
        |  FROM dwords d JOIN wsegs w USING (word)
        |  GROUP BY d.doc_id
        |)
        |SELECT dd.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(p.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(p.n_ok) AS BIGINT) AS n_words_roundtrip,
        |  ${graft.functions.Exact.sqlRatioR("sum(p.n_ok)", "sum(p.n_words)", 6)} AS word_fidelity,
        |  CAST(sum(CASE WHEN p.n_ok = p.n_words THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_exact,
        |  ${graft.functions.Exact.sqlRatioR("sum(CASE WHEN p.n_ok = p.n_words THEN 1 ELSE 0 END)", "count(*)", 6)} AS doc_fidelity,
        |  ${graft.functions.Exact.sqlRatioR("sum(p.word_chars)", "sum(length(dd.text))", 6)} AS norm_coverage
        |FROM per p JOIN documents dd USING (doc_id)
        |GROUP BY dd.lang ORDER BY dd.lang""".stripMargin),

    // concentration curve: exact integer per-source token sums, rank +
    // running total over the bounded group frame, shares rounded to 6
    "corpus_concentration" ->
      """WITH g AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1
        |), t AS (SELECT CAST(sum(tokens) AS BIGINT) AS t FROM g),
        |r AS (
        |  SELECT source, tokens,
        |    CAST(row_number() OVER (ORDER BY tokens DESC, source) AS INT) AS rank,
        |    CAST(sum(tokens) OVER (ORDER BY tokens DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM g
        |)
        |SELECT r.rank, r.source, r.tokens,
        |  round(CAST(r.tokens AS DOUBLE) / t.t, 6) AS share,
        |  round(CAST(r.cum AS DOUBLE) / t.t, 6) AS cum_share
        |FROM r, t ORDER BY r.rank""".stripMargin,

    // BPE compression report: exact-integer totals over the full
    // post-merge vocabulary (the same 3-round unroll), one rounded ratio
    "text_bpe_coverage" ->
      (bpeCtes(3) + """,
        |bstats AS (
        |  SELECT wcount, CAST(length(word) AS BIGINT) AS chars,
        |    CAST(len(string_split(seq, ' ')) AS BIGINT) AS segs
        |  FROM seqs3
        |)
        |SELECT CAST(count(*) AS BIGINT) AS vocab_words,
        |  CAST(sum(wcount) AS BIGINT) AS word_occurrences,
        |  CAST(sum(wcount * chars) AS BIGINT) AS char_tokens,
        |  CAST(sum(wcount * segs) AS BIGINT) AS bpe_tokens,
        |  round(CAST(sum(wcount * chars) AS DOUBLE) / sum(wcount * segs), 4)
        |    AS compression
        |FROM bstats""".stripMargin),
    "text_otsu" -> otsuSql,
    // length bucketing: literal CASE ladder (no float log2), exact-integer
    // capacity/waste until the final rounded fractions
    "text_length_buckets" ->
      """WITH lens AS (
        |  SELECT greatest(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1)
        |    AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT n_tokens, CASE
        |    WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
        |    WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
        |    WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
        |    WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048
        |    ELSE 4096 END AS bucket
        |  FROM lens
        |), g AS (
        |  SELECT CAST(bucket AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS real_tokens
        |  FROM b GROUP BY 1
        |), cap AS (
        |  SELECT *, n_docs * bucket AS capacity FROM g
        |), tot AS (
        |  SELECT CAST(sum(real_tokens) AS BIGINT) AS treal,
        |    CAST(sum(capacity) AS BIGINT) AS tcap FROM cap
        |)
        |SELECT bucket, n_docs, real_tokens, capacity,
        |  round(CAST(capacity - real_tokens AS DOUBLE) / capacity, 4) AS waste_frac,
        |  round(CAST(tcap - treal AS DOUBLE) / tcap, 4) AS corpus_waste_frac
        |FROM cap CROSS JOIN tot ORDER BY bucket""".stripMargin,
    // token-balanced shards: serpentine assignment over the length-
    // descending global rank (engine computes the same rank stratified);
    // exact-integer totals into one rounded balance ratio
    "text_shards" ->
      """WITH dt AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT)
        |      AS rank
        |  FROM dt
        |), a AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN (rank - 1) % 16 < 8 THEN (rank - 1) % 16
        |         ELSE 15 - (rank - 1) % 16 END AS shard
        |  FROM r
        |), per AS (
        |  SELECT CAST(shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS tokens
        |  FROM a GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(tokens) AS BIGINT) AS t FROM per
        |)
        |SELECT shard, n_docs, tokens,
        |  round(CAST(tokens AS DOUBLE) * 8 / CAST(t AS DOUBLE), 4) AS balance
        |FROM per CROSS JOIN tot ORDER BY shard""".stripMargin,
    "text_quality_calibrated" -> qualityCalibratedSql,
    "text_vocab_drift" -> vocabDriftSql,

    // character entropy via H = ln(n) − Σ c·ln(c)/n — every ln argument an
    // exact integer; per-term round(8) before the sum, flags compare the
    // ROUNDED entropy
    "text_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, substring(text, g.i, 1) AS ch
        |  FROM documents, UNNEST(generate_series(1, length(text))) AS g(i)
        |), counts AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    sum(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 8)) AS slc
        |  FROM counts GROUP BY 1
        |)
        |SELECT doc_id, n AS n_chars,
        |  round(ln(CAST(n AS DOUBLE)) - slc / n, 4) AS entropy,
        |  round(ln(CAST(n AS DOUBLE)) - slc / n, 4) < 2.5 AS low_entropy,
        |  round(ln(CAST(n AS DOUBLE)) - slc / n, 4) > 4.0 AS high_entropy
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_select_budget" -> selectBudgetSql,
    "text_dsir_weights" -> dsirWeightsSql,
    // the persisted-model serve path must reproduce the in-memory weights
    // bit-for-bit — same oracle
    "text_dsir_model" -> dsirWeightsSql,
    "text_dsir_select" -> dsirSelectSql,
    "corpus_diff" -> corpusDiffSql,
    // SCD2: consecutive-repeat collapse via lag, then version/lead over
    // the collapsed runs; half-open intervals, 9999-12-31 open sentinel
    "events_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), runs AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev IS NULL OR event_type <> prev
        |), hist AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(row_number() OVER w AS INT) AS version,
        |    lead(ts) OVER w AS to_ts
        |  FROM runs
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, version, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  COALESCE(strftime(to_ts, '%Y-%m-%d %H:%M:%S.%f'),
        |    '9999-12-31 00:00:00.000000') AS valid_to,
        |  to_ts IS NULL AS is_current
        |FROM hist ORDER BY user_id, version""".stripMargin,
    // point-in-time serve of the SCD2 dimension: per purchase, the run
    // with the greatest (start ts, version) at or before the fact
    // instant — DuckDB replays the as-of via a ranked interval join
    "events_scd2_lookup" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), runs AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev IS NULL OR event_type <> prev
        |), hist AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
        |      AS version
        |  FROM runs
        |), purch AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), matched AS (
        |  SELECT p.event_id, p.user_id, p.ts, h.version, h.event_type,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY h.ts DESC, h.version DESC) AS rn
        |  FROM purch p JOIN hist h ON p.user_id = h.user_id AND h.ts <= p.ts
        |)
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, version, event_type
        |FROM matched WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "corpus_profile" -> corpusProfileSql,

    // equi-width histogram: floor of one identical double expression,
    // width (mx - mn), max clamped into the last bin
    "corpus_histogram" ->
      """WITH mm AS (
        |  SELECT min(n_chars) AS mn, max(n_chars) AS mx,
        |    CAST(count(*) AS BIGINT) AS total
        |  FROM documents
        |), b AS (
        |  SELECT CAST(CASE WHEN mx = mn THEN 0
        |    ELSE least(floor(CAST(n_chars - mn AS DOUBLE) * 20
        |      / CAST(mx - mn AS DOUBLE)), 19) END AS BIGINT) AS bin
        |  FROM documents, mm
        |), g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1)
        |SELECT g.bin, g.n, round(CAST(g.n AS DOUBLE) / mm.total, 4) AS share
        |FROM g, mm ORDER BY bin""".stripMargin,

    // k-anonymity audit: exact integer class counts over the bounded
    // quasi-identifier space; risk is one division of identical doubles
    "corpus_kanon" ->
      """SELECT lang, source,
        |  CAST(floor(n_chars / 200.0) AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  count(*) < 5 AS at_risk,
        |  round(1.0 / count(*), 6) AS risk
        |FROM documents
        |GROUP BY 1, 2, 3
        |ORDER BY lang, source, len_bucket""".stripMargin,

    // chi-square independence over the dense source×lang grid — integer
    // margins, identical double expressions per cell, total sums
    // 6-decimal-rounded contributions before its own 4-decimal round
    "corpus_chi2" ->
      """WITH cells AS (
        |  SELECT source AS r, lang AS c, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |), rows_ AS (SELECT r, CAST(sum(n) AS BIGINT) AS nr FROM cells GROUP BY 1),
        |cols_ AS (SELECT c, CAST(sum(n) AS BIGINT) AS nc FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |g AS (
        |  SELECT rows_.r, cols_.c, coalesce(cells.n, 0) AS n,
        |    CAST(nr AS DOUBLE) * nc / nn AS e,
        |    (coalesce(cells.n, 0) - CAST(nr AS DOUBLE) * nc / nn)
        |      / sqrt(CAST(nr AS DOUBLE) * nc / nn) AS resid
        |  FROM rows_ CROSS JOIN cols_
        |  LEFT JOIN cells ON rows_.r = cells.r AND cols_.c = cells.c
        |  CROSS JOIN tot
        |), cellr AS (
        |  SELECT r, c, n, round(e, 4) AS expected, round(resid, 4) AS resid,
        |    round(resid * resid, 6) AS chi2_cell
        |  FROM g
        |), s AS (
        |  SELECT round(sum(chi2_cell), 4) AS chi2_total,
        |    CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1) AS BIGINT) AS dof
        |  FROM cellr
        |)
        |SELECT cellr.r AS source, cellr.c AS lang, cellr.n, cellr.expected,
        |  cellr.resid, cellr.chi2_cell, s.chi2_total, s.dof
        |FROM cellr CROSS JOIN s ORDER BY source, lang""".stripMargin,

    // Efraimidis-Spirakis without-replacement sample: ln(u)/w keys from
    // the portable hash, quantized to 10 decimals before the global rank
    "text_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, greatest(n_chars, 1) AS weight,
        |    round(ln((('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |        % 1000000 + 0.5) / 1000000.0)
        |      / greatest(n_chars, 1), 10) AS es_key
        |  FROM documents
        |), ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS INT) AS rank,
        |    doc_id, weight, es_key
        |  FROM s
        |)
        |SELECT rank, doc_id, weight, es_key FROM ranked
        |WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "text_dedup_segments" -> dedupSegmentsSql)

  /** The certified champion serves are row-identical to their exact
    * twins by construction ([[graft.ext.TextAnalysis.bm25TopKCertified]]:
    * certified top-k sets re-scored exactly, uncertified queries on the
    * exact scorer), so they share the twins' oracle SQL verbatim — one
    * replay definition per semantic, the dupClustersCtes non-forking
    * discipline.
    */
  /** The idf-spread corpus twin of an oracle: prepend the block-tag
    * derivation CTE ([[graft.SparkEntry.withSpread]] replayed verbatim —
    * DuckDB `//` is floor division on BIGINT, matching Spark's
    * floor(doc_id / n) on non-negative ids) and re-point the tokenizer
    * at it. One source of truth: the BM25 replay body is shared with
    * the base oracle character-for-character.
    */
  private def spreadSql(base: String): String = {
    val cte =
      """spread AS (
        |  SELECT doc_id,
        |    repeat('ga' || CAST(doc_id // 16 AS VARCHAR) || ' ', CAST(doc_id % 16 AS INTEGER) + 1)
        |    || 'gb' || CAST(doc_id // 32 AS VARCHAR)
        |    || ' gc' || CAST(doc_id // 64 AS VARCHAR) || ' gd' || CAST(doc_id // 128 AS VARCHAR)
        |    || ' ' || text AS text
        |  FROM documents
        |), """.stripMargin
    val body = base.replace("AS t FROM documents)", "AS t FROM spread)")
    require(body != base, "spread oracle: tokenizer source not found in base SQL")
    // fail loud at construction if the base no longer opens with WITH —
    // a silent no-op prepend would surface as a confusing DuckDB
    // 'table spread does not exist' at verify time instead
    require(body.startsWith("WITH "),
      "spread oracle: base SQL no longer starts with a WITH clause")
    body.replaceFirst("^WITH ",
      java.util.regex.Matcher.quoteReplacement("WITH " + cte))
  }

  val sql: Map[String, String] = exactSql ++ Map(
    "text_bm25_certified" -> exactSql("text_bm25"),
    // certified serve on the idf-spread twin: row-identical to the exact
    // serve over the SAME derived corpus, so the gate is the text_bm25
    // replay re-pointed at the spread CTE
    "text_bm25_certified_spread" -> spreadSql(exactSql("text_bm25")),
    "retrieval_hybrid_rrf_certified" -> exactSql("retrieval_hybrid_rrf_index"),
    "retrieval_eval_certified" -> exactSql("retrieval_eval"),
    // persisted-KN serve scores the corpus against its own frozen model
    // — bit-identical to the fit-on-the-fly row (same integer tables
    // through a parquet round trip, same arithmetic)
    "text_perplexity_kn_lm" -> exactSql("text_perplexity_kn"))
}
