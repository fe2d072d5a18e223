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

  val sql: Map[String, String] = Map(

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
        |  round(sum(value), 3) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "b3_error_details" ->
      s"""SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, value, props
        |FROM events
        |WHERE event_type = 'error' AND CAST(ts AS DATE) >= DATE '$asOf'
        |ORDER BY ts DESC, event_id""".stripMargin,

    "b4_daily_value" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS run_date, event_type,
        |  round(sum(value), 3) AS total_value, count(*) AS n_events
        |FROM events WHERE event_type <> 'error'
        |GROUP BY 1, 2 ORDER BY run_date DESC, event_type ASC""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_odate,
        |  o.o_orderpriority,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < DATE '2000-01-01'
        |GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE) /
        |    greatest(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1), 4)
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
