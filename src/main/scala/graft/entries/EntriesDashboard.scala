package graft

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{RecentArticles, SourceDistribution, Timeline, Totals}
import graft.dedup.Dedup
import graft.ingest.{Dates, Ingest}
import graft.multimodal.Multimodal
import graft.relational.Relational
import graft.similarity.{FittedOracle, Ivf, Pq, Similarity}
import graft.streaming.EventWindows
import graft.text.{Stopwords, TextAnalysis, WordFrequencies}

import graft.EntryFixtures._

/** dashboard parity, TPC-H-style relational analytics, sketches, skew handling — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesDashboard {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dashboard parity (reference app.py) ----
    "source_distribution" -> ((s, dir) =>
      SourceDistribution(Tables.documents(s, dir))),
    "word_frequencies" -> ((s, dir) =>
      WordFrequencies(Tables.documents(s, dir))),
    "timeline_daily" -> ((s, dir) =>
      Timeline(Tables.events(s, dir), "ts")),
    "recent_events" -> ((s, dir) =>
      RecentArticles(Tables.events(s, dir).select(col("event_id"), col("ts"), col("event_type"), col("user_id")),
        5, col("ts").desc, col("event_id").desc)),
    "totals" -> ((s, dir) => Totals.counts(s, dir)),
    // ---- relational coverage (TPC-H-ish) ----
    "q1_pricing_summary" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "revenue_per_region" -> ((s, dir) => Relational.revenuePerRegion(s, dir)),
    "top_orders_per_priority" -> ((s, dir) => Relational.topOrdersPerPriority(s, dir)),
    "distinct_counts" -> ((s, dir) => Relational.distinctCounts(s, dir)),
    "customers_without_big_orders" -> ((s, dir) => Relational.customersWithoutBigOrders(s, dir)),
    "set_ops" -> ((s, dir) => Relational.setOps(s, dir)),
    "daily_order_deltas" -> ((s, dir) => Relational.dailyOrderDeltas(s, dir)),
    "pricing_rollup" -> ((s, dir) => Relational.pricingRollup(s, dir)),
    "pricing_cube" -> ((s, dir) => Relational.pricingCube(s, dir)),
    "order_percentiles" -> ((s, dir) => Relational.orderPercentiles(s, dir)),
    // sketch-based percentiles: engine-specific values, rows-only check;
    // error vs the exact form bounded in RelationalSpec
    "order_percentiles_approx" -> ((s, dir) => Relational.orderPercentilesApprox(s, dir)),
    // Engine-reproducible quantile sketch (vs the t-digest above): an
    // integer cent-histogram whose ESTIMATE hash-matches DuckDB; width
    // $100 -> error < $100 absolute, spec-pinned against the exact form.
    "order_percentiles_sketch" -> ((s, dir) => {
      import graft.relational.QuantileSketch
      val w = 10000L
      val sk = QuantileSketch.sketch(Tables.orders(s, dir),
        QuantileSketch.cents(col("o_totalprice")), w, "o_orderpriority")
      QuantileSketch.quantiles(sk, w,
          Seq("p50c" -> 0.5, "p90c" -> 0.9, "p99c" -> 0.99), "o_orderpriority")
        .select(col("o_orderpriority"), col("n").as("n_orders"),
          round(col("p50c") / 100.0, 2).as("p50"),
          round(col("p90c") / 100.0, 2).as("p90"),
          round(col("p99c") / 100.0, 2).as("p99"))
    }),
    // Skew mitigation ops, oracle-proven value-identical to their direct
    // forms (the salt is an internal spreading detail).
    "salted_group_count" -> ((s, dir) => Relational.saltedGroupCount(s, dir)),
    "salted_join_agg" -> ((s, dir) => Relational.saltedJoinAgg(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "source_distribution" ->
      """SELECT source, n, ROUND(n * 100.0 / SUM(n) OVER (), 1) AS pct
        |FROM (SELECT COALESCE(source, 'Unknown') AS source, COUNT(*) AS n
        |      FROM documents GROUP BY 1)
        |ORDER BY n DESC, source ASC""".stripMargin,
    "word_frequencies" ->
      s"""SELECT word, COUNT(*) AS n
         |FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS word
         |      FROM documents)
         |WHERE length(word) >= 3 AND word NOT IN ${Stopwords.sqlInList}
         |GROUP BY word ORDER BY n DESC, word ASC LIMIT 150""".stripMargin,
    "timeline_daily" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |bounds AS (SELECT MIN(date) AS lo, MAX(date) AS hi FROM counts),
        |spine AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM bounds)
        |SELECT s.date AS date, COALESCE(c.n, 0) AS n
        |FROM spine s LEFT JOIN counts c ON s.date = c.date
        |ORDER BY date ASC""".stripMargin,
    "recent_events" ->
      """SELECT event_id, ts, event_type, user_id FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 5""".stripMargin,
    "totals" ->
      """SELECT (SELECT COUNT(*) FROM documents) AS n_documents,
        |       (SELECT COUNT(*) FROM events) AS n_events,
        |       (SELECT COUNT(*) FROM embeddings) AS n_embeddings""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "revenue_per_region" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "top_orders_per_priority" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "customers_without_big_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_custkey IS NOT NULL AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "set_ops" ->
      """SELECT c_custkey, op FROM (
        |  SELECT c_custkey, 'union' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    UNION SELECT c_custkey FROM customer WHERE c_custkey > 50)
        |  UNION ALL
        |  SELECT c_custkey, 'intersect' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    INTERSECT SELECT c_custkey FROM customer WHERE c_custkey > 50)
        |  UNION ALL
        |  SELECT c_custkey, 'except' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    EXCEPT SELECT c_custkey FROM customer WHERE c_custkey > 50))
        |ORDER BY op, c_custkey""".stripMargin,
    "daily_order_deltas" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT d, n, LAG(n) OVER (ORDER BY d) AS prev_n,
        |       n - COALESCE(LAG(n) OVER (ORDER BY d), 0) AS delta
        |FROM d ORDER BY d""".stripMargin,
    "pricing_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "order_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // The sketch estimate replayed exactly: same integer cent-histogram,
    // same crossing-bucket rule, same interpolation arithmetic. The
    // ::DOUBLE casts matter — a bare 0.9 literal is DECIMAL in DuckDB
    // and CEIL(decimal·n) can differ by one rank from the double product
    // Spark computes.
    "order_percentiles_sketch" ->
      """WITH sk AS (
        |  SELECT o_orderpriority,
        |    CAST(FLOOR(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)::DOUBLE / 10000) AS BIGINT) AS bucket,
        |    COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT o_orderpriority, bucket, cnt,
        |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket) AS cum,
        |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM sk),
        |p50 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.5::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |p90 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.9::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |p99 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.99::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |cnts AS (SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_orders FROM sk GROUP BY 1)
        |SELECT cnts.o_orderpriority, cnts.n_orders,
        |  ROUND(CAST(p50.pc AS DOUBLE) / 100.0, 2) AS p50,
        |  ROUND(CAST(p90.pc AS DOUBLE) / 100.0, 2) AS p90,
        |  ROUND(CAST(p99.pc AS DOUBLE) / 100.0, 2) AS p99
        |FROM cnts
        |JOIN p50 USING (o_orderpriority)
        |JOIN p90 USING (o_orderpriority)
        |JOIN p99 USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "salted_group_count" ->
      """SELECT l_returnflag AS key, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin,
    "salted_join_agg" ->
      """SELECT n_name, COUNT(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,
    "pricing_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
  )
}
