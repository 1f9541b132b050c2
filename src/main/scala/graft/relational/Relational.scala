package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage over the TPC-H-ish star schema: hash
  * aggregation, multi-way joins (broadcast where a side is a dimension),
  * window ranking, exact + approximate distinct.
  *
  * The reference has one join (the dedup anti-join, `crawl.py:73` — see
  * `graft.dedup`); these queries exercise the rest of the standard join/agg
  * surface a user of a general engine needs (SURVEY §2.3/§2.4 "free
  * built-ins" rows), with plan shapes chosen for 100 TB:
  *  - facts (`lineitem`, `orders`) are never broadcast; dims
  *    (`region`/`nation`/`supplier`, and `customer` relative to orders) are.
  *  - aggregates sum in integer cents (see [[Money]]) so results are exact
  *    and shuffle-order-independent.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: one wide hash aggregate, map-side
    * partial combine, shuffle on the 6-value (flag,status) key. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        Money.sumMoney(col("l_extendedprice")).as("sum_base_price"),
        Money.sumMoneyTimesRate(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue per region (TPC-H Q5-shaped): orders ⋈ customer ⋈ nation ⋈
    * region. `nation`/`region` are broadcast (constant-size dims);
    * customer⋈orders is the one real shuffle — at scale both sides hash-
    * partition on custkey (or co-bucketed storage removes it entirely). */
  def revenuePerRegion(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = broadcast(Tables.nation(spark, dir))
    val region   = broadcast(Tables.region(spark, dir))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(Money.sumMoney(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** Top-3 orders by price per priority class: `row_number` over a window
    * partitioned by the group key — one shuffle on the key, per-partition
    * sort only (no global sort). Ties broken by orderkey for determinism. */
  def topOrdersPerPriority(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** Exact distinct cardinalities (SURVEY §2.4 A8). The approximate variant
    * `approxDistinct` is the 100 TB default (HLL++, constant memory) but is
    * engine-specific — it gets a rows-only check, not a DuckDB hash match. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      count(lit(1)).as("n_rows"))

  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"))

  /** Anti-join (SURVEY §2.3 J1 shape on relational data): customers with no
    * high-value order. The predicate is pushed below the join so the build
    * side shrinks before the key-set ships; same plan shape as the ingest
    * dedup probe. */
  def customersWithoutBigOrders(spark: SparkSession, dir: String, minTotal: Double = 300000.0): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val bigOrderCust = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_custkey"))
    customer.join(bigOrderCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** SO3: union / intersect / except as one labeled result. Operand sets
    * are customer-key slices so every branch is a pushed-down scan. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val lo = c.filter(col("c_custkey") <= 100).select(col("c_custkey"))
    val hi = c.filter(col("c_custkey") > 50).select(col("c_custkey"))
    lo.union(hi).distinct().withColumn("op", lit("union"))
      .unionByName(lo.intersect(hi).withColumn("op", lit("intersect")))
      .unionByName(lo.except(hi).withColumn("op", lit("except")))
      .orderBy(col("op"), col("c_custkey"))
  }

  /** W6 analytic windows: lag/lead day-over-day deltas on the daily order
    * count — one shuffle-free window over an ordered aggregate. */
  def dailyOrderDeltas(spark: SparkSession, dir: String): DataFrame = {
    // bounded input: the global lag window reads per-day AGGREGATE rows
    // (≤ |distinct order dates|), never the orders table itself.
    val w = Window.orderBy(col("d"))
    Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - coalesce(col("prev_n"), lit(0L)))
      .orderBy(col("d"))
  }

  /** §2.4 grouping sets: ROLLUP over (returnflag, linestatus) — subtotal
    * and grand-total rows come from the same single-pass hash aggregate. */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        Money.sumMoney(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_price"))
      .orderBy(col("flag"), col("status"))

  /** Skew-safe two-phase count over the return-flag key
    * (`salted_group_count` query) — value-identical to a direct
    * groupBy-count for any distribution; the oracle IS the direct
    * GROUP BY, proving the equivalence. */
  def saltedGroupCount(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedCount(Tables.lineitem(spark, dir), col("l_returnflag"))
      .orderBy(col("key"))

  /** Salted replicate-join of supplier against the small nation dim
    * (`salted_join_agg` query), aggregated per nation — value-identical
    * to the plain equi-join the oracle runs. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nationkey"), col("s_suppkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("nationkey"), col("n_name"))
    Skew.saltedJoin(supp, nat, "nationkey")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy(col("n_name"))
  }

  /** CUBE over (returnflag, linestatus) (`pricing_cube` query): all four
    * grouping-set combinations in one pass — same shuffle as the rollup,
    * wider grouping-id expansion. */
  def pricingCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        Money.sumMoney(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_price"))
      .orderBy(col("flag"), col("status"))

  /** Exact interpolated percentiles of order totals per priority
    * (`order_percentiles` query). `percentile` (exact, linear
    * interpolation) — not `percentile_approx` — so DuckDB's
    * `quantile_cont` computes the identical value; both sides round to
    * cents for a stable hash. At 100 TB use `percentile_approx` and a
    * rows-only check instead — the exact form is the oracle-able
    * baseline, same pairing as the dedup suite. */
  def orderPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** The 100 TB percentile swap (`order_percentiles_approx` query):
    * `percentile_approx` (t-digest-style sketch, single pass, mergeable
    * partials) in the same shape as [[orderPercentiles]]. Engine-specific
    * values — rows-only driver check; RelationalSpec bounds the error
    * against the exact form. */
  def orderPercentilesApprox(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr(s"percentile_approx(o_totalprice, 0.5, $accuracy)"), 2).as("p50"),
        round(expr(s"percentile_approx(o_totalprice, 0.9, $accuracy)"), 2).as("p90"),
        round(expr(s"percentile_approx(o_totalprice, 0.99, $accuracy)"), 2).as("p99"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
}
