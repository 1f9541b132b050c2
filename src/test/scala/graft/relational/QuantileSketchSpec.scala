package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The integer quantile sketch's contracts: absolute-error bound vs the
  * exact interpolated percentiles, exact mergeability, and layout
  * invariance. Cross-engine value equality is the driver gate's job
  * (`order_percentiles_sketch` carries a full oracle). */
class QuantileSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val width = 10000L // $100 buckets

  private def sk = QuantileSketch.sketch(Tables.orders(spark, dir),
    QuantileSketch.cents(col("o_totalprice")), width, "o_orderpriority")

  test("estimates stay within the bucket-width error bound of exact") {
    // The histogram's guarantee: the estimate lands inside the bucket of
    // the EXACT rank-ceil(q·N) order statistic, so |est − value@rank| <
    // width. (Interpolated quantile_cont is NOT the comparison target:
    // between two adjacent order stats it can sit arbitrarily far from
    // either when data is sparse relative to the range — at sf0.001 a
    // priority group has ~300 values over a $550k span.)
    val est = QuantileSketch.quantiles(sk, width,
        Seq("p50c" -> 0.5, "p90c" -> 0.9, "p99c" -> 0.99), "o_orderpriority")
      .collect()
      .map(r => r.getString(0) -> Seq(r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val byGroup = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        QuantileSketch.cents(col("o_totalprice")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(est.nonEmpty && est.keySet == byGroup.keySet)
    est.foreach { case (k, ps) =>
      val sorted = byGroup(k)
      val n = sorted.length
      Seq(0.5, 0.9, 0.99).zip(ps).foreach { case (q, p) =>
        val r = math.ceil(q * n).toLong.max(1L)
        val atRank = sorted((r - 1).toInt)
        assert(math.abs(p - atRank) < width, s"$k q=$q: est $p vs value@rank $atRank")
      }
    }
  }

  test("sketch(a union b) == merge(sketch(a), sketch(b)) — incremental") {
    val ord = Tables.orders(spark, dir)
    def skOf(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.sketch(df, QuantileSketch.cents(col("o_totalprice")),
        width, "o_orderpriority")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val whole = rows(skOf(ord))
    val merged = rows(QuantileSketch.merge(
      skOf(ord.filter(col("o_orderkey") % 2 === 0)),
      skOf(ord.filter(col("o_orderkey") % 2 =!= 0))))
    assert(merged == whole)
  }

  test("estimate is invariant to input partitioning") {
    def est(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.quantiles(
          QuantileSketch.sketch(df, QuantileSketch.cents(col("o_totalprice")),
            width, "o_orderpriority"),
          width, Seq("p50c" -> 0.5), "o_orderpriority")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(est(Tables.orders(spark, dir)) ==
      est(Tables.orders(spark, dir).repartition(17)))
  }
}
