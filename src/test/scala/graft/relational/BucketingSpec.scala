package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketing contract: a join between two tables bucketed on the
  * join key runs with NO exchange (the shuffle moved to write time). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed join has no Exchange in the plan and correct rows") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(orders, "b_orders", "o_orderkey")
      Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == orders.join(lineitem, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
