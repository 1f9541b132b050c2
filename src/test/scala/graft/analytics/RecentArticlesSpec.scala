package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecentArticlesSpec extends SparkSpec {
  import spark.implicits._

  test("top-k by recency with deterministic tie-break") {
    val df = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (4L, 30.0)).toDF("id", "crawled_at")
    val out = RecentArticles(df, 2, col("crawled_at").desc, col("id").asc)
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((2L, 30.0), (4L, 30.0)))
  }

  test("k larger than input returns everything") {
    val df = Seq((1L, 1.0)).toDF("id", "crawled_at")
    assert(RecentArticles(df, 5, col("crawled_at").desc).count() == 1)
  }

  test("plan is TakeOrderedAndProject (no global sort at scale)") {
    val df = spark.range(1000).toDF("id")
    val plan = RecentArticles(df, 3, col("id").desc).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
