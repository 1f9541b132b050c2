package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Output layout for scale (SURVEY §4 "partition pruning"): corpus tables
  * written `partitionBy` a low-cardinality dimension let per-dimension
  * queries read only their directories. Also a format round-trip: ingest
  * records survive parquet/json/csv (the free built-in sources). */
class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy(source) write → filtered scan prunes partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.partitionBy("source").parquet(s"$out/docs")
    val q = spark.read.parquet(s"$out/docs")
      .filter($"source" === "src3")
      .select($"doc_id")
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val scanPart = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanPart.contains("source"), scanPart)
    // the predicate is a partition filter, not a data filter
    assert(plan.linesIterator.find(_.contains("PushedFilters"))
      .forall(!_.contains("src3")), plan)
    assert(q.count() > 0)
  }

  test("ingest records round-trip parquet, json, and csv") {
    val out = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val recs = Seq(
      ("T1", "https://ex.com/1", "body\nwith newline", "https://ex.com/l", "2024-01-01", 1.7e9),
      ("T2", "https://ex.com/2", "plain", "https://ex.com/l", null, 1.7e9))
      .toDF("title", "sources", "content", "source", "published_at", "crawled_at")
    recs.write.parquet(s"$out/p")
    recs.write.json(s"$out/j")
    recs.write.option("header", "true").option("escape", "\"").csv(s"$out/c")
    val p = spark.read.parquet(s"$out/p")
    val j = spark.read.json(s"$out/j")
    val c = spark.read.option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(s"$out/c")
    assert(p.count() == 2 && j.count() == 2 && c.count() == 2)
    assert(p.orderBy("sources").select("content").as[String].head() == "body\nwith newline")
    assert(c.orderBy("sources").select("content").as[String].head() == "body\nwith newline")
  }
}
