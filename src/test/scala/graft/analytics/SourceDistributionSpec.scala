package graft.analytics

import graft.SparkSpec

class SourceDistributionSpec extends SparkSpec {
  import spark.implicits._

  test("missing source -> 'Unknown', pct of total, count-desc order") {
    val docs = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None)
      .toDF("source")
    val out = SourceDistribution(docs).as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 3L, 60.0), ("Unknown", 1L, 20.0), ("b", 1L, 20.0)))
  }

  test("tie order is source-ascending") {
    val docs = Seq("b", "a", "c", "a", "b", "c").toDF("source")
    val out = SourceDistribution(docs).as[(String, Long, Double)].collect().map(_._1).toSeq
    assert(out == Seq("a", "b", "c"))
  }
}
