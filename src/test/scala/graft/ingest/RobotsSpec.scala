package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the robots longest-prefix-match decision table branch by branch;
  * the end-to-end values are hash-checked against the DuckDB mirror by
  * the driver gate (`robots_exclusion`). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    ("a.example.com", "disallow", "/"),
    ("b.example.com", "disallow", "/private"),
    ("b.example.com", "allow", "/private/press"),
    ("c.example.com", "disallow", "/x"),
    ("c.example.com", "allow", "/x")).toDF("host", "rule", "prefix")

  private def decide(urls: (Long, String)*): Map[Long, Boolean] =
    Robots.decisions(urls.toDF("doc_id", "url"), "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("whole-host disallow blocks every path on that host only") {
    val d = decide(1L -> "https://a.example.com/",
      2L -> "https://a.example.com/deep/page",
      3L -> "https://other.example.com/deep/page")
    assert(d == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("longer allow punches through a disallow prefix") {
    val d = decide(1L -> "https://b.example.com/private/cash",
      2L -> "https://b.example.com/private/press/2024",
      3L -> "https://b.example.com/public")
    assert(d == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("equal-length match: allow wins the tie") {
    val d = decide(1L -> "https://c.example.com/x/anything")
    assert(d == Map(1L -> true))
  }

  test("no matching rule and empty rules table both mean allowed") {
    val d = decide(1L -> "https://b.example.com/elsewhere")
    assert(d(1L))
    val none = Robots.decisions(
      Seq((9L, "https://a.example.com/")).toDF("doc_id", "url"), "url",
      rules.filter(lit(false)))
    assert(none.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap ==
      Map(9L -> true))
  }

  test("path extraction: empty path reads as /, query/fragment ignored") {
    // disallow "/" must block the bare-host URL too
    val d = decide(1L -> "https://a.example.com",
      2L -> "https://b.example.com/private?x=1#frag")
    assert(d == Map(1L -> false, 2L -> false))
  }

  test("REP bare 'Disallow:' (empty prefix) is a no-op, not a host block") {
    val bare = Seq(("d.example.com", "disallow", "")).toDF("host", "rule", "prefix")
    val out = Robots.decisions(
        Seq((1L, "https://d.example.com/anything")).toDF("doc_id", "url"),
        "url", bare)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true), "empty disallow prefix must match nothing")
  }

  test("allowed() keeps exactly the allowed rows") {
    val docs = Seq(
      (1L, "https://a.example.com/p", "keep-me-not"),
      (2L, "https://z.example.com/p", "keep-me")).toDF("doc_id", "url", "text")
    val out = Robots.allowed(docs, "url", rules)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }
}
