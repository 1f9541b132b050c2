package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the compliance trio's one-pass flags frame: each leg's verdict,
  * the sweep conjunction, cumulative funnel arithmetic, and the
  * null-domain keep rule. */
class ComplianceSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: clean; doc 2: taken down; doc 3: blocked domain; doc 4:
  // robots-disallowed path; doc 5: taken down AND blocked (counts once
  // per cumulative stage); doc 6: null-ish url -> null domain, kept by
  // the blocklist leg and allowed by robots (unlisted host).
  private def docs = Seq(
    (1L, "https://ok.example.org/a", "alpha text"),
    (2L, "https://ok.example.org/b", "taken down text"),
    (3L, "https://bad.example.com/c", "beta text"),
    (4L, "https://rules.example.org/private/x", "gamma text"),
    (5L, "https://bad.example.com/d", "taken down text"),
    (6L, "not-a-url", "delta text")
  ).toDF("doc_id", "url", "text")

  private def takedowns = docs.filter($"doc_id" === 2L)
    .select(md5($"text").as("h"))
  private def blocked = Seq("example.com").toDF("domain")
  private def rules = Seq(("rules.example.org", "disallow", "/private"))
    .toDF("host", "rule", "prefix")

  test("flags: each leg judges independently; sweep keeps the conjunction") {
    val fl = Compliance.flags(docs, "doc_id", "url", "text",
        takedowns, blocked, rules)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("f_takedown"), r.getAs[Boolean]("f_blocklist"),
          r.getAs[Boolean]("f_robots"))).toMap
    assert(fl(1L) == ((true, true, true)))
    assert(fl(2L) == ((false, true, true)))   // content-hash takedown
    assert(fl(3L) == ((true, false, true)))   // eTLD+1 blocked
    assert(fl(4L) == ((true, true, false)))   // robots path
    assert(fl(5L) == ((false, false, true)))  // two legs at once
    assert(fl(6L) == ((true, true, true)))    // null domain keeps
    val kept = Compliance.sweep(docs, "doc_id", "url", "text",
        takedowns, blocked, rules)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("funnel: cumulative counts in sweep order, one row") {
    val row = Compliance.funnel(docs, "doc_id", "url", "text",
      takedowns, blocked, rules).collect().head
    assert(row.getLong(0) == 6L)  // raw
    assert(row.getLong(1) == 4L)  // after takedowns: 2 and 5 drop
    assert(row.getLong(2) == 3L)  // after blocklist: 3 drops too
    assert(row.getLong(3) == 2L)  // after robots: 4 drops too
  }

  test("duplicate takedown hashes do not duplicate rows (mark-join dedup)") {
    val dupTd = takedowns.unionByName(takedowns)
    val n = Compliance.flags(docs, "doc_id", "url", "text",
      dupTd, blocked, rules).count()
    assert(n == 6L)
  }
}
