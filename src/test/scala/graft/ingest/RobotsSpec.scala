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

  private def decideWith(wrules: Seq[(String, String, String)],
                         urls: (Long, String)*): Map[Long, Boolean] =
    Robots.decisions(urls.toDF("doc_id", "url"), "url",
        wrules.toDF("host", "rule", "prefix"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("wildcard *: any-sequence match, mid-pattern (r10)") {
    val r = Seq(("w.example.com", "disallow", "/sec*/page/1*"))
    val d = decideWith(r,
      1L -> "https://w.example.com/sec5/page/12",   // matches
      2L -> "https://w.example.com/sec5/page/21",   // page not starting 1
      3L -> "https://w.example.com/other/page/12")  // no /sec prefix
    assert(d == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("wildcard $: trailing anchor binds end-of-path (r10)") {
    val r = Seq(("w.example.com", "disallow", "*44$"))
    val d = decideWith(r,
      1L -> "https://w.example.com/page/144",   // ends in 44
      2L -> "https://w.example.com/page/1440")  // 44 not at end
    assert(d == Map(1L -> false, 2L -> true))
  }

  test("specificity is raw pattern length: longer wildcard allow wins (r10)") {
    val r = Seq(("w.example.com", "disallow", "/sec*"),
      ("w.example.com", "allow", "/sec2/*"))
    val d = decideWith(r,
      1L -> "https://w.example.com/sec1/page/5",
      2L -> "https://w.example.com/sec2/page/5")
    assert(d == Map(1L -> false, 2L -> true))
  }

  test("regex metacharacters in patterns stay literal (r10)") {
    val r = Seq(("w.example.com", "disallow", "/a.b*"),
      ("w.example.com", "disallow", "/c+d$"))
    val d = decideWith(r,
      1L -> "https://w.example.com/a.b/x",  // literal dot matches
      2L -> "https://w.example.com/axb/x",  // '.' must NOT match 'x'
      3L -> "https://w.example.com/c+d",    // literal plus, anchored
      4L -> "https://w.example.com/c+dd")   // anchor rejects the tail
    assert(d == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("mid-pattern $ is literal; wildcard-free decisions unchanged (r10)") {
    val r = Seq(("w.example.com", "disallow", "/a$b"))
    val d = decideWith(r,
      1L -> "https://w.example.com/a$b/x",
      2L -> "https://w.example.com/ab/x")
    assert(d == Map(1L -> false, 2L -> true))
  }
  // ------------------------------------------------------- REP parsing

  test("parse: groups, exact-beats-star election, case, strays, comments") {
    val txt =
      """# policy file
        |Disallow: /stray-before-any-group
        |User-agent: graftbot
        |Disallow: /private   # inline comment
        |Allow: /private/ok
        |User-agent: *
        |Disallow: /
        |noise line without a field
        |""".stripMargin
    val rules = Robots.parse(
      Seq(("h1", txt)).toDF("host", "robots_txt"), "GraftBot")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // exact group wins; the star group and the pre-group stray drop
    assert(rules == Seq(("allow", "/private/ok"), ("disallow", "/private")))
  }

  test("parse: star group applies only when no exact group exists") {
    val txt =
      """User-agent: otherbot
        |Disallow: /other
        |User-agent: *
        |Allow: /docs
        |Disallow:
        |""".stripMargin
    val rules = Robots.parse(
      Seq(("h1", txt)).toDF("host", "robots_txt"), "graftbot")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // the bare Disallow passes through verbatim (evaluator no-ops it)
    assert(rules == Seq(("allow", "/docs"), ("disallow", "")))
  }

  test("parse: consecutive user-agent lines share one header") {
    val txt =
      """User-Agent: GraftBot
        |user-agent: otherbot
        |ALLOW: /shared
        |Disallow: /shared/no
        |User-agent: thirdbot
        |Disallow: /third
        |""".stripMargin
    val rules = Robots.parse(
      Seq(("h1", txt)).toDF("host", "robots_txt"), "graftbot")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules == Seq(("allow", "/shared"), ("disallow", "/shared/no")))
  }

  test("parse composes with decisions end-to-end from raw text") {
    val txt =
      """User-agent: graftbot
        |Disallow: /sec
        |Allow: /sec/open
        |""".stripMargin
    val rules = Robots.parse(
      Seq(("w.example.com", txt)).toDF("host", "robots_txt"), "graftbot")
    val d = Robots.decisions(Seq(
        (1L, "https://w.example.com/sec/hidden"),
        (2L, "https://w.example.com/sec/open/x"),
        (3L, "https://w.example.com/public")).toDF("doc_id", "url"),
      "url", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(d == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("parse: CRLF line endings and tab separators (the wire format)") {
    val txt = "User-agent: graftbot\r\nDisallow:\t/private\r\n" +
      "Allow: /private/ok\t\r\n"
    val rules = Robots.parse(
      Seq(("h1", txt)).toDF("host", "robots_txt"), "graftbot")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rules == Seq(("allow", "/private/ok"), ("disallow", "/private")))
  }

  test("sitemapPointers: global, case-preserved, deduped, total on null") {
    val txt =
      """User-agent: otherbot
        |Disallow: /
        |Sitemap: https://h1/SiteMap-A.xml
        |Sitemap: https://h1/SiteMap-A.xml
        |sitemap: https://h1/b.xml   # lowercase field, comment
        |""".stripMargin
    val locs = Robots.sitemapPointers(Seq(
        ("h1", txt), ("h2", null.asInstanceOf[String]))
      .toDF("host", "robots_txt"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(locs == Seq(("h1", "https://h1/SiteMap-A.xml"), ("h1", "https://h1/b.xml")))
  }

  test("crawlDelays: election, max-on-contradiction, fractional, invalid (r11)") {
    val txt =
      """User-agent: graftbot
        |Crawl-delay: 2
        |Crawl-delay: fast
        |Disallow: /x
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    val out = Robots.crawlDelays(
      Seq(("h1", txt)).toDF("host", "robots_txt"), "graftbot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // elected graftbot group: 2s wins, invalid drops, star's 10s never leaks
    assert(out == Map("h1" -> 2000L))
    val star =
      """User-agent: *
        |Crawl-delay: 0.5
        |Allow: /docs
        |Crawl-delay: 1.5
        |""".stripMargin
    val out2 = Robots.crawlDelays(
      Seq(("h2", star)).toDF("host", "robots_txt"), "graftbot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // star applies (no exact group); contradiction takes the max; 1.5s -> 1500
    assert(out2 == Map("h2" -> 1500L))
  }

  test("crawlDelays: an elected group without a delay yields NO row (r11)") {
    val txt =
      """User-agent: graftbot
        |Disallow: /tmp
        |User-agent: *
        |Crawl-delay: 9
        |""".stripMargin
    val out = Robots.crawlDelays(
      Seq(("h3", txt)).toDF("host", "robots_txt"), "graftbot")
    // graftbot's group is elected and declares none; the star group's 9s
    // must not apply — consumers fall back to their default
    assert(out.count() == 0)
  }
}
