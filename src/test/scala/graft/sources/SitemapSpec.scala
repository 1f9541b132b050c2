package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sitemap parser: tag extraction in any child order, the two
  * block kinds, entity decoding in locs, typed lastmod/priority, the
  * loc-less drop, and the index-entry metadata contract (nulls). */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("urlset: full tags, any order, entity-decoded loc, loc-less drops") {
    val xml =
      """<?xml version="1.0"?><urlset>
        |<url><lastmod>2024-03-05</lastmod><loc>https://a.org/p1</loc>
        |  <priority>0.8</priority><changefreq>daily</changefreq></url>
        |<url><loc> https://a.org/s?q=x&amp;p=2 </loc></url>
        |<url><changefreq>weekly</changefreq></url>
        |</urlset>""".stripMargin
    val out = Sitemap.entries(Seq((1L, xml)).toDF("site_id", "xml"))
      .collect()
    assert(out.length == 2)
    val full = out.find(_.getString(2) == "https://a.org/p1").get
    assert(full.getString(1) == "url")
    assert(full.getDate(3).toString == "2024-03-05")
    assert(full.getString(4) == "daily")
    assert(full.getDouble(5) == 0.8)
    // whitespace inside <loc> trims; &amp; decodes
    val esc = out.find(_.getString(2) == "https://a.org/s?q=x&p=2").get
    assert(esc.isNullAt(3) && esc.isNullAt(4) && esc.isNullAt(5))
  }

  test("sitemapindex: child pointers typed 'sitemap', metadata forced null") {
    val xml =
      """<sitemapindex>
        |<sitemap><loc>https://a.org/sm-1.xml</loc>
        |  <lastmod>2024-01-02</lastmod></sitemap>
        |<sitemap><loc>https://a.org/sm-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemap.entries(Seq((7L, xml)).toDF("site_id", "xml"))
      .collect()
    assert(out.length == 2)
    assert(out.forall(_.getString(1) == "sitemap"))
    assert(out.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    assert(out.count(!_.isNullAt(3)) == 1)
  }

  test("output is deterministically ordered by (site, kind, loc)") {
    val xml = "<urlset><url><loc>https://b.org/2</loc></url>" +
      "<url><loc>https://b.org/1</loc></url></urlset>" +
      "<sitemapindex><sitemap><loc>https://b.org/sm.xml</loc></sitemap></sitemapindex>"
    val locs = Sitemap.entries(Seq((1L, xml)).toDF("site_id", "xml"))
      .select(col("kind"), col("loc")).as[(String, String)].collect().toSeq
    assert(locs == Seq(
      ("sitemap", "https://b.org/sm.xml"),
      ("url", "https://b.org/1"), ("url", "https://b.org/2")))
  }

  test("frontier: canonical dedup across sitemaps, robots gate, fetch rank") {
    val sm1 =
      """<urlset>
        |<url><loc>https://a.org/x?utm_source=feed&amp;v=1</loc>
        |  <lastmod>2024-02-01</lastmod><priority>0.3</priority></url>
        |<url><loc>https://a.org/blocked/page</loc><priority>0.9</priority></url>
        |<url><loc>https://b.net/only</loc></url>
        |</urlset>""".stripMargin
    // the same page again (tracking param dropped by canonicalization),
    // fresher lastmod, stronger priority
    val sm2 =
      """<urlset>
        |<url><loc>https://a.org/x?v=1</loc>
        |  <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
        |<url><loc>https://a.org/y</loc><priority>0.8</priority></url>
        |</urlset>""".stripMargin
    val rules = Seq(("a.org", "disallow", "/blocked")).toDF("host", "rule", "prefix")
    val out = Sitemap.frontier(
      Seq((1L, sm1), (2L, sm2)).toDF("site_id", "xml"), rules)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getDate(3)).map(_.toString), r.getLong(4), r.getInt(5))).toSeq
    // /blocked dropped by robots; /x deduped (2 mentions, max lastmod,
    // max priority 0.8 -> 800); /y ties /x on priority, loc asc breaks;
    // b.net/only has no tags -> protocol default 0.5 -> 500
    assert(out == Seq(
      ("a.org", "https://a.org/x?v=1", 2L, Some("2024-03-01"), 800L, 1),
      ("a.org", "https://a.org/y", 1L, None, 800L, 2),
      ("b.net", "https://b.net/only", 1L, None, 500L, 1)))
  }

  test("null/empty xml and malformed dates are total, never throw") {
    val out = Sitemap.entries(Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "<url>no closing"),
      (4L, "<urlset><url><loc>https://c.org</loc>" +
        "<lastmod>not-a-date</lastmod></url></urlset>"),
      // shape-valid but out-of-range: the regex can't catch this — the
      // try_cast must (ANSI cast would throw)
      (5L, "<urlset><url><loc>https://d.org</loc>" +
        "<lastmod>2024-02-30</lastmod><priority>0.7</priority></url></urlset>")
    ).toDF("site_id", "xml")).collect()
    assert(out.length == 2)
    val c = out.find(_.getString(2) == "https://c.org").get
    assert(c.isNullAt(3))
    val d = out.find(_.getString(2) == "https://d.org").get
    assert(d.isNullAt(3) && d.getDouble(5) == 0.7)
  }
}
