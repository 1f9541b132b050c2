package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the URL canonicalization contract step by step. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("case, default port, fragment, tracking params, param order") {
    assert(canon("https://Example.COM:443/Path?utm_source=x&b=2&a=1#frag") ==
      Seq("https://example.com/Path?a=1&b=2"))
    assert(canon("HTTP://example.com:80/a") == Seq("http://example.com/a"))
  }

  test("non-default ports and other schemes keep their port") {
    assert(canon("http://example.com:8080/x") == Seq("http://example.com:8080/x"))
    assert(canon("ftp://Files.example.com:21/pub") == Seq("ftp://files.example.com:21/pub"))
    // :443 is only default for https, :80 only for http
    assert(canon("http://example.com:443/x") == Seq("http://example.com:443/x"))
  }

  test("path normalization: empty -> /, trailing slashes drop, interior kept") {
    assert(canon("https://example.com") == Seq("https://example.com/"))
    assert(canon("https://example.com/") == Seq("https://example.com/"))
    assert(canon("https://example.com/a/b///") == Seq("https://example.com/a/b"))
    assert(canon("https://example.com//a//b") == Seq("https://example.com//a//b"))
  }

  test("query handling: empties drop, tracking-only query drops the ?") {
    assert(canon("https://e.com/a?fbclid=1") == Seq("https://e.com/a"))
    assert(canon("https://e.com/a?gclid=1&utm_campaign=c&q=x") ==
      Seq("https://e.com/a?q=x"))
    assert(canon("https://e.com/a?z=1&y=2&") == Seq("https://e.com/a?y=2&z=1"))
    // a param merely CONTAINING 'utm_' later isn't tracking
    assert(canon("https://e.com/a?xutm_b=1") == Seq("https://e.com/a?xutm_b=1"))
  }

  test("scheme-less inputs pass through trimmed and defragmented") {
    assert(canon(" relative/path#section ") == Seq("relative/path"))
    assert(canon("mailto:user@example.com") == Seq("mailto:user@example.com"))
  }

  test("canonicalization is idempotent") {
    val fixture = graft.UrlFixture.urls.map(_._2)
    val once = canon(fixture: _*)
    assert(canon(once: _*) == once)
  }

  private def regDom(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.registeredDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("registeredDomain: subdomains collapse to eTLD+1") {
    assert(regDom("https://news.example.com/a", "http://blog.example.com/b",
      "https://example.com/c", "https://a.b.c.example.com/d") ==
      Seq("example.com", "example.com", "example.com", "example.com"))
  }

  test("registeredDomain: two-label public suffixes keep their third label") {
    assert(regDom("https://archive.foo.co.uk/x", "https://foo.co.uk/y",
      "https://deep.sub.bar.com.au/z") ==
      Seq("foo.co.uk", "foo.co.uk", "bar.com.au"))
  }

  test("registeredDomain: userinfo and port strip; IPv4 and bare hosts pass") {
    assert(regDom("https://user:pw@News.Example.COM:8443/a") == Seq("example.com"))
    assert(regDom("http://192.168.0.1:8080/x") == Seq("192.168.0.1"))
    assert(regDom("http://localhost/x") == Seq("localhost"))
  }

  test("registeredDomain: PSL private registries are public suffixes") {
    // github.io / blogspot.com are PRIVATE-section PSL rules: every user
    // site is its own registrable domain — the r9 subset collapsed all
    // of github.io into one capped "domain".
    assert(regDom("https://alice.github.io/blog", "https://www.alice.github.io/a",
      "https://bob.github.io/", "https://cool.blogspot.com/p/1") ==
      Seq("alice.github.io", "alice.github.io", "bob.github.io",
        "cool.blogspot.com"))
  }

  test("registeredDomain: ccTLD second-level registries beyond the r9 subset") {
    assert(regDom("https://shop.acme.com.sg/x", "https://x.y.co.il/y",
      "https://uni.ac.at/z") ==
      Seq("acme.com.sg", "y.co.il", "uni.ac.at"))
  }

  test("registeredDomain: wildcard and exception rules (*.ck / !www.ck)") {
    // *.ck makes foo.ck a public suffix → bar.foo.ck registrable;
    // !www.ck overrides the wildcard → www.ck itself registrable.
    assert(regDom("https://bar.foo.ck/a", "https://www.ck/b",
      "https://sub.www.ck/c") ==
      Seq("bar.foo.ck", "www.ck", "www.ck"))
  }

  test("registeredDomain: a host that IS a public suffix maps to itself") {
    assert(regDom("https://co.uk/", "https://github.io/") ==
      Seq("co.uk", "github.io"))
  }

  test("spamScore: an empty weight list scores 0.0, in both engines' builders") {
    val s = Seq("https://fun.example.com/casino").toDF("url")
      .select(Urls.spamScore(col("url"), Seq.empty).as("s"))
      .head().getDouble(0)
    assert(s == 0.0)
    assert(Urls.sqlSpamScore("url", Seq.empty) == "0.0")
  }

  test("spamScore: substring hits sum; halves need a second signal (r10)") {
    val scores = Seq(
      "https://fun.example.com/casino-bonus",       // 1.0 blocking
      "https://x.example.com/free-download/poker",  // 0.5 + 0.5 additive
      "https://x.example.com/betting-tips",         // 0.5 alone
      "https://news.example.com/article/42",        // clean
      null)                                         // null url -> 0.0
      .toDF("url").select(Urls.spamScore(col("url")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(scores == Seq(1.0, 1.0, 0.5, 0.0, 0.0), scores)
  }

  test("domainCaps: exactly the cap survives per registered domain, best-first") {
    val docs = (1L to 40L).map { i =>
      val host = if (i % 4 == 0) "example.com"
                 else if (i % 2 == 0) "news.example.com"
                 else "data.openweb.org"
      (i, s"https://$host/p/$i", 1000 - i)
    }.toDF("id", "url", "len")
    val out = graft.pipeline.Curation
      .domainCaps(docs, "url", 3, Seq(col("len").desc, col("id").asc))
      .select($"id", $"domain", $"rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    // 20 docs under example.com (both hosts merged), 20 under openweb.org;
    // cap 3 keeps the three longest (= lowest ids) of each.
    assert(out.count(_._2 == "example.com") == 3)
    assert(out.count(_._2 == "openweb.org") == 3)
    assert(out.filter(_._2 == "example.com").map(_._1).sorted == Seq(2L, 4L, 6L))
    assert(out.filter(_._2 == "openweb.org").map(_._1).sorted == Seq(1L, 3L, 5L))
  }
}
