package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the hyperlink operators: the RFC-3986-subset resolver branch by
  * branch, the anchor extraction contract (opening-tag href, both quote
  * styles, tag-stripped inner text, unclosed anchors dropped), the
  * host-graph aggregation (self-loops dropped, multiplicity counted),
  * the cross-domain-only anchor-term profile, and TrustRank-over-real-
  * edges semantics (unreachable domains rank 0, seeds carry mass). */
class LinksSpec extends SparkSpec {
  import spark.implicits._

  private val base = "https://news.example.com/world/politics/story.html"

  private def resolveOne(b: String, h: String): Option[String] = {
    val r = Seq((Option(b), Option(h))).toDF("b", "h")
      .select(Links.resolve(col("b"), col("h")).as("r"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("resolve: every branch of the contract") {
    // absolute http(s) passes through untouched (case-insensitive scheme)
    assert(resolveOne(base, "https://other.net/a?b=c").contains("https://other.net/a?b=c"))
    assert(resolveOne(base, "HTTP://other.net/a").contains("HTTP://other.net/a"))
    // other schemes drop
    assert(resolveOne(base, "javascript:void(0)").isEmpty)
    assert(resolveOne(base, "mailto:x@y.z").isEmpty)
    assert(resolveOne(base, "tel:+1-555").isEmpty)
    // scheme-relative takes the base scheme
    assert(resolveOne(base, "//cdn.example.com/lib.js")
      .contains("https://cdn.example.com/lib.js"))
    // root-relative takes the origin
    assert(resolveOne(base, "/about").contains("https://news.example.com/about"))
    // path-relative resolves against the base path's directory
    assert(resolveOne(base, "next.html")
      .contains("https://news.example.com/world/politics/next.html"))
    // a base with no path directory resolves relative against "/"
    assert(resolveOne("https://x.org", "a.html").contains("https://x.org/a.html"))
    // fragment-only / query-only / empty drop (host-level self-loops)
    assert(resolveOne(base, "#top").isEmpty)
    assert(resolveOne(base, "?page=2").isEmpty)
    assert(resolveOne(base, "").isEmpty)
    // surrounding whitespace is trimmed before classification
    assert(resolveOne(base, "  /about  ").contains("https://news.example.com/about"))
    // a colon in the first segment reads as a scheme (RFC: write ./a:b)
    assert(resolveOne(base, "weird:path").isEmpty)
    // unresolvable base: relative forms drop, absolute hrefs survive
    assert(resolveOne("not a url", "/about").isEmpty)
    assert(resolveOne("not a url", "https://ok.org/x").contains("https://ok.org/x"))
    // nulls are total
    assert(resolveOne(null, "/about").isEmpty)
    assert(resolveOne(base, null).isEmpty)
  }

  test("resolve: dot segments fold with CPython-urljoin semantics (r11)") {
    // Every expected value below is the VERBATIM output of CPython
    // 3.11's urllib.parse.urljoin on the same (base, href) pair — the
    // reference's resolver (crawl.py urljoin usage) probed directly.
    val pins = Seq(
      ("http://h/dir/sub/page.html", "../x") -> "http://h/dir/x",
      ("http://h/dir/", "../../../x") -> "http://h/x", // pops past root ignored
      ("http://h/dir/", "./a/./b/../c") -> "http://h/dir/a/c",
      ("http://h/a/", "b/..") -> "http://h/a/", // trailing .. → trailing slash
      ("http://h/a/", "b/.") -> "http://h/a/b/",
      ("http://h/d/e/", "..") -> "http://h/d/",
      ("http://h/d/e/", ".") -> "http://h/d/e/",
      ("http://h/d/e", "..") -> "http://h/",
      // path-relative merges (only) filter inner empty segments
      ("http://h/a//b/", "../c") -> "http://h/a/c",
      ("http://h/a//b/", "../../c") -> "http://h/c",
      ("http://h/d/", "a//b") -> "http://h/d/a/b",
      // root-relative: dot removal, NO empty filtering
      ("http://h", "/../x") -> "http://h/x",
      ("http://h/base/", "/a//b/../c") -> "http://h/a//c",
      // the query/fragment tail rides along untouched — a '/' inside
      // it is data, not path
      ("http://h/d/", "a/../b?q=/x/../y#f/.") -> "http://h/d/b?q=/x/../y#f/.",
      // absolute and protocol-relative hrefs pass through UNnormalized
      ("http://h/a", "http://x/p/../q") -> "http://x/p/../q",
      ("http://h/a", "//cdn.net/p/../q") -> "http://cdn.net/p/../q")
    pins.foreach { case ((b, h), want) =>
      assert(resolveOne(b, h).contains(want), s"base=$b href=$h")
    }
  }

  test("anchors: opening-tag href only, both quote styles, stripped text") {
    val html =
      """<p>intro</p>
        |<a class="x" href="https://a.org/1">Read <b>more</b> here</a>
        |<a href='/rel'>single quoted</a>
        |<a href="https://b.org/2">text with href="https://trap.org" inside</a>
        |<a name="anchor">no href at all</a>
        |<a href="https://c.org/unclosed">never closed
        |""".stripMargin
    val out = Seq(html).toDF("html")
      .select(explode(Links.anchors(col("html"))).as("a"))
      .select(col("a.href"), col("a.atext"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("https://a.org/1", "Read more here"),
      ("/rel", "single quoted"),
      ("https://b.org/2", "text with href=\"https://trap.org\" inside"),
      ("", "no href at all")))
  }

  test("anchors: data-href/ng-href/xlink:href never read as the link") {
    val html =
      """<a data-href="https://tracker.example/x">tracked button</a>
        |<a ng-href='https://ng.example/y'>angular</a>
        |<a xlink:href="https://svg.example/z">svg-style</a>
        |<a data-href="https://tracker.example/x" href="/real">both</a>
        |""".stripMargin
    val out = Seq(html).toDF("html")
      .select(explode(Links.anchors(col("html"))).as("a"))
      .select(col("a.href")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("", "", "", "/real"))
  }

  test("hostGraph: domain collapse, self-loops dropped, multiplicity counted") {
    val docs = Seq(
      // two links to openweb.org (multiplicity 2), one internal self-loop
      (1L, "https://news.example.com/a",
        """<a href="https://mirror.openweb.org/x">one</a>
          |<a href="//data.openweb.org/y">two</a>
          |<a href="/internal">self</a>""".stripMargin),
      // subdomain source collapses onto example.com; cross to foo.co.uk
      (2L, "https://blog.example.com/b",
        """<a href="https://archive.foo.co.uk/z">three</a>""")
    ).toDF("doc_id", "url", "html")
    val g = Links.hostGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(g == Seq(
      ("example.com", "foo.co.uk", 1L),
      ("example.com", "openweb.org", 2L)))
  }

  test("anchorTerms: cross-domain texts only, top-k by count then token") {
    val docs = Seq(
      (1L, "https://a.example.com/1",
        """<a href="https://docs.data.net/x">spark guide</a>
          |<a href="https://docs.data.net/y">spark api</a>
          |<a href="/self">own navigation words</a>""".stripMargin),
      (2L, "https://b.example.com/2",
        """<a href="https://docs.data.net/z">Spark tutorial</a>""")
    ).toDF("doc_id", "url", "html")
    val t = Links.anchorTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    // "spark" appears 3x (lowercased), ties broken token-asc at n=1
    assert(t == Seq(
      ("data.net", "spark", 3L, 1),
      ("data.net", "api", 1L, 2)))
  }

  test("webTrustRankUntil: seeds carry mass, unreachable domains rank 0") {
    // seed -> mid -> sink, plus an isolated pair never reached by trust
    val docs = Seq(
      (1L, "https://trusted.org/a", """<a href="https://mid.net/x">m</a>"""),
      (2L, "https://mid.net/b", """<a href="https://sink.io/y">s</a>"""),
      (3L, "https://spam-a.biz/c", """<a href="https://spam-b.biz/z">p</a>""")
    ).toDF("doc_id", "url", "html")
    val r = Links.webTrustRankFixed(docs, Seq("trusted.org"), iterations = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet ==
      Set("trusted.org", "mid.net", "sink.io", "spam-a.biz", "spam-b.biz"))
    assert(r("trusted.org") > 0L)
    assert(r("mid.net") > 0L && r("sink.io") > 0L)
    // trust decays with distance from the seed
    assert(r("trusted.org") > r("mid.net") && r("mid.net") > r("sink.io"))
    assert(r("spam-a.biz") == 0L && r("spam-b.biz") == 0L)
  }

  test("webTrustRankUntil (production tolerance face): bit-identical to the " +
      "fixed twin at the stop round (r14)") {
    val docs = Seq(
      (1L, "https://trusted.org/a", """<a href="https://mid.net/x">m</a>"""),
      (2L, "https://mid.net/b", """<a href="https://sink.io/y">s</a>"""),
      (3L, "https://spam-a.biz/c", """<a href="https://spam-b.biz/z">p</a>""")
    ).toDF("doc_id", "url", "html")
    val tol = Links.webTrustRankUntil(docs, Seq("trusted.org"),
        tolFp = 1000000L, maxIterations = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val stop = tol.head._3
    assert(tol.forall(_._3 == stop), "one stop round for the whole vector")
    assert(stop >= 1 && stop < 10,
      s"the fixture chain must stop EARLY to demonstrate anything: $stop")
    val fixedAtStop = Links.webTrustRankFixed(docs, Seq("trusted.org"),
        iterations = stop.toInt)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(tol.map(t => (t._1, t._2)).toSeq == fixedAtStop.toSeq,
      "tolerance-stopped vector must equal fixed(iterations = stop)")
  }

  test("webSpamMass: domains unreached by seed trust carry FULL spam mass; " +
      "each chain stops on its own curve (r14)") {
    val docs = Seq(
      (1L, "https://trusted.org/a", """<a href="https://mid.net/x">m</a>"""),
      (2L, "https://mid.net/b", """<a href="https://sink.io/y">s</a>"""),
      (3L, "https://spam-a.biz/c", """<a href="https://spam-b.biz/z">p</a>""")
    ).toDF("doc_id", "url", "html")
    val r = Links.webSpamMass(docs, Seq("trusted.org"),
        tolFp = 100000000000L, maxIterations = 10)
      .collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    // every node holds teleport PageRank mass, but trust reaches only
    // the seed's forward cone — the isolated pair is 100% spam mass
    assert(r("spam-b.biz")._1 > 0L && r("spam-b.biz")._2 == 0L)
    assert(r("spam-b.biz")._3 == 1000000L, s"full spam ppm: ${r("spam-b.biz")}")
    assert(r("spam-a.biz")._3 == 1000000L)
    // the seed itself is trust-saturated: tr >= pr, so ppm = 0
    assert(r("trusted.org")._3 == 0L, s"seed must carry 0 ppm: ${r("trusted.org")}")
    // one stop round per CHAIN, shared by all rows
    assert(r.values.map(_._4).toSet.size == 1)
    assert(r.values.map(_._5).toSet.size == 1)
  }

  test("webSpamMassFromHostGraph: the maintained-state run is bit-equal " +
      "to the full recompute (incremental == batch, r15)") {
    val docs = Seq(
      (1L, "https://trusted.org/a", """<a href="https://mid.net/x">m</a>"""),
      (2L, "https://mid.net/b", """<a href="https://sink.io/y">s</a>"""),
      (3L, "https://spam-a.biz/c", """<a href="https://spam-b.biz/z">p</a>"""),
      (4L, "https://mid.net/c", """<a href="https://sink.io/w">s2</a>""")
    ).toDF("doc_id", "url", "html")
    // the split cuts the duplicated (mid.net -> sink.io) edge across the
    // two batches, so mergeEdges' additivity is load-bearing
    val state = Links.mergeEdges(
      Links.hostGraph(docs.filter($"doc_id" <= 2))
        .unionByName(Links.hostGraph(docs.filter($"doc_id" > 2))))
    val inc = Links.webSpamMassFromHostGraph(state, Seq("trusted.org"),
      tolFp = 100000000000L, maxIterations = 10).collect().toSeq
    val full = Links.webSpamMass(docs, Seq("trusted.org"),
      tolFp = 100000000000L, maxIterations = 10).collect().toSeq
    assert(inc == full)
  }

  test("hostCommunities: disjoint link clusters get distinct communities; " +
      "churn-stop fires before the rail (r14)") {
    // two disjoint TRIANGLE clusters — LPA must never merge them, and
    // symmetrized odd cycles settle to zero churn inside the rail (a
    // 2-node pair would oscillate forever: the synchronous-LPA
    // even-cycle trap the graft.analytics.Lpa scaladoc documents)
    val docs = Seq(
      (1L, "https://a1.org/x", """<a href="https://a2.net/y">1</a>"""),
      (2L, "https://a2.net/y", """<a href="https://a3.co/z">2</a>"""),
      (3L, "https://a3.co/z", """<a href="https://a1.org/x">3</a>"""),
      (4L, "https://b1.io/x", """<a href="https://b2.dev/y">4</a>"""),
      (5L, "https://b2.dev/y", """<a href="https://b3.app/z">5</a>"""),
      (6L, "https://b3.app/z", """<a href="https://b1.io/x">6</a>""")
    ).toDF("doc_id", "url", "html")
    val r = Links.hostCommunities(docs, maxChurn = 0L, maxRounds = 8)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val byDomain = r.map(t => t._1 -> t._2).toMap
    val aSet = Set("a1.org", "a2.net", "a3.co")
    val bSet = Set("b1.io", "b2.dev", "b3.app")
    assert(byDomain.keySet == aSet ++ bSet)
    assert(aSet.map(byDomain).size == 1, s"one a-community: $byDomain")
    assert(bSet.map(byDomain).size == 1, s"one b-community: $byDomain")
    assert(byDomain("a1.org") != byDomain("b1.io"),
      "disjoint clusters must not merge")
    // community names are member domains (the id-lift totality claim)
    assert(aSet.contains(byDomain("a1.org")))
    assert(bSet.contains(byDomain("b1.io")))
    val stop = r.head._3
    assert(r.forall(_._3 == stop) && stop >= 1 && stop < 8,
      s"zero-churn settlement must land before the rail: $stop")
  }

  test("webTrustRankUntil requires a seed inside the extracted graph") {
    val docs = Seq(
      (1L, "https://a.org/1", """<a href="https://b.org/2">x</a>""")
    ).toDF("doc_id", "url", "html")
    intercept[IllegalArgumentException] {
      Links.webTrustRankUntil(docs, Seq.empty)
    }
    intercept[Exception] {
      Links.webTrustRankUntil(docs, Seq("absent.example")).collect()
    }
  }

  test("canonicalHref: attribute order, quote styles, decoys, first wins (r11)") {
    def one(html: String): Option[String] = {
      val r = Seq(html).toDF("h")
        .select(Links.canonicalHref(col("h")).as("c")).collect().head
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(one("""<link rel="canonical" href="https://a.org/x">""")
      .contains("https://a.org/x"))
    assert(one("""<link href='https://a.org/y' rel='canonical'>""")
      .contains("https://a.org/y"))
    // decoys: alternate rel, stylesheet, rel value inside href
    assert(one("""<link rel="alternate" href="/feed">""").isEmpty)
    assert(one("""<link rel="stylesheet" href="canonical.css">""").isEmpty)
    // first canonical wins over later declarations
    assert(one("""<link rel="canonical" href="/first">
                  <link rel="canonical" href="/second">""").contains("/first"))
    // empty href reads as undeclared; no link tags at all too
    assert(one("""<link rel="canonical" href="">""").isEmpty)
    assert(one("<p>no head</p>").isEmpty)
    // rel is a token list (r12): canonical matches as a token, and a
    // token that merely CONTAINS it does not
    assert(one("""<link rel="canonical alternate" href="/tok">""")
      .contains("/tok"))
    assert(one("""<link rel='alternate canonical' href='/tok2'>""")
      .contains("/tok2"))
    assert(one("""<link rel="noncanonical" href="/no">""").isEmpty)
  }

  test("canonicalDedup: null page URL surfaces as its own sentinel cluster (r12)") {
    val docs = Seq(
      (1L, "https://ex.com/a", """<link rel="canonical" href="/a">"""),
      (2L, null.asInstanceOf[String], "<p>fetch lost its URL</p>"))
      .toDF("doc_id", "url", "html")
    val out = Links.canonicalDedup(docs).collect()
    assert(out.length == 2, "out-of-contract rows must stay visible")
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getString(2) == "urn:graft:null-url:2" &&
      r2.getLong(3) == 2L && r2.getInt(4) == 1,
      "null-URL doc = its own cluster, keeper itself")
  }

  test("canonicalDedup: clusters by resolved target, self-canonical keeps (r11)") {
    val docs = Seq(
      // 1 is a mobile variant declaring 2's URL canonical; 2 is
      // self-canonical with a utm param canonicalize strips — 2 keeps.
      // (A ?utm-only variant would ALSO read self-canonical after
      // canonicalization — same page spelling — so the variant here
      // has a genuinely different path.)
      (1L, "https://m.ex.com/article-amp",
        """<link rel="canonical" href="https://ex.com/article">"""),
      (2L, "https://ex.com/article",
        """<link rel="canonical" href="https://ex.com/article?utm_campaign=x">"""),
      // 3/4 share a syndication target neither owns: min doc id keeps
      (3L, "https://m.ex.com/a3",
        """<link href='//orig.net/story/7' rel='canonical'>"""),
      (4L, "https://amp.ex.com/a4",
        """<link rel="canonical" href="https://orig.net/story/7">"""),
      // 5 has no declaration: its own cluster; 6's canonical is
      // non-http (dropped by resolve) -> falls back to its own URL
      (5L, "https://ex.com/solo", "<p>nothing</p>"),
      (6L, "https://ex.com/weird",
        """<link rel="canonical" href="mailto:x@y.z">"""),
      // 7's canonical is path-relative with a dot segment: the r11
      // resolver folds it, landing 7 in 5's cluster
      (7L, "https://ex.com/dir/page",
        """<link rel="canonical" href="../solo">""")).toDF("doc_id", "url", "html")
    val out = Links.canonicalDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(out(1L) == ("https://ex.com/article", 2L, 0))
    assert(out(2L) == ("https://ex.com/article", 2L, 1),
      "the self-canonical original must keep")
    assert(out(3L)._1 == "https://orig.net/story/7")
    assert(out(3L) == ("https://orig.net/story/7", 3L, 1))
    assert(out(4L) == ("https://orig.net/story/7", 3L, 0))
    assert(out(5L) == ("https://ex.com/solo", 5L, 1))
    assert(out(6L) == ("https://ex.com/weird", 6L, 1),
      "non-http canonical falls back to the page's own URL")
    assert(out(7L) == ("https://ex.com/solo", 5L, 0),
      "dot-segment canonical must fold into the target cluster")
  }

  private def canonDocs = Seq(
    (1L, "https://m.ex.com/a1",
      """<link rel="canonical" href="https://orig.net/s/1">"""),
    (2L, "https://amp.ex.com/a2",
      """<link rel="canonical" href="https://orig.net/s/1">"""),
    (3L, "https://ex.com/own", "<p>none</p>"),
    // the self-canonical original of cluster s/1 — arrives LAST
    (4L, "https://orig.net/s/1",
      """<link rel="canonical" href="https://orig.net/s/1">"""))
    .toDF("doc_id", "url", "html")

  test("canonical keeper state merges: split-state == one-shot state (r11)") {
    val whole = Links.canonicalKeeperState(canonDocs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val merged = Links.mergeCanonicalState(
        Links.canonicalKeeperState(canonDocs.filter($"doc_id" <= 2))
          .unionByName(Links.canonicalKeeperState(canonDocs.filter($"doc_id" > 2))))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(merged == whole, "keeper state must be mergeable (min-struct)")
    // and the merged election prefers the self-canonical doc 4 over
    // the lower-id variants — (inv_self, id) ordering
    assert(whole.exists { case (cu, inv, id) =>
      cu == "https://orig.net/s/1" && inv == 0 && id == 4L })
  }

  test("incremental: history keepers immutable, new clusters elect in batch (r11)") {
    // history = docs 1-2 (variants only — keeper by min id = 1);
    // batch brings the SELF-CANONICAL original (4) plus a new solo (3)
    val state = Links.canonicalKeeperState(canonDocs.filter($"doc_id" <= 2))
    val out = Links.canonicalDedupIncremental(
        canonDocs.filter($"doc_id" > 2), state)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getInt(4))).toMap
    assert(out(4L) == (1L, 0),
      "a late self-canonical original must NOT re-point the shipped cluster")
    assert(out(3L) == (3L, 1), "a cluster new to the batch elects within it")
    // one-shot over everything DOES re-elect — the reconciliation tool
    val oneShot = Links.canonicalDedup(canonDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(oneShot(1L) == 4L && oneShot(4L) == 4L)
  }
}
