package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Pins the extraction semantics of `/root/reference/crawl.py:40-100`
  * against inline fixtures (pure functions — no Spark needed). */
class HtmlSpec extends AnyFunSuite {

  test("selector cascade: article wins over div.post") {
    val html =
      """<article><a href="/a1">x</a></article>
        |<div class="post"><a href="/d1">y</a></div>""".stripMargin
    val b = Html.articleBlocks(html)
    assert(b.size == 1 && b.head.contains("/a1"))
  }

  test("selector cascade: div.post when no article; class token match only") {
    val html =
      """<div class="post extra"><a href="/p1">x</a></div>
        |<div class="postscript"><a href="/no">y</a></div>""".stripMargin
    val b = Html.articleBlocks(html)
    assert(b.size == 1 && b.head.contains("/p1"))
  }

  test("fallback selector: class substring, case-insensitive") {
    val html = """<div class="MyBlogEntry"><a href="/f1">x</a></div>"""
    val b = Html.articleBlocks(html)
    assert(b.size == 1 && b.head.contains("/f1"))
  }

  test("no blocks → empty; null → empty") {
    assert(Html.articleBlocks("<p>plain</p>").isEmpty)
    assert(Html.articleBlocks(null).isEmpty)
  }

  test("firstHref: first link wins, absent → null, empty href still a hit") {
    assert(Html.firstHref("""<div><a href="/one">1</a><a href="/two">2</a></div>""") == "/one")
    assert(Html.firstHref("<div>no links</div>") == null)
    assert(Html.firstHref("""<div><a href="">1</a></div>""") == "")
  }

  test("resolveUrl: relative, absolute, protocol-relative, garbage") {
    assert(Html.resolveUrl("https://ex.com/list/", "/a/1") == "https://ex.com/a/1")
    assert(Html.resolveUrl("https://ex.com/list/", "a/1") == "https://ex.com/list/a/1")
    assert(Html.resolveUrl("https://ex.com/x", "https://other.com/y") == "https://other.com/y")
    assert(Html.resolveUrl("https://ex.com/x", "//cdn.com/z") == "https://cdn.com/z")
    assert(Html.resolveUrl("https://ex.com/x", "ht tp://bad") == null)
  }

  test("title cascade: h1, then title, then literal fallback; tags stripped") {
    assert(Html.title("<html><h1>The <b>Big</b> One</h1><title>T</title></html>") == "The Big One")
    assert(Html.title("<html><title> Page Title </title></html>") == "Page Title")
    assert(Html.title("<html><p>nothing</p></html>") == "No Title Found")
  }

  test("paragraphs: stripped, empties dropped, newline-joined") {
    val html = "<p> one </p><p></p><p>  </p><p>two &amp; three</p>"
    assert(Html.paragraphs(html) == "one\ntwo & three")
  }

  test("publish date cascade: time datetime attr first") {
    assert(Html.publishDate("""<time datetime="2024-03-01T10:00:00">March 1</time>""")
      == "2024-03-01T10:00:00")
  }

  test("publish date cascade: time body when attr missing (untrimmed)") {
    assert(Html.publishDate("<time> March 1, 2024 </time>") == " March 1, 2024 ")
  }

  test("publish date cascade: meta property, then pubdate, then date; else null") {
    assert(Html.publishDate(
      """<meta property="article:published_time" content="2024-05-05">""") == "2024-05-05")
    assert(Html.publishDate("""<meta name="pubdate" content="2024-06-06">""") == "2024-06-06")
    assert(Html.publishDate("""<meta name="date" content="2024-07-07">""") == "2024-07-07")
    assert(Html.publishDate("<html><p>none</p></html>") == null)
    // empty time tag falls through to meta, like the reference's
    // `if time_tag and (datetime or text)` guard
    assert(Html.publishDate(
      """<time></time><meta name="date" content="2024-08-08">""") == "2024-08-08")
  }
}
