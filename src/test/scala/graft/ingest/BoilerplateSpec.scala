package graft.ingest

import graft.SparkSpec

/** Pins the density extractor's gates: link-density integer boundary,
  * minWords boundary, chrome removal, whitespace canonicalization, and
  * empty/degenerate pages. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String): (Long, Long, String) = {
    val r = Boilerplate.mainContent(
      Seq((1L, html)).toDF("doc_id", "html")).collect().head
    (r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("nav and footer chrome drop; the content block survives") {
    val (nBlocks, nKept, text) = run(
      "<html><body><div><a>Home</a> <a>About</a></div>" +
        "<p>real article content lives here</p>" +
        "<div><a>Privacy</a></div></body></html>")
    assert(nBlocks == 3L && nKept == 1L)
    assert(text == "real article content lives here")
  }

  test("link-density boundary is exact integer arithmetic") {
    // 1 link word of 3 = 33.3% > 33%: dropped (100 > 99).
    assert(run("<p>plain words <a>linked</a></p>")._2 == 0L)
    // 1 link word of 4 = 25% <= 33%: kept.
    val (_, kept4, t4) = run("<p>three plain words <a>linked</a></p>")
    assert(kept4 == 1L && t4 == "three plain words linked")
  }

  test("minWords boundary") {
    assert(run("<p>two words</p>")._2 == 0L)
    assert(run("<p>exactly three words</p>")._2 == 1L)
  }

  test("multiple kept blocks join with newline, whitespace collapsed") {
    val (_, kept, text) = run(
      "<p>first   block\n of words</p><section>second block of words</section>")
    assert(kept == 2L)
    assert(text == "first block of words\nsecond block of words")
  }

  test("empty and tag-only pages yield zero blocks and empty text") {
    assert(run("") == ((0L, 0L, "")))
    assert(run("<html><body><div></div></body></html>") == ((0L, 0L, "")))
  }

  test("anchors spanning lines still count as link words (dotall)") {
    val (_, kept, _) = run("<p>some words here <a\nhref=\"x\">a\nlinked\nphrase\nnow</a></p>")
    // 4 link words of 7 = 57% > 33%: dropped
    assert(kept == 0L)
  }
}
