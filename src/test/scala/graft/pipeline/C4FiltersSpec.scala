package graft.pipeline

import graft.SparkSpec

/** Pins the C4 line rule (terminal punctuation on the trimmed line,
  * minimum words, no 'javascript'), the page rules (lorem ipsum, brace,
  * minimum kept lines), and the order-preserving rebuild. */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = graft.C4Fixture.docs.toDF("doc_id", "text")

  test("line rule: keep terminal-punct prose, drop chrome") {
    val out = C4Filters.clean(fixture).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // Page 1: 8 lines -> kept are the 5 real sentences, original order,
    // original (untrimmed) line text.
    val (t1, n1) = out(1L)
    assert(n1 == 5)
    val lines = t1.split("\n")
    assert(lines(0) == "This is the first good sentence of the page.")
    assert(lines(1) == "Is this a fine question sentence with enough words?")
    assert(lines(2) == "An exclamation sentence with plenty of words here!")
    assert(lines(3) == "He said \"this quoted sentence ends with a quote mark.\"")
    // trailing spaces survive in the output; the RULE trims, not the text
    assert(lines(4) == "   A sentence with trailing spaces after the period.   ")
    // short line, no-punct line, javascript line all dropped
    assert(!t1.contains("short line") && !t1.contains("javascript")
      && !t1.contains("no terminal punctuation"))
  }

  test("page rules: lorem ipsum, brace, and min-lines pages drop") {
    val kept = C4Filters.clean(fixture)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L)) // 2: lorem ipsum, 3: brace, 4: < 3 lines
  }

  test("min-lines boundary: exactly 3 kept lines survives") {
    val out = C4Filters.clean(fixture).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) == 3)
  }

  test("thresholds are parameters") {
    // At minLines = 1 the two-sentence page 4 has 1 kept line... its
    // only terminal-punct line ("plus a short tail.") is under 5 words,
    // so page 4 keeps exactly the first long sentence.
    val loose = C4Filters.clean(fixture, minWordsPerLine = 5, minLines = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loose(4L) == 1)
    // Raising min words per line to 9 drops page 5's 8-word opener,
    // leaving it 2 kept lines — under the page minimum.
    val strict = C4Filters.clean(fixture, minWordsPerLine = 9, minLines = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(!strict.contains(5L))
  }

  test("bad words: whole-token hits count, substrings never match") {
    val docs = Seq(
      (1L, "a plain page about nothing in particular"),
      (2L, "buy viagra online today"),                  // one hit
      (3L, "the sextonbury parish xxxl archive"),       // traps: sex, xxx inside larger tokens
      (4L, "live xxx casino stream with xxx reruns"),   // three hits (xxx twice + casino)
      (5L, "visit porn-site reviews"),                  // hyphen splits the run -> hit
      (6L, "PORN in caps still counts")                 // case-folded
    ).toDF("doc_id", "text")
    val out = C4Filters.badWords(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((0L, false)))
    assert(out(2L) == ((1L, true)))
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((3L, true)))
    assert(out(5L) == ((1L, true)))
    assert(out(6L) == ((1L, true)))
  }

  test("bad words: the list is a parameter and must be boundary-safe") {
    val docs = Seq((1L, "totally fine words")).toDF("doc_id", "text")
    val out = C4Filters.badWords(docs, words = Seq("fine")).collect()
    assert(out.head.getLong(1) == 1L && out.head.getBoolean(2))
    intercept[IllegalArgumentException] {
      C4Filters.badWords(docs, words = Seq("two words"))
    }
    intercept[IllegalArgumentException] {
      C4Filters.badWords(docs, words = Seq.empty)
    }
  }
}
