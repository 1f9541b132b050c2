package graft.text

import graft.SparkSpec

/** Pins the BM25 ranking semantics on a planted corpus: idf favors rare
  * terms, tf saturates, length normalization penalizes padding, and the
  * rank output is deterministic with doc-id tie-breaks. */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  // "rare" appears in 1 of 6 docs, "common" in 5 of 6.
  private def docs = Seq(
    (1L, "rare common alpha beta"),
    (2L, "common alpha beta gamma"),
    (3L, "common beta gamma delta"),
    (4L, "common gamma delta epsilon"),
    (5L, "common delta epsilon zeta"),
    (6L, "alpha beta gamma delta epsilon zeta eta theta common " +
      "iota kappa lambda mu nu xi omicron pi rho")
  ).toDF("doc_id", "text")

  private def scores(terms: String*) =
    Relevance.bm25Scores(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("rare term outranks common term at equal tf") {
    val s = scores("rare", "common")
    // doc 1 holds the rare term once; every other doc only the common one.
    assert((2 to 6).forall(d => s(1L) > s(d.toLong)))
  }

  test("length normalization: same tf, longer doc scores lower") {
    val s = scores("common")
    // docs 2-5 are 4 tokens with tf=1; doc 6 is 18 tokens with tf=1.
    assert(s(2L) == s(3L) && s(3L) == s(4L) && s(4L) == s(5L))
    assert(s(6L) < s(2L))
  }

  test("zero-match docs score exactly 0") {
    val s = scores("rare")
    assert((2 to 6).forall(d => s(d.toLong) == 0.0))
    assert(s(1L) > 0.0)
  }

  test("tf saturates: doubling tf gains less than the first occurrence") {
    val d = Seq(
      (1L, "term pad1 pad2 pad3"),
      (2L, "term term pad1 pad2"),
      (3L, "term term term pad1")
    ).toDF("doc_id", "text")
    val s = Relevance.bm25Scores(d, "doc_id", "text", Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val gain1 = s(2L) - s(1L)
    val gain2 = s(3L) - s(2L)
    assert(gain1 > 0 && gain2 > 0 && gain2 < gain1)
  }

  test("topK ranks by rounded score with doc-id tie-break") {
    val top = Relevance.bm25TopK(docs, "doc_id", "text",
      Seq("common"), 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // docs 1-5 all have tf=1 at dl=4 and tie exactly; the k=3 cut keeps
    // the lowest doc ids.
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
