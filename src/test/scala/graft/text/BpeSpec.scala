package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE trainer against the hand-computed Sennrich example, the
  * (count desc, left asc, right asc) tie-break, greedy rank-order
  * encoding with its round-trip invariant, and the bounded-dict fit. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. example dictionary: low×5, lower×2, newest×6, widest×3.
  private def corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  private def docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("hand-computed merge sequence on the Sennrich dictionary") {
    // Round-by-round pair counts give: (e,s)=9 ties (s,t)=9 -> left-asc
    // picks (e,s); then (es,t)=9; then (l,o)=7 ties (o,w) -> (l,o); then
    // (lo,w)=7; then 6-count tie (e,w)/(n,e)/(w,est) -> (e,w).
    val merges = Bpe.fitMerges(docs, "text", 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("encode follows merge ranks greedily and round-trips") {
    val merges = Bpe.fitMerges(docs, "text", 5)
    val rank = merges.zipWithIndex.toMap
    assert(Bpe.encodeToken("lowest", rank).toSeq == Seq("low", "est"))
    assert(Bpe.encodeToken("newest", rank).toSeq == Seq("n", "ew", "est"))
    assert(Bpe.encodeToken("zzz", rank).toSeq == Seq("z", "z", "z"))
    // round-trip: concatenation of pieces reproduces every corpus token
    corpus.distinct.foreach { w =>
      assert(Bpe.encodeToken(w, rank).mkString == w)
    }
  }

  test("merge loop stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.fitMerges(tiny, "text", 100)
    assert(merges == Seq(("a", "b"))) // one merge exhausts all pairs
  }

  test("encode stats: piece counts shrink with merges, compression sane") {
    val merges = Bpe.fitMerges(docs, "text", 5)
    val out = Bpe.encodeStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 0 = "low": 1 token, encodes to 1 piece ("low") -> compression 1.0
    assert(out(0L) == (1L, 1L, 1.0))
    // doc 7 = "newest": pieces [n, ew, est] -> 3 pieces
    assert(out(7L)._2 == 3L)
    // with no merges every char is a piece
    val raw = Bpe.encodeStats(docs, "doc_id", "text", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(0L) == 3L) // l,o,w
  }

  test("dictionary fit is bounded and deterministic") {
    val many = (1 to 500).map(i => (i.toLong, s"tok$i common common"))
      .toDF("doc_id", "text")
    val a = Bpe.fitMerges(many, "text", 10, maxVocabWords = 50)
    val b = Bpe.fitMerges(many.repartition(7), "text", 10, maxVocabWords = 50)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("fertility by language: hand-traced sums, null lang, empty doc") {
    // Sennrich merges: low -> 1 piece, lower -> [low,e,r] = 3,
    // newest -> [n,ew,est] = 3.
    val merges = Bpe.fitMerges(docs, "text", 5)
    val fix = Seq(
      (1L, "low low low", "aa"),       // 3 toks, 3 pieces, 9 bytes
      (2L, "lower", "aa"),             // 1 tok,  3 pieces, 5 bytes
      (3L, "newest newest", "bb"),     // 2 toks, 6 pieces, 12 bytes
      (4L, "low", null),               // null lang -> "und"
      (5L, "   ", "aa")                // zero tokens -> excluded
    ).toDF("doc_id", "text", "lang")
    val out = Bpe.fertilityByLang(fix, "doc_id", "text", "lang", merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out("aa") == ((2L, 4L, 6L, 14L, 1.5, 2.3333)))
    assert(out("bb") == ((1L, 2L, 6L, 12L, 3.0, 2.0)))
    assert(out("und") == ((1L, 1L, 1L, 3L, 1.0, 3.0)))
    assert(out.size == 3)
  }
}
