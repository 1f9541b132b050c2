package graft.text

import graft.SparkSpec

/** Pins the unigram-LM tokenizer: Viterbi optimality against exhaustive
  * segmentation enumeration (score, then the tie order), the round-trip
  * invariant, hard-EM fit determinism and coverage guarantees, encode
  * stats, and the divergence-from-BPE pin on a compression-skewed
  * fixture (the reason both tokenizers exist in the family). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val L = 6

  /** All segmentations of `tok` into vocab pieces / UNK single chars. */
  private def segmentations(tok: String,
                            lp: Map[String, Long]): Seq[List[String]] =
    if (tok.isEmpty) Seq(Nil)
    else (1 to math.min(L, tok.length)).flatMap { k =>
      val head = tok.substring(0, k)
      if (lp.contains(head) || k == 1)
        segmentations(tok.substring(k), lp).map(head :: _)
      else Seq.empty
    }

  private def score(seg: List[String], lp: Map[String, Long]): Long =
    seg.map(p => lp.getOrElse(p, Unigram.UnkMicro)).sum

  test("viterbi equals exhaustive argmax under (score, pieces, last-longer)") {
    val lp = Map("a" -> -100L, "b" -> -200L, "ab" -> -250L, "abc" -> -280L,
      "c" -> -400L, "bc" -> -350L, "abab" -> -460L)
    for (tok <- Seq("ababc", "abcabc", "aaab", "cab", "x", "xabcx", "abababab")) {
      val got = Unigram.viterbiPath(tok, lp, L)
      val all = segmentations(tok, lp)
      val bestScore = all.map(score(_, lp)).max
      val optimal = all.filter(score(_, lp) == bestScore)
      assert(got.mkString == tok, s"round trip broke on $tok")
      assert(score(got, lp) == bestScore, s"suboptimal on $tok: $got")
      // tie order: fewest pieces among optimal
      assert(got.length == optimal.map(_.length).min, s"tie order on $tok")
    }
  }

  test("unknown single characters cost UnkMicro; encode is total") {
    val lp = Map("a" -> -10L)
    assert(Unigram.viterbiPath("a?a", lp, L) == List("a", "?", "a"))
    assert(Unigram.viterbiPieces("???", lp, L) == 3)
    assert(Unigram.viterbiPieces("", lp, L) == 0)
  }

  test("fitOnDict: deterministic, chars always covered, size capped") {
    val dict = Array(("banana", 50L), ("bandana", 30L), ("ana", 20L),
      ("nab", 5L), ("and", 8L))
    val fit1 = Unigram.fitOnDict(dict, vocabSize = 12)
    val fit2 = Unigram.fitOnDict(dict, vocabSize = 12)
    assert(fit1 == fit2, "fit must be a pure function of the dictionary")
    assert(fit1.size <= 12)
    val pieces = fit1.map(_._1).toSet
    for (ch <- "band".map(_.toString))
      assert(pieces.contains(ch), s"char $ch must survive pruning")
    assert(fit1.forall(_._2 < 0L), "log-probs are negative micro-nats")
    assert(fit1.map(_._1) == fit1.map(_._1).sorted, "output sorted by piece")
    // the dominant substring family should earn multi-char pieces
    assert(pieces.exists(_.length > 1), "EM kept no multi-char piece")
  }

  test("empty dictionary fits an empty vocab (oracle omission path)") {
    assert(Unigram.fitOnDict(Array.empty, vocabSize = 10).isEmpty)
  }

  test("encodeStats: hand-checked counts on a two-doc corpus") {
    val docs = Seq(
      (1L, "banana banana split"),
      (2L, "ba na na")).toDF("doc_id", "text")
    val pieces = Seq(("banana", -500000L), ("ba", -900000L), ("na", -800000L),
      ("split", -1200000L), ("b", -2000000L),
      ("a", -1900000L), ("n", -2100000L), ("s", -2000000L),
      ("p", -2000000L), ("l", -2000000L), ("i", -2000000L), ("t", -2000000L))
    val out = Unigram.encodeStats(docs, "doc_id", "text", pieces)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: banana(1) banana(1) split(1) = 3 pieces over 3 tokens
    // doc 2: ba(1) na(1) na(1) = 3 pieces over 3 tokens
    assert(out == Seq((1L, 3L, 3L), (2L, 3L, 3L)))
  }

  test("unigram beats BPE on a compression-skewed corpus (few merges)") {
    // One long word dominates: the unigram vocab adopts it whole, while
    // 3-merge BPE can only assemble a 4-char fragment — so the unigram
    // encode uses strictly fewer pieces. This is the family-divergence
    // pin the fertility audit reads at corpus scale.
    val docs = Seq.tabulate(40)(i => (i.toLong, "internationalization"))
      .toDF("doc_id", "text")
    val merges = Bpe.fitMerges(docs, "text", nMerges = 3)
    val bpePieces = Bpe.encodeStats(docs, "doc_id", "text", merges)
      .collect().head.getLong(2)
    val pieces = Unigram.fitPieces(docs, "text", vocabSize = 60,
      maxPieceLen = 20)
    val uniPieces = Unigram.encodeStats(docs, "doc_id", "text", pieces,
      maxPieceLen = 20)
      .collect().head.getLong(2)
    assert(uniPieces < bpePieces,
      s"unigram ($uniPieces) should compress harder than 3-merge BPE ($bpePieces)")
    assert(uniPieces == 1L, "the whole dominant word should be one piece")
  }

  test("maxMatch: greedy longest-first, and Viterbi never loses to it (r11)") {
    // the classic greedy trap: 'abcd' with vocab {abc, ab, cd, a..d}
    // greedy takes 'abc' + 'd' (2 pieces at poor prob); Viterbi can
    // pick 'ab' + 'cd' when the probabilities favor it — equal piece
    // count here, but on 'abcde' with {abcd, bc, de}: greedy abcd+e=2,
    // which strands 'e'; make a case where greedy is strictly worse:
    val vocab = Set("abc", "de", "cde", "ab")
    // 'abcde': greedy: abc + de = 2; Viterbi with lp would also find
    // ab+cde = 2 — counts tie. Force a strict loss: 'abcd' with
    // {abc, ab, cd}: greedy abc+d = 2, Viterbi ab+cd = 2 — again tie
    // on count but the d is UNK-priced. Pin the SCORE relation instead:
    // Viterbi's score is >= any segmentation's, greedy's included.
    val lp = Map("abc" -> -300L, "ab" -> -100L, "cd" -> -100L,
      "a" -> -900L, "b" -> -900L, "c" -> -900L, "d" -> -900L)
    val tok = "abcd"
    val greedy = Unigram.maxMatchPieces(tok, lp.keySet, 6)
    assert(greedy == 2, "greedy must take abc then the single d")
    // Viterbi picks ab+cd (-200) over abc+d (-300 + UNK-free -900)
    assert(Unigram.viterbiPath(tok, lp, 6) == List("ab", "cd"))
    // piece-count relation on a corpus: Viterbi pieces <= greedy would
    // NOT hold in general (Viterbi optimizes probability, not count) —
    // what holds is score optimality, pinned in the exhaustive test.
    assert(Unigram.maxMatchPieces("", lp.keySet, 6) == 0)
    assert(Unigram.maxMatchPieces("zzz", Set("ab"), 6) == 3,
      "all-unknown text consumes one char per step")
  }

  test("roundTrip: decode == canonical under both coders; flags all 1 (F129)") {
    val docs = Seq(
      (1L, "Hello   WORLD"),              // case + run collapse
      (2L, "  spark  \t streams\nfast "), // every ASCII ws byte class
      (3L, "xyzzy q9!"),                  // UNK chars: single-char pieces
      (4L, "   \t  "),                    // all-ws: filtered (no tokens)
      (5L, "the data table")
    ).toDF("doc_id", "text")
    val pieces = Unigram.fitOnDict(
      Array(("hello", 3L), ("world", 3L), ("spark", 2L), ("streams", 2L),
        ("fast", 2L), ("the", 5L), ("data", 4L), ("table", 4L)), 40, L)
    val out = Unigram.roundTrip(docs, "doc_id", "text", pieces, L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getInt(4), r.getInt(5))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L)) // all-ws doc filtered
    out.foreach { case (id, (vm, mm, vok, mok)) =>
      assert(vok == 1 && mok == 1, s"doc $id flags: $vok $mok")
      assert(vm == mm, s"doc $id: coder md5s differ")
    }
    // the md5 is of the canonical form, computable independently
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(2L)._1 == md5hex("spark streams fast"))
    assert(out(3L)._1 == md5hex("xyzzy q9!"))
  }

  test("sql mirror rejects an empty vocab (the omission contract)") {
    intercept[IllegalArgumentException] {
      Unigram.sqlEncodeStats(Seq.empty)
    }
  }
}
