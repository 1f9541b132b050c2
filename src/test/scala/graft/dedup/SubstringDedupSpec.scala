package graft.dedup

import graft.SparkSpec

/** Pins the overlapping-stride substring-dedup contract — and the exact
  * gap it closes: a duplicated passage that straddles a fixed-block
  * boundary in one document but not the other is INVISIBLE to
  * [[ParagraphDedup.dedupSpans]] (non-overlapping blocks) and caught by
  * [[SubstringDedup]] (stride < width windows + tail window). Also pins
  * case-insensitive matching with case-preserving rebuild, merged
  * removed intervals for passages longer than the window, tail-window
  * coverage of end-of-document duplicates, pass-through of short and
  * unique documents, and idempotence.
  *
  * Fixture geometry (width = 8, stride = 3):
  *  - P (10 tokens) at token 1 in doc 1, at token 4 in doc 2 (offsets
  *    agree mod 3): doc 2's only matching window is P[1..8] at start 4 —
  *    which straddles the 8-token block boundary dedupSpans(8) draws.
  *  - Q (14 tokens) at token 1 in doc 3, token 4 in doc 4: three
  *    staggered windows match and their intervals [4,11],[7,14],[10,17]
  *    must merge to one removed span [4,17] covering all of Q.
  *  - R (8 tokens) ends docs 6 and 7 at starts (6, 8) that no stride
  *    start reaches — only the always-added tail window catches it.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val P = "the quick brown fox jumps over seven lazy sleeping dogs"
  private val PCased = "THE quick BROWN fox JUMPS over SEVEN lazy SLEEPING dogs"
  private val Q = "every shuffle moves rows between executors across the " +
    "network during wide stage boundaries tonight"
  private val R = "rivers flow gently past ancient stone bridges downstream"

  private def docs = Seq(
    (1L, s"$P alpha beta gamma delta"),
    (2L, s"one two three $PCased epsilon zeta"),
    (3L, s"$Q unique ending here"),
    (4L, s"x1 x2 x3 $Q final tail"),
    (5L, "totally unrelated tiny document"),
    (6L, s"a1 a2 a3 a4 a5 $R"),
    (7L, s"b1 b2 b3 b4 b5 b6 b7 $R"),
    // docs 8/9: the doc IS the passage — doc 9's two windows ([1,8] and
    // the tail [3,10]) both lose keep-first and merge to cover the whole
    // doc. Regression pin: a fully-removed doc must still report its
    // true n_tokens/n_removed (not null out through the kept-rows agg).
    (8L, P),
    (9L, P)
  ).toDF("doc_id", "text")

  private def cleanedMap =
    SubstringDedup.cleaned(docs, "doc_id", "text", width = 8, stride = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("dedupSpans(8) provably misses every offset duplicate") {
    // Docs 1-7 carry the offset/straddling copies; docs 8/9 are byte-
    // identical whole docs (aligned blocks — the one case spanUnits DOES
    // catch) and are excluded from the miss assertion.
    val out = ParagraphDedup.dedupSpans(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val misses = out.filterKeys(_ <= 7L)
    assert(misses.values.forall(_ == 0L),
      s"non-overlapping blocks should see no offset duplicates, got $misses")
  }

  test("block-straddling duplicate is caught; keeper doc untouched") {
    val out = cleanedMap
    // doc 1 is the keeper: token-rejoined original, nothing removed.
    assert(out(1L) == (s"$P alpha beta gamma delta", 14L, 0L))
    // doc 2 loses P[1..8] (positions 4-11); the matching was on the
    // LOWERED window (doc 2's copy is cased) and the kept residue
    // P[9..10] keeps its ORIGINAL case.
    assert(out(2L) == ("one two three SLEEPING dogs epsilon zeta", 15L, 8L))
  }

  test("staggered matching windows merge into one removed interval") {
    val rm = SubstringDedup.removedIntervals(
        SubstringDedup.windows(docs, "doc_id", "text", 8, 3), width = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rm.count(_._1 == 4L) == 1, s"expected one merged interval, got ${rm.toSeq}")
    assert(rm.contains((4L, 4L, 17L)))
    val out = cleanedMap
    assert(out(4L) == ("x1 x2 x3 final tail", 19L, 14L))
    assert(out(3L)._3 == 0L) // keeper side of Q untouched
  }

  test("tail window catches end-of-document duplicates stride starts miss") {
    // R sits at starts 6 (doc 6) and 8 (doc 7): neither is 1 mod 3, so
    // without the always-added tail window NO window covers R on either
    // side and the duplicate would survive.
    val out = cleanedMap
    assert(out(6L) == (s"a1 a2 a3 a4 a5 $R", 13L, 0L)) // keeper
    assert(out(7L) == ("b1 b2 b3 b4 b5 b6 b7", 15L, 8L))
  }

  test("short and unique documents pass through token-rejoined") {
    val out = cleanedMap
    assert(out(5L) == ("totally unrelated tiny document", 4L, 0L))
  }

  test("fully-removed document keeps its true token counts") {
    val out = cleanedMap
    // doc 8 keeps the P[3..10] window (it is that window's keeper) minus
    // the removed [1,8] prefix; doc 9 loses both windows -> everything.
    assert(out(8L) == ("sleeping dogs", 10L, 8L))
    assert(out(9L) == ("", 10L, 10L))
  }

  test("audit reports passages with counts and keeper positions") {
    val rows = SubstringDedup.audit(docs, "doc_id", "text", 8, 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.size == 6) // P[1..8], P[3..10], Q[1..8], Q[4..11], Q[7..14], R
    val p8 = P.split(" ").take(8).mkString(" ")
    assert(rows(p8) == (4L, 4L, 1L, 1L)) // docs 1, 2, 8, 9
    val p3to10 = P.split(" ").drop(2).mkString(" ")
    assert(rows(p3to10) == (2L, 2L, 8L, 3L))
    assert(rows(R.toLowerCase) == (2L, 2L, 6L, 6L))
  }

  // ---- content-anchored starts (`anchored = true`) ----

  /** The operator's md5-bucket anchor rule, replicated in plain JVM code
    * so the fixture can be CONSTRUCTED around it: a token anchors iff
    * its lowercased md5 first-8-hex value is 0 mod stride. */
  private def isAnchor(tok: String, stride: Int): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.toLowerCase.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % stride == 0
  }

  /** First token in `pool` with the requested anchor-ness — fixture
    * construction stays valid whatever md5 says about any given word. */
  private def pick(pool: Iterator[String], anchor: Boolean): String =
    pool.find(isAnchor(_, 3) == anchor).get

  test("anchored starts catch an offset-shifted duplicate fixed stride provably misses") {
    // Passage S: an ANCHOR token + 7 non-anchor tokens (exactly width).
    // Doc 10 carries S at offset 1, doc 11 at offset 2 — shift 1, and
    // 1 % 3 != 0, so no fixed-stride window pair aligns. All filler is
    // non-anchor and differs between the docs.
    val a = pick(Iterator.from(0).map(i => s"anchor$i"), anchor = true)
    def nonAnchors(prefix: String, n: Int) =
      Iterator.from(0).map(i => s"$prefix$i").filter(!isAnchor(_, 3)).take(n).toSeq
    val s8 = a +: nonAnchors("p", 7)
    val c = nonAnchors("c", 6)
    val d = nonAnchors("d", 7)
    val shifted = Seq(
      (10L, (s8 ++ c).mkString(" ")),
      (11L, ((d.head +: s8) ++ d.tail).mkString(" "))
    ).toDF("doc_id", "text")

    val fixed = SubstringDedup.cleaned(shifted, "doc_id", "text", 8, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(fixed.values.forall(_ == 0L),
      s"fixed stride should miss the shift-1 copy, removed: $fixed")

    val anch = SubstringDedup.cleaned(shifted, "doc_id", "text", 8, 3,
        anchored = true)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(anch(10L) == ((s8 ++ c).mkString(" "), 14L, 0L)) // keeper untouched
    assert(anch(11L) == (d.mkString(" "), 15L, 8L))
  }

  test("anchored mode is idempotent too") {
    val once = SubstringDedup.cleaned(docs, "doc_id", "text", 8, 3,
      anchored = true).select("doc_id", "text_clean")
    val twice = SubstringDedup.cleaned(once, "doc_id", "text_clean", 8, 3,
        anchored = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(twice.values.forall(_ == 0L), s"second pass removed units: $twice")
  }

  // ---- incremental form (persisted window-hash index) ----

  test("incremental equals the batch rows of a full recompute (union-equivalence)") {
    // History = docs 1-5, batch = docs 6-9: R's cross-split copy (doc 6
    // hist keeper / doc 7 batch), the whole-doc pair 8/9 inside the
    // batch, and Q's copy crossing the split (doc 3 hist / doc 4 batch).
    val hist = docs.filter($"doc_id" <= 5)
    val batch = docs.filter($"doc_id" >= 6)
    val index = SubstringDedup.windowIndex(
      SubstringDedup.windows(hist, "doc_id", "text", 8, 3))
    val inc = SubstringDedup.cleanedIncremental(batch, "doc_id", "text",
        index, 8, 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val full = cleanedMap.filterKeys(_ >= 6L).toMap
    assert(inc == full, s"incremental $inc != full-recompute batch rows $full")
    // The cross-split duplicate really was removed via the INDEX (history
    // text never re-read): doc 7 loses R against doc 6's indexed windows.
    assert(inc(7L)._3 == 8L)
  }

  test("index absorption adds only novel window hashes, keepers immutable") {
    val hist = docs.filter($"doc_id" <= 5)
    val batch = docs.filter($"doc_id" >= 6)
    val index = SubstringDedup.windowIndex(
      SubstringDedup.windows(hist, "doc_id", "text", 8, 3))
    val batchWins = SubstringDedup.windows(batch, "doc_id", "text", 8, 3)
    val after = SubstringDedup.indexAfterBatch(index, batchWins)
    val afterMap = after.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every pre-existing entry survives byte-identically
    index.collect().foreach { r =>
      assert(afterMap(r.getString(0)) == (r.getLong(1), r.getLong(2)),
        s"history keeper for ${r.getString(0)} changed")
    }
    // and the union index equals one built from scratch over everything
    val scratch = SubstringDedup.windowIndex(
        SubstringDedup.windows(docs, "doc_id", "text", 8, 3))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(afterMap == scratch)
  }

  test("coverage: a sub-window duplicate the windows provably miss (r11)") {
    // S is 5 tokens — a TRUE duplicate at minLen 4, invisible to any
    // width-8 setting (no repeated 8-gram exists). The audit must show
    // it as missed mass for width 8, caught by the truth chain.
    val s5 = "omega kappa sigma theta lambda"
    val cdocs = Seq(
      (1L, s"$s5 filler1 filler2 filler3 filler4"),
      (2L, s"pre1 pre2 pre3 $s5 post1 post2")).toDF("doc_id", "text")
    val out = SubstringDedup.coverage(cdocs, "doc_id", "text",
        Seq((8, 3, false), (4, 1, false)), minLen = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (rm8, true8, missed8, pm8) = out((8L, 3L))
    assert(rm8 == 0L, "no repeated 8-gram exists, width 8 must remove 0")
    assert(true8 == 5L, "the 5-token duplicate is true mass (one copy removed)")
    assert(missed8 == 5L && pm8 == 0L,
      "the sub-window duplicate must surface as missed mass")
    // the truth-as-setting row self-checks at full coverage
    val (rm4, _, missed4, pm4) = out((4L, 1L))
    assert(rm4 == 5L && missed4 == 0L && pm4 == 1000L)
  }

  test("coverage: removed mass is a subset of true mass on the fixture") {
    val rows = SubstringDedup.coverage(docs, "doc_id", "text",
        Seq((8, 3, false), (8, 1, false), (8, 3, true)), minLen = 8)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(5) >= 0L,
        s"missed mass negative for (${r.getLong(0)},${r.getLong(1)}) — subset broken")
      assert(r.getLong(6) <= 1000L)
    }
    // stride 1 at width = minLen IS the truth: full coverage
    val s1 = rows.find(r => r.getLong(1) == 1L).get
    assert(s1.getLong(6) == 1000L)
  }

  test("idempotence: re-running on cleaned output removes nothing") {
    val once = SubstringDedup.cleaned(docs, "doc_id", "text", 8, 3)
      .select("doc_id", "text_clean")
    val twice = SubstringDedup.cleaned(once, "doc_id", "text_clean", 8, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(twice.values.forall(_ == 0L), s"second pass removed units: $twice")
  }
}
