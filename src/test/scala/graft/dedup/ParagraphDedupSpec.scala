package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sub-document dedup contract: the normalization that merges
  * case/whitespace variants, keep-first ordering by (doc_id, idx), the
  * df-threshold policy, whitespace-only unit handling, document rebuild
  * order, and the span (token-block) granularity edges. */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "All rights reserved."
  private def docs = Seq(
    (1L, s"alpha paragraph one\n\n$boiler\n\nalpha paragraph two"),
    (2L, s"beta body text\n\n$boiler"),
    (3L, s"  ALL   rights\treserved.\n\ngamma body"), // variant of boiler
    (4L, s"$boiler"),                                 // pure boilerplate
    (5L, "delta one\n\n \n\ndelta two"),              // whitespace-only unit
    (6L, "rare repeat\n\nepsilon body"),
    (7L, "rare repeat\n\nzeta body")                  // 2-occurrence repeat
  ).toDF("doc_id", "text")

  test("normalization merges case/whitespace variants onto one keeper") {
    val audit = ParagraphDedup.audit(
      ParagraphDedup.paragraphUnits(docs, "doc_id", "text")).collect()
    val row = audit.find(_.getString(0) == "all rights reserved.").get
    assert(row.getLong(1) == 4)       // docs 1, 2, 3, 4
    assert(row.getLong(2) == 4)
    assert(row.getLong(3) == 1L && row.getLong(4) == 1L) // keeper: doc 1, idx 1
  }

  test("keep-first removes later occurrences and rebuilds docs in order") {
    val out = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (s"alpha paragraph one\n\n$boiler\n\nalpha paragraph two", 3L, 0L))
    assert(out(2L) == ("beta body text", 1L, 1L))
    assert(out(3L) == ("gamma body", 1L, 1L))     // variant removed too
    assert(out(4L) == ("", 0L, 1L))               // pure boilerplate empties
    // whitespace-only unit vanishes: neither kept nor removed
    assert(out(5L) == ("delta one\n\ndelta two", 2L, 0L))
    assert(out(6L) == ("rare repeat\n\nepsilon body", 2L, 0L))
    assert(out(7L) == ("zeta body", 1L, 1L))
  }

  test("incremental batch clean equals the full recompute's batch rows") {
    // History = docs 1-4, batch = docs 5-7 (append-only id order — the
    // union-equivalence precondition). The incremental path sees only
    // history's norm-hash INDEX, never its text.
    val hist = docs.filter(col("doc_id") <= 4)
    val batch = docs.filter(col("doc_id") >= 5)
    val incr = ParagraphDedup.dedupParagraphsIncremental(batch, "doc_id", "text",
        ParagraphDedup.paragraphIndex(
          ParagraphDedup.paragraphUnits(hist, "doc_id", "text")))
      .collect().map(_.toSeq).toSeq
    val full = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text")
      .filter(col("doc_id") >= 5)
      .collect().map(_.toSeq).toSeq
    assert(incr == full)
  }

  test("index after batch keeps history keepers and adds only novel norms") {
    val hist = docs.filter(col("doc_id") <= 4)
    val batch = docs.filter(col("doc_id") >= 5)
    val histUnits = ParagraphDedup.paragraphUnits(hist, "doc_id", "text")
    val idx0 = ParagraphDedup.paragraphIndex(histUnits)
    val idx1 = ParagraphDedup.indexAfterBatch(idx0,
      ParagraphDedup.paragraphUnits(batch, "doc_id", "text"))
    val entries = idx1.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // One entry per distinct norm across history ∪ batch, no dup keys.
    assert(entries.size == idx1.count())
    // The boilerplate norm keeps its HISTORY keeper (doc 1, idx 1)...
    val boilerKey = md5Hex("all rights reserved.")
    assert(entries(boilerKey) == (1L, 1L))
    // ...and batch-novel norms enter keyed by their batch keeper.
    val novelKey = md5Hex("rare repeat")
    assert(entries(novelKey) == (6L, 0L))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("df threshold keeps repeats below minOccurrences") {
    // boiler occurs 4x (>= 3: deduped); "rare repeat" 2x (< 3: survives).
    val out = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text",
        minOccurrences = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(7L) == "rare repeat\n\nzeta body")
    assert(out(2L) == "beta body text")
    assert(out(4L) == "")
  }

  test("span units cover all tokens with a short trailing block") {
    val d = Seq((1L, (1 to 7).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val units = ParagraphDedup.spanUnits(d, "doc_id", "text", 3)
      .orderBy("idx").collect()
    assert(units.map(_.getString(2)).toSeq == Seq("t1 t2 t3", "t4 t5 t6", "t7"))
    assert(units.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("span dedup removes repeated blocks across docs, keep-first") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),   // block "a b c" repeats -> removed here
      (3L, "")               // tokenless doc: comes back empty
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupSpans(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ("a b c d e f", 2L, 0L))
    assert(out(2L) == ("x y z", 1L, 1L))
    assert(out(3L) == ("", 0L, 0L))
  }

  test("audit orders by occurrences desc then paragraph asc and is repeat-only") {
    val audit = ParagraphDedup.audit(
      ParagraphDedup.paragraphUnits(docs, "doc_id", "text")).collect()
    assert(audit.map(_.getString(0)).toSeq == Seq("all rights reserved.", "rare repeat"))
    assert(audit.forall(_.getLong(1) >= 2))
  }
}
