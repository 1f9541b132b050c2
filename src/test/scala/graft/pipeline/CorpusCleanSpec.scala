package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the corpus-clean composition ORDER: filter first, then dedup — a
  * near-dup cluster whose min-id member fails the quality gate must
  * re-elect its keeper among the survivors. The wrong order (dedup before
  * filter) would drop the survivor as a dup of an already-filtered doc. */
class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  test("keeper re-election: surviving near-dup stays when its cluster min fails the gate") {
    val base = "the quick brown fox and the lazy dog of it is in that it went to " +
      "the market and bought some of the best fresh bread in town today"
    val digits = "9" * 400
    val docs = Seq(
      (1L, s"$base $digits", "src1"), // near-dup of 2, quality sunk by digit run
      (2L, base, "src1"),             // good quality, same cluster as 1
      (3L, "the cat sat on the mat and it was happy to be in the sun all of the day", "src1"))
      .toDF("doc_id", "text", "source")
    // preconditions: 1 fails the gate, 2 and 3 pass, (1,2) are near-dups
    val q = docs.select(col("doc_id"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(1L) < 0.5, s"fixture drifted: q(1)=${q(1L)}")
    assert(q(2L) >= 0.5 && q(3L) >= 0.5, s"fixture drifted: $q")
    val j = docs.filter(col("doc_id").isin(1, 2))
    val pairs = graft.dedup.Dedup.jaccardPairs(j, "doc_id", "text", "source", 0.9)
    assert(pairs.count() == 1, "fixture drifted: (1,2) must be a >=0.9 pair")
    // the composition: 1 filtered out, 2 re-elected keeper, 3 kept
    val clean = CorpusClean(docs).select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(2L, 3L), s"clean=$clean")
  }

  test("scaled (corpus-wide) survivors are a subset of the blocked survivors") {
    // Corpus-wide dedup merges every pair the blocked path merges PLUS
    // cross-source mirrors: each blocked component sits inside a corpus-
    // wide one, and a doc that is min of the bigger component is min of
    // its sub-component — so scaled survivors ⊆ blocked survivors.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val blocked = CorpusClean(docs).select("doc_id").as[Long].collect().toSet
    val scaled = CorpusClean.scaled(docs).select("doc_id").as[Long].collect().toSet
    assert(scaled.subsetOf(blocked), s"extra scaled survivors: ${scaled -- blocked}")
    assert(scaled.nonEmpty)
    // and both compositions apply the same quality/language gate: every
    // survivor set is drawn from the same filtered universe
    val gated = docs.filter(
      graft.text.TextAnalysis.qualityScore(col("text")) >= 0.5 &&
        graft.text.TextAnalysis.langId(col("text")) === "en")
      .select("doc_id").as[Long].collect().toSet
    assert(blocked.subsetOf(gated))
    // F134 valve (r13): the scaled face now defaults maxBucket = 4096 —
    // at fixture scale no band bucket approaches the cap, so the
    // default-capped output must equal the uncapped one bit-for-bit
    // (the exact-CC oracle for `corpus_clean_scaled` rests on this).
    val uncapped = CorpusClean.scaled(docs, maxBucket = Int.MaxValue)
      .select("doc_id").as[Long].collect().toSet
    assert(scaled == uncapped, "default valve must not bind at fixture scale")
  }

  test("output is invariant to the stage materializer (r10)") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog of it is in that it went to " +
        "the market and bought some of the best fresh bread in town today", "src1"),
      (2L, "the cat sat on the mat and it was happy to be in the sun all of the day", "src1"))
      .toDF("doc_id", "text", "source")
    val persisted = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]
    val diskMat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
      df =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count()
        persisted += p
        p
    }
    try {
      val a = CorpusClean(docs).collect().toSeq
      val b = CorpusClean(docs, materialize = diskMat).collect().toSeq
      assert(a == b, "materializer changed the output")
    } finally persisted.foreach(_.unpersist())
  }
}
