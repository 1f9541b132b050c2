package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the prefix-filtered exact set-similarity join: equality with a
  * blockless brute force (the losslessness claim), threshold boundary
  * behavior under round(J, 4), hot-token corpora, and degenerate sets. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Blockless brute force via the repo's exact per-pair Jaccard — the
    * in-Spark twin of the DuckDB oracle. */
  private def brute(df: DataFrame, threshold: Double): Set[(Long, Long, Double)] = {
    val t = df.select(col("doc_id").as("id"), Dedup.tokenSet(col("text")).as("toks"))
    val a = t.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("id").as("id_b"), col("toks").as("toks_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(Dedup.jaccard(col("toks_a"), col("toks_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
  }

  private def run(df: DataFrame, threshold: Double): Set[(Long, Long, Double)] =
    SetSimJoin.jaccardJoin(df, "doc_id", "text", threshold)
      .as[(Long, Long, Double)].collect().toSet

  test("equals blockless brute force on a mixed fixture") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),   // 8/10 vs 1
      (3L, "the quick brown fox jumps over the lazy dog"),   // dup of 1
      (4L, "completely different content about spark engines"),
      (5L, "completely different content about spark engines here"),
      (6L, "the the the THE The"),                           // collapses to {the}
      (7L, "the"),                                           // == 6 after tokenSet
      (8L, "")                                               // empty set: no pairs
    ).toDF("doc_id", "text")
    val expect = brute(docs, 0.9)
    assert(expect.contains((1L, 3L, 1.0)) && expect.contains((6L, 7L, 1.0)))
    assert(run(docs, 0.9) == expect)
  }

  test("threshold boundary: round(J, 4) >= t keeps the exact-boundary pair") {
    // 9 shared / 10 union = 0.9 exactly at t = 0.9.
    val shared = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared onlyA"),
      (2L, shared)
    ).toDF("doc_id", "text")
    assert(run(docs, 0.9) == Set((1L, 2L, 0.9)))
    // 8 shared / 10 union = 0.8 must NOT appear at 0.9 but must at 0.8.
    val docs2 = Seq(
      (1L, s"$shared onlyA"),
      (2L, (1 to 8).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    assert(run(docs2, 0.9).isEmpty)
    assert(run(docs2, 0.8) == Set((1L, 2L, 0.8)))
  }

  test("hot tokens stay out of prefixes; output still equals brute force") {
    // Every doc shares the same 5 stopwords; only near-identical docs
    // qualify. The stopwords have maximal document frequency, so the
    // rarest-first prefixes are built from the distinguishing tokens.
    val stop = "a the of and to"
    val docs = (1L to 30L).map { i =>
      val fam = i % 3
      (i, s"$stop family$fam alpha$fam beta$fam gamma$fam delta$fam " +
        (if (i < 28) "" else s"unique$i"))
    }.toDF("doc_id", "text")
    val expect = brute(docs, 0.9)
    assert(expect.nonEmpty)
    assert(run(docs, 0.9) == expect)
  }

  test("lower threshold widens the prefix and still matches brute force") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),
      (3L, "alpha beta zeta eta"),
      (4L, "theta iota kappa lambda"),
      (5L, "theta iota kappa")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.6, 0.75)) {
      assert(run(docs, t) == brute(docs, t), s"threshold $t")
    }
  }

  test("singleton and disjoint sets") {
    val docs = Seq(
      (1L, "solo"), (2L, "solo"), (3L, "other"), (4L, "third word")
    ).toDF("doc_id", "text")
    assert(run(docs, 0.9) == Set((1L, 2L, 1.0)))
  }

  test("incremental == batch-involving rows of the full join (union equivalence)") {
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "totally unrelated history content here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon"),      // dup of history 1
      (11L, "alpha beta gamma delta epsilon"),      // batch-batch dup of 10
      (12L, "brandnew tokens unseen in history"),   // all-unseen tokens
      (13L, "brandnew tokens unseen in history"),   // pairs with 12
      (14L, "totally unrelated fresh content here")
    ).toDF("doc_id", "text")
    val t = 0.8
    val idx = SetSimJoin.index(history, "doc_id", "text", t)
    val got = SetSimJoin.incremental(batch, "doc_id", "text", t, idx)
      .as[(Long, Long, Double)].collect().toSet
    val full = brute(history.unionByName(batch), t)
    val expect = full.filter { case (_, b, _) => b >= 10L }
    assert(expect.exists(_._1 == 12L), "unseen-token pair must qualify")
    assert(expect.exists { case (a, b, _) => a < 10L && b >= 10L },
      "a history-batch pair must qualify")
    assert(got == expect)
    // and no history-history pair leaks out
    assert(!got.exists { case (_, b, _) => b < 10L })
  }

  test("absorb then probe a second batch still matches the full join") {
    val h = Seq((1L, "one two three four"), (2L, "one two three five"))
      .toDF("doc_id", "text")
    val b1 = Seq((10L, "one two three four"), (11L, "six seven eight nine"))
      .toDF("doc_id", "text")
    val b2 = Seq((20L, "six seven eight nine"), (21L, "one two three five"))
      .toDF("doc_id", "text")
    val t = 0.9
    val idx1 = SetSimJoin.absorb(
      SetSimJoin.index(h, "doc_id", "text", t), b1, "doc_id", "text", t)
    val got = SetSimJoin.incremental(b2, "doc_id", "text", t, idx1)
      .as[(Long, Long, Double)].collect().toSet
    val expect = brute(h.unionByName(b1).unionByName(b2), t)
      .filter { case (_, b, _) => b >= 20L }
    assert(expect.size == 2) // (11,20) via the frozen-order-unseen path, (2,21)
    assert(got == expect)
  }

  test("rejects degenerate thresholds") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SetSimJoin.jaccardJoin(docs, "doc_id", "text", 1.0)
    }
    intercept[IllegalArgumentException] {
      SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.0)
    }
  }
}
