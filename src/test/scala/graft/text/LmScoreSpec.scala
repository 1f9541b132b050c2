package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bigram LM scorer: hand-computed MLE costs, non-negativity,
  * the fluency ordering it exists to produce, and bigram-less handling. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed Laplace costs on a 3-doc corpus") {
    // Corpus: "a b", "a b", "a c". Unigrams: a=3, b=2, c=1; V = 3.
    // Bigrams: "a b"=2, "a c"=1.
    // cost("a b") = floor(ln((3+3)/(2+1))*1e6) = floor(ln(2)*1e6) = 693147
    // cost("a c") = floor(ln((3+3)/(1+1))*1e6) = floor(ln(3)*1e6) = 1098612
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = LmScore.scores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (1L, 693147L, 693147L))
    assert(out(2L) == (1L, 693147L, 693147L))
    assert(out(3L) == (1L, 1098612L, 1098612L))
  }

  test("costs are non-negative and common phrasing scores lower") {
    val common = (1 to 20).map(_ => "the quick brown fox jumps").mkString(" ")
    val docs = (1 to 10).map(i => (i.toLong, common)) :+
      (99L, "zxq qzx xqz qxz zqx")
    val out = LmScore.scores(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.values.forall(_ >= 0L))
    assert(out(1L) < out(99L)) // repeated fluent phrasing beats unique junk
  }

  test("quality floor keeps the at-or-below-median half") {
    val docs = ((1 to 8).map(i => (i.toLong, "the quick brown fox")) :+
      (9L, "qzx zxq xqz")).toDF("doc_id", "text")
    val kept = LmScore.qualityFloor(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // 8 identical fluent docs share the minimum cost = the median; the
    // junk doc sits above it and drops.
    assert(kept == (1L to 8L).toSet)
  }

  test("documents without bigrams are absent; case folds") {
    val docs = Seq((1L, "Solo"), (2L, ""), (3L, "Two TOKENS"), (4L, "two tokens"))
      .toDF("doc_id", "text")
    val out = LmScore.scores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(3L, 4L))
    assert(out(3L) == out(4L)) // lowercasing merges the bigram stats
  }
}
