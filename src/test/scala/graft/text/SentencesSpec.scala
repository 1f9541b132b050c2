package graft.text

import graft.SparkSpec

/** Pins the sentence contract (terminal-punct match, closing quote,
  * dropped punctuation-free tail, cross-newline normalization) and the
  * quantized chunk assignment (whole sentences, first-token rule). */
class SentencesSpec extends SparkSpec {
  import spark.implicits._

  test("sentence extraction: quotes, tails, newline spans") {
    val text = "First one here. He said \"quoted end.\" no punct tail " +
      "continues\nacross lines until it ends! leftover without ending"
    val out = Sentences.sentenceChunks(
        Seq((1L, text)).toDF("doc_id", "text"), budgetTokens = 100)
      .select("sentence").as[String].collect().toSeq
    assert(out == Seq(
      "First one here.",
      "He said \"quoted end.\"",
      // the punctuation-free stretch folds into the NEXT sentence, with
      // its line break collapsed to one space
      "no punct tail continues across lines until it ends!"))
    // "leftover without ending" has no terminal punct: dropped.
  }

  test("chunk assignment: straddling sentence goes whole to its first-token chunk") {
    // Sentences of 8 tokens each; budget 20. Cumulative-before values:
    // 0, 8, 16, 24, 32 -> chunks 0, 0, 0, 1, 1. The third sentence
    // STARTS at token 16 < 20, so it belongs to chunk 0 even though it
    // ends at 24 — never split, never duplicated.
    val s = "one two three four five six seven eight."
    val text = Array.fill(5)(s).mkString(" ")
    val out = Sentences.sentenceChunks(
        Seq((1L, text)).toDF("doc_id", "text"), budgetTokens = 20)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).forall(_ == 8))
    assert(out.map(_._2).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("every sentence lands in exactly one chunk (no splits, no drops)") {
    val docs = graft.C4Fixture.docs.toDF("doc_id", "text")
    val out = Sentences.sentenceChunks(docs, budgetTokens = 20)
    val perDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Each fixture page yields its full sentence count once.
    assert(perDoc.values.sum == out.count())
    // chunk ids are non-decreasing along sent_idx within a doc
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
    assert(rows.forall { g =>
      val cs = g.sortBy(_._2).map(_._3)
      cs.zip(cs.drop(1)).forall { case (a, b) => a <= b }
    })
  }
}
