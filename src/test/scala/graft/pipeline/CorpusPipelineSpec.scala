package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the composed assembly line's stage semantics that the end-to-end
  * oracle can't isolate: the df-thresholded span-dedup stage runs BEFORE
  * the quality floor and exact dedup, the benchmark slice is matched
  * against the UNMODIFIED scrubbed text, and rare 2-copy spans survive so
  * the whole-doc exact dedup stays non-redundant. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 30 distinct filler tokens keep a doc above the 20-token floor.
  private def body(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
  private val boiler = (1 to 20).map(i => s"chrome$i").mkString(" ")

  test("df-thresholded span removal precedes the quality floor") {
    // boiler is one exact 20-token block heading 3 docs (df = 3 >= 3):
    // removed from docs 2 and 3. Doc 3 is ONLY boiler + 5 tokens, so once
    // the block is gone it falls under the 20-token floor and vanishes
    // from the packing output — proof the stage runs before the gate.
    val docs = Seq(
      (1L, s"$boiler ${body("a")}"),
      (2L, s"$boiler ${body("b")}"),
      (3L, s"$boiler tail1 tail2 tail3 tail4 tail5"),
      (4L, body("c"))
    ).toDF("doc_id", "text")
    val out = CorpusPipeline(docs, sampleBp = 10000, benchMod = 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(3L))
    assert(out(1L) == 50L) // keeper doc retains its boiler block
    assert(out(2L) == 30L) // later doc lost the 20-token block
    assert(out(4L) == 30L)
  }

  test("2-copy spans survive; identical docs still collapse at exact dedup") {
    // The shared block occurs only twice (< 3), so span dedup keeps both
    // copies and docs 1/2 stay byte-identical — the exact-dedup stage
    // must be the one that collapses them (keeper = min doc_id).
    val dup = s"$boiler ${body("d")}"
    val docs = Seq((1L, dup), (2L, dup), (3L, body("e"))).toDF("doc_id", "text")
    val ids = CorpusPipeline(docs, sampleBp = 10000, benchMod = 1000000)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("repetition gate drops exactly the stuffed doc at stage 3c") {
    // Doc 7 repeats one bigram heavily (top-2-gram fraction over any
    // reasonable cut); doc 6 is distinct filler. With the gate OFF both
    // survive; with it ON only the stuffed doc drops — the stage is a
    // real filter, not wiring.
    val stuffed = ("buy now " * 12) + body("s")
    val docs = Seq((6L, body("p")), (7L, stuffed)).toDF("doc_id", "text")
    def ids(th: Option[graft.text.GopherRepetition.Thresholds]) =
      CorpusPipeline(docs, sampleBp = 10000, benchMod = 1000000,
        repetitionTh = th).select("doc_id").as[Long].collect().toSet
    assert(ids(None) == Set(6L, 7L))
    assert(ids(Some(graft.text.GopherRepetition.Thresholds())) == Set(6L))
  }

  test("contaminated docs drop; benchmark members drop with them") {
    // benchMod = 7 puts doc 0 in the benchmark slice. Doc 9 (not a
    // member) shares > 5 distinct 3-grams with it, so it must drop; the
    // member itself drops too (contaminated with itself); doc 8 is clean.
    val docs = Seq(
      (0L, body("q")),
      (9L, body("q") + " extra1 extra2"),
      (8L, body("r"))
    ).toDF("doc_id", "text")
    val ids = CorpusPipeline(docs, sampleBp = 10000, benchMod = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(8L))
  }

  test("benchmark slice is capped: mod-members past benchCap are not benchmark (r12)") {
    // A pure mod-slice benchmark GROWS with the corpus — at 10× the
    // fixture family its trigram set closed over the vocabulary and
    // flagged everything (BASELINE.md r12 true-scale audit). The cap
    // models the real contract: an eval suite is constant-size.
    // doc 7000 is ≡ 0 (mod 7) but past the cap, so doc 9 sharing its
    // text must SURVIVE; with the cap lifted both drop.
    val docs = Seq(
      (7000L, body("q")),
      (9L, body("q") + " extra1 extra2"),
      (8L, body("r"))
    ).toDF("doc_id", "text")
    val capped = CorpusPipeline(docs, sampleBp = 10000, benchMod = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(9L, 7000L, 8L))
    val uncapped = CorpusPipeline(docs, sampleBp = 10000, benchMod = 7,
        benchCap = Long.MaxValue)
      .select("doc_id").as[Long].collect().toSet
    assert(uncapped == Set(8L))
  }
}
