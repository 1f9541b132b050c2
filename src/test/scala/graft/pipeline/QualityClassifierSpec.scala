package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the trained quality classifier: separation on a planted corpus
  * (repeated fluent phrasing vs unique gibberish — the weak-label
  * median split makes fluent docs positives), scoring coverage of every
  * document including token-less ones, determinism of the integer
  * fixed-point training, and the CorpusClean pre-gate composition. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val fluent = "the quick brown fox jumps over the lazy dog again"
  // Gibberish tokens are CHOSEN (md5 is deterministic) so none shares an
  // md5 bucket with a fluent token at the default 256 buckets — a
  // collided bucket is genuinely inseparable under the hashing trick, so
  // the spec plants the separable case the operator contracts to solve.
  private def docs = (
    (1 to 10).map(i => (i.toLong, fluent, "wiki")) ++
      Seq(
        (21L, "zxq1 qzx1 vbn1 wmt1 gkr1", "crawl"),
        (22L, "plx1 snv1 dqf1 hjw1 cty1", "crawl"),
        (23L, "zxq2 qzx2 vbn2 wmt2 gkr2", "crawl"),
        (24L, "snv2 dqf2 hjw2 cty2 zxq3", "crawl"),
        (25L, "qzx3 vbn3 wmt3 gkr3 plx3", "crawl"))
    ).toDF("doc_id", "text", "source")

  test("classifier separates planted fluent docs from gibberish") {
    val out = QualityClassifier.classify(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    (1L to 10L).foreach { id =>
      assert(out(id)._2 == 1, s"fluent doc $id rejected: ${out(id)}")
      assert(out(id)._1 > 500000L)
    }
    (21L to 25L).foreach { id =>
      assert(out(id)._2 == 0, s"gibberish doc $id kept: ${out(id)}")
      assert(out(id)._1 < 500000L)
    }
  }

  test("every document is scored; token-less docs default to keep") {
    val withEmpty = docs.union(Seq((99L, "", "crawl")).toDF("doc_id", "text", "source"))
    val out = QualityClassifier.classify(withEmpty, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.keySet.size == 16)
    assert(out(99L) == (500000L, 1)) // z = 0: no evidence against it
  }

  test("training is deterministic: identical runs, identical scores") {
    val a = QualityClassifier.classify(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    val b = QualityClassifier.classify(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("CorpusClean classifier gate drops only classifier-rejected docs") {
    val keepIds = QualityClassifier.classify(docs, "doc_id", "text")
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    val gated = CorpusClean.withClassifierGate(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(gated.subsetOf(keepIds),
      s"gated output $gated not within classifier keeps $keepIds")
    assert(gated.contains(1L)) // a fluent doc survives end-to-end
  }

  test("calibration table reconciles to scores and labels (r11)") {
    val cal = QualityClassifier.calibration(docs, "doc_id", "text")
      .collect()
    val scored = QualityClassifier.classify(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = QualityClassifier.weakLabels(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bin totals cover every scored doc exactly once
    assert(cal.map(_.getLong(1)).sum == scored.size)
    assert(cal.map(_.getLong(2)).sum == labels.size)
    cal.foreach { r =>
      val bin = r.getLong(0)
      val inBin = scored.filter { case (_, s) => math.min(s / 100000, 9L) == bin }
      assert(r.getLong(1) == inBin.size, s"bin $bin n_docs")
      val labeled = inBin.keySet.intersect(labels.keySet)
      assert(r.getLong(2) == labeled.size, s"bin $bin n_labeled")
      val pos = labeled.count(labels(_) == 1000000L)
      assert(r.getLong(3) == pos, s"bin $bin n_pos")
      if (labeled.nonEmpty) {
        assert(r.getLong(4) == pos * 1000L / labeled.size, s"bin $bin obs_pm")
        val sp = labeled.toSeq.map(scored).sum
        assert(r.getLong(5) == sp / (labeled.size * 1000L), s"bin $bin pred_pm")
        assert(r.getLong(6) == math.abs(r.getLong(5) - r.getLong(4)))
      } else assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }
}
