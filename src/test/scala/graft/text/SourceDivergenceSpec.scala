package graft.text

import graft.SparkSpec

/** Pins the per-source KL semantics: zero for identical distributions,
  * hand-computed micro-nat numerators on a two-token corpus, and
  * ordering (the skewed source diverges more). */
class SourceDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("identical source distributions give exactly zero") {
    // Two sources, byte-identical token distribution: every pair term
    // has c_st*N == n_s*c_t, ln(1) = 0, floor(0) = 0 — exact zero, not
    // epsilon.
    val docs = Seq(
      (1L, "alpha beta beta gamma", "s1"),
      (2L, "alpha beta beta gamma", "s2")
    ).toDF("doc_id", "text", "source")
    val out = SourceDivergence.sourceKl(docs).collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(2) == 0.0))
    assert(out.forall(_.getLong(1) == 4L))
  }

  test("hand-computed KL on a two-token corpus") {
    // s1 = {a:3, b:1} (N_s=4), s2 = {a:1, b:3} (N_s=4), corpus
    // {a:4, b:4} (N=8). KL(s1||corpus) = 0.75*ln(1.5) + 0.25*ln(0.5).
    // Engine numerator: 3*floor(1e6*ln(3*8/(4*4))) + 1*floor(1e6*ln(1*8/(4*4)))
    //                 = 3*floor(405465.108...) + floor(-693147.18...)
    //                 = 3*405465 + (-693148) = 523247
    // kl_nats = round(523247/4/1e6, 4) = round(0.13081175, 4) = 0.1308
    val docs = Seq(
      (1L, "a a a b", "s1"),
      (2L, "a b b b", "s2")
    ).toDF("doc_id", "text", "source")
    val out = SourceDivergence.sourceKl(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("s1") == 0.1308)
    assert(out("s2") == 0.1308) // symmetric construction
  }

  test("a skewed source diverges more than a near-corpus one") {
    val docs = (
      (1 to 8).map(i => (i.toLong, "common words shared by everyone", "bulk")) ++
      Seq((9L, "common words shared by everyone", "near"),
          (10L, "rare exotic unique vocabulary outlier", "skew"))
      ).toDF("doc_id", "text", "source")
    val out = SourceDivergence.sourceKl(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("skew") > out("near"))
    assert(out("near") >= 0.0 && out("bulk") >= 0.0)
  }
}
