package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the DSIR importance-weight semantics: target-like raw documents
  * out-score off-target ones, weights scale with evidence, the empty
  * document is 0, and the whole computation is deterministic. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target vocabulary disjoint from the off-target one: every target
  // doc repeats "physics" words, off-target docs repeat "market" words.
  private val corpus = (
    (1 to 10).map(i => (i.toLong,
      "quantum field theory lattice gauge boson fermion spinor", "wiki")) ++
    (11 to 20).map(i => (i.toLong,
      "market quarterly earnings revenue dividend forecast guidance", "crawl")) ++
    Seq((21L, "quantum boson market lattice gauge fermion spinor theory", "crawl"),
        (22L, "", "crawl"))
    ).toDF("doc_id", "text", "source")

  test("target-like documents out-score off-target ones") {
    val w = Dsir.weights(corpus, col("source") === "wiki")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Pure target-vocab crawl doc 21 (7 of 8 words from the target
    // vocabulary) must beat every pure off-target doc.
    val offTarget = (11L to 20L).map(w)
    assert(offTarget.forall(_ < w(21L)))
    // Target docs score identically (same text) and positively vs crawl.
    assert((1L to 10L).map(w).distinct.size == 1)
    assert(w(1L) > offTarget.max)
    // Empty doc contributes no evidence: exactly 0.
    assert(w(22L) == 0L)
  }

  test("weights are deterministic and total (every raw doc scored)") {
    val a = Dsir.weights(corpus, col("source") === "wiki").collect()
    val b = Dsir.weights(corpus, col("source") === "wiki").collect()
    assert(a.sameElements(b))
    assert(a.length == 22)
  }

  test("weight table holds one row per occupied bucket, int micro-nats") {
    val wt = Dsir.weightTable(corpus, col("source") === "wiki", "text", 64)
      .collect()
    assert(wt.length <= 64)
    // Bucket weights are integers; buckets holding only target tokens
    // are positive, only-off-target buckets negative (Laplace keeps
    // magnitudes finite).
    assert(wt.exists(_.getLong(1) > 0) && wt.exists(_.getLong(1) < 0))
  }
}
