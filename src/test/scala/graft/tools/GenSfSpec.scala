package graft.tools

import graft.SparkSpec

/** The scale-up generator's statistical-fidelity contract: a
  * multiplier-0.1 generation (500 docs, 60k lineitems) must land inside
  * loose bands around the driver fixture's measured marginals — the
  * properties the scaling audit's honesty rests on (lang mix, token
  * uniformity, dup-token rate, Poisson line counts, exponential event
  * values, unit-norm embeddings). Bands are wide enough for 500-row
  * sampling noise; the r12 multiplier-1.0 side-by-side against the real
  * sf0.1 is recorded in BASELINE.md. */
class GenSfSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("gensf_spec").toString
    GenSf.generate(spark, d, 0.1)
    d
  }

  test("documents: sizes, lang mix, vocab, dup rate, exact-copy determinism") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.count() == 500)
    import org.apache.spark.sql.functions._
    val langs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs("en") > 150 && langs("en") < 260, s"en share: $langs")
    assert(langs.keySet == Set("en", "de", "es", "fr", "zh"))
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
    val n = toks.count()
    val dupShare = toks.filter(col("w") === "dup").count().toDouble / n
    assert(dupShare > 0.0002 && dupShare < 0.003, s"dup share $dupShare")
    val vocab = toks.distinct().count()
    assert(vocab >= 30 && vocab <= 31, s"vocab $vocab") // 30 + maybe dup
    val lens = docs.select(size(split(col("text"), " ")).as("l"))
      .agg(min(col("l")), max(col("l")), avg(col("l"))).collect().head
    assert(lens.getInt(0) >= 10 && lens.getInt(1) <= 100)
    assert(math.abs(lens.getDouble(2) - 55.0) < 4.0)
    // regeneration is bit-identical (pure function of ids)
    val d2 = java.nio.file.Files.createTempDirectory("gensf_spec2").toString
    GenSf.generate(spark, d2, 0.1)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$d2/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "generation must be deterministic")
  }

  test("seeded protocol: same seed regenerates byte-exact, new seed redraws (r13)") {
    // The BASELINE.md scale tables are regenerable from their recorded
    // (seed, multiplier) pairs alone — the contract is (1) an explicit
    // seed reproduces the default-seed corpus exactly when equal, and
    // (2) a different seed is a genuinely fresh draw of the SAME
    // process (marginals hold, rows differ).
    import org.apache.spark.sql.functions._
    val same = java.nio.file.Files.createTempDirectory("gensf_seed42").toString
    GenSf.generate(spark, same, 0.1, seed = GenSf.DefaultSeed)
    val a = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$same/documents.parquet")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "explicit default seed must reproduce the corpus byte-exact")
    val fresh = java.nio.file.Files.createTempDirectory("gensf_seed7").toString
    GenSf.generate(spark, fresh, 0.1, seed = 7L)
    val c = spark.read.parquet(s"$fresh/documents.parquet")
    assert(c.count() == 500, "sizes are seed-invariant")
    val cRows = c.orderBy("doc_id").collect().toSeq
    assert(cRows != a, "a different seed must redraw the rows")
    val langs = c.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.keySet == Set("en", "de", "es", "fr", "zh"),
      "marginal process is seed-invariant")
  }

  test("lineitem: Poisson line counts, uniform marginals in range") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(li.count() == 60000)
    val perOrder = li.groupBy("l_orderkey").count()
    val distinctOrders = perOrder.count()
    // Poisson(4) over 15,000 orders: ~275 orders get zero lines
    assert(distinctOrders > 14200 && distinctOrders < 14900,
      s"orders hit: $distinctOrders")
    val q = li.agg(min(col("l_quantity")), max(col("l_quantity")),
      avg(col("l_quantity")), min(col("l_discount")), max(col("l_discount")))
      .collect().head
    assert(q.getDouble(0) >= 1.0 && q.getDouble(1) <= 50.0)
    assert(math.abs(q.getDouble(2) - 25.5) < 1.0)
    assert(q.getDouble(3) >= 0.0 && q.getDouble(4) <= 0.1)
  }

  test("events: exponential values, user key space, ts span") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    assert(ev.count() == 10000)
    val v = ev.agg(avg(col("value")), expr("percentile(value, 0.5)"),
      countDistinct(col("user_id"))).collect().head
    assert(math.abs(v.getDouble(0) - 50.0) < 3.0, s"mean ${v.getDouble(0)}")
    assert(math.abs(v.getDouble(1) - 34.7) < 3.0, s"median ${v.getDouble(1)}")
    assert(v.getLong(2) > 130 && v.getLong(2) <= 150)
  }

  test("embeddings: unit norm, faint label signal only") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(emb.count() == 200)
    val norms = emb.select(sqrt(aggregate(
        transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x)).as("n"))
      .agg(min(col("n")), max(col("n"))).collect().head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    val labels = emb.select(countDistinct(col("label"))).collect().head.getLong(0)
    assert(labels == 10)
  }
}
