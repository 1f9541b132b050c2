package graft.pipeline

import graft.{CcNetFixture, SparkSpec}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the CCNet preset's per-stage attrition on the engineered
  * fixture; end-to-end values are hash-checked against the DuckDB
  * WITH-chain by the driver gate. */
class CcNetPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = CcNetFixture.docs.toDF("doc_id", "text")

  test("stage 1: paragraph dedup strips boilerplate; all-boilerplate doc vanishes") {
    val pd = graft.dedup.ParagraphDedup
      .dedupParagraphs(fixture, "doc_id", "text")
      .filter(col("n_kept") > 0)
    val ids = pd.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(4L), "doc 4 is License+Nav only — both are dups")
    assert(ids == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L, 10L))
    // doc 2 keeps only its unique middle paragraph (License/Nav first
    // occurrences live in doc 1).
    val d2 = pd.filter(col("doc_id") === 2L).select("text_clean")
      .as[String].head()
    assert(d2.startsWith("the cat sat") && !d2.contains("licensed"))
  }

  test("stage 2: language gate drops the French and gibberish docs") {
    val langs = fixture
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(langs(5L) == "fr" && langs(6L) == "und")
    assert(Seq(1L, 2L, 3L, 7L, 8L, 9L, 10L).forall(langs(_) == "en"))
  }

  test("end-to-end: tail tier is cut — rare-vocab doc 9 and boilerplate-heavy doc 1") {
    val out = CcNetPipeline(fixture)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.keySet == Set(2L, 3L, 7L, 8L, 10L), s"kept set drifted: ${out.keySet}")
    assert(out.values.toSet == Set("head", "middle"))
    assert(out.values.count(_ == "head") == 3, "ntile big-buckets-first: 7 -> 3,2,2")
  }

  test("output is invariant to input partitioning") {
    val a = CcNetPipeline(fixture).collect().toSeq
    val b = CcNetPipeline(fixture.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("NFC ahead of the paragraph norms: an NFD boilerplate twin collapses (r10)") {
    val boiler = "Licensed under the café commons terms for everyone."
    val boilerNfd =
      java.text.Normalizer.normalize(boiler, java.text.Normalizer.Form.NFD)
    assert(boiler != boilerNfd, "fixture must be byte-different")
    // Raw-byte norms would differ -> each paragraph unique -> both kept;
    // the r10 NFC stage collapses them, so doc 2 loses its NFD copy.
    val docs = Seq(
      (1L, boiler + "\n\nthe first unique body paragraph sits here."),
      (2L, boilerNfd + "\n\nthe second unique body paragraph sits here."))
      .toDF("doc_id", "text")
    val pd = CcNetPipeline.stages(docs).pd
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pd(1L).toLowerCase.contains("licensed"), pd(1L))
    assert(!pd(2L).toLowerCase.contains("licensed"),
      s"doc 2 must lose the NFD boilerplate twin: ${pd(2L)}")
  }

  test("cross-fit model normalizes at the shared stages() entry, any path (r10)") {
    // An NFD-decomposed model must price identically to its composed
    // twin — the normalization lives inside stages(), so the public
    // stages(crossFitModel=...) entry can't fit on raw bytes while the
    // corpus is normalized.
    val modelComposed = Seq((100L, "the café prose model fits the corpus well " +
      "and the words repeat the common patterns of the text"))
      .toDF("doc_id", "text")
    val modelNfd = modelComposed.withColumn("text",
      udf((s: String) => java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFD)).apply(col("text")))
    def tiers(m: org.apache.spark.sql.DataFrame) =
      CcNetPipeline.stages(fixture, crossFitModel = Some(m)).tiers
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(tiers(modelNfd) == tiers(modelComposed),
      "NFD model text must be normalized before the LM fit")
  }

  test("output is invariant to the stage materializer (r10)") {
    val persisted = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]
    val diskMat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
      df =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count()
        persisted += p
        p
    }
    try {
      val a = CcNetPipeline(fixture).collect().toSeq
      val b = CcNetPipeline(fixture, materialize = diskMat).collect().toSeq
      assert(a == b, "materializer changed the output")
    } finally persisted.foreach(_.unpersist())
  }

  test("cross-fit stage 3: off-model vocabulary is pushed toward the tail") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val model = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en")
    val crossKept = CcNetPipeline.applyCrossFit(docs, model)
      .select("doc_id").as[Long].collect().toSet
    val selfKept = CcNetPipeline(docs)
      .select("doc_id").as[Long].collect().toSet
    // same stages 1-2 -> same scored population; both keep ~2/3 of it
    assert(crossKept.nonEmpty && selfKept.nonEmpty)
    assert(math.abs(crossKept.size - selfKept.size) <= 1,
      "tercile cut sizes must agree between fit variants")
    // the MODELS differ, so the kept SETS genuinely differ — the
    // cross-fit stage is not a re-labeled self-fit
    assert(crossKept != selfKept,
      "cross-fit unexpectedly identical to self-fit on mixed-domain docs")
  }
}
