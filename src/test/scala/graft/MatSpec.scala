package graft

import org.apache.spark.sql.functions._

/** Pins the session-wide materializer knob ([[Mat]]): every mode is
  * eager, every mode yields identical operator output — the conf changes
  * WHERE stage frames live (executor-loss tolerance), never WHAT is
  * computed. */
class MatSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today", "https://a.site.com/1"),
    (2L, "the quick brown fox jumps over the lazy dog today", "https://b.site.com/2"),
    (3L, "the quick brown fox jumps over the lazy dog today extra", "https://a.site.com/3"),
    (4L, "the first capped domain doc reads fine", "https://x.otherdom.org/4"),
    (5L, "the second capped domain doc looks good", "https://y.otherdom.org/5"))
    .toDF("doc_id", "text", "url")

  private def withMode[A](mode: Option[String])(body: => A): A = {
    mode.foreach(spark.conf.set(Mat.ConfKey, _))
    try body
    finally spark.conf.unset(Mat.ConfKey)
  }

  test("all modes produce identical dedup + preset output") {
    val th = graft.text.GopherRules.Thresholds(minWords = 5L, minStopHits = 1L)
    def run(): (Seq[(Long, Long)], Seq[Long]) = {
      val keepers = graft.dedup.Dedup
        .nearDupKeepersScaled(docs, "doc_id", "text", 0.9)
        .select("doc_id", "keeper_id").as[(Long, Long)].collect().sorted.toSeq
      val preset = graft.pipeline.RefinedWebPipeline(docs, gopherTh = th, cap = 1)
        .select("doc_id").as[Long].collect().sorted.toSeq
      (keepers, preset)
    }
    val base = withMode(None)(run()) // default: localCheckpoint
    for (mode <- Seq("diskOnly", "memoryAndDisk")) {
      assert(withMode(Some(mode))(run()) == base, s"mode $mode diverged")
    }
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_mat_ckpt").toString
    spark.conf.set(Mat.CheckpointDirKey, ckptDir)
    try assert(withMode(Some("reliable"))(run()) == base, "reliable mode diverged")
    finally spark.conf.unset(Mat.CheckpointDirKey)
  }

  test("persist modes are eager (frames are populated at pin time)") {
    withMode(Some("diskOnly")) {
      val pinned = Mat.pin(docs.filter($"doc_id" <= 3))
      // eager: the storage blocks exist before any caller action
      assert(pinned.rdd.getNumPartitions > 0)
      assert(pinned.queryExecution.optimizedPlan.stats.sizeInBytes > 0)
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "diskOnly must have persisted eagerly")
      pinned.unpersist()
    }
  }

  test("pinTransient maps reliable to diskOnly (no checkpoint dir per micro-batch)") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_mat_trans").toString
    spark.conf.set(Mat.CheckpointDirKey, ckptDir)
    try withMode(Some("reliable")) {
      val pinned = Mat.pinTransient(docs)
      assert(pinned.count() == 5)
      // the stream-recovery story covers transient frames; no reliable
      // checkpoint directories may be written for them
      val wrote = new java.io.File(ckptDir).listFiles()
      assert(wrote == null || wrote.isEmpty,
        s"pinTransient must not write reliable checkpoints: ${wrote.mkString(",")}")
      pinned.unpersist()
    } finally spark.conf.unset(Mat.CheckpointDirKey)
  }

  test("an unknown mode fails loudly, not silently un-materialized") {
    withMode(Some("ramDiskTurbo")) {
      val e = intercept[IllegalArgumentException](Mat.pin(docs))
      assert(e.getMessage.contains("spark.graft.materialize"), e.getMessage)
    }
  }
}
