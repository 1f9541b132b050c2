package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Index compaction contracts across all three persisted index schemas:
  * no-op on well-formed indexes, idempotence, and recovery of the
  * from-scratch index after an at-least-once replay corrupted it. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def same(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("no-op on a well-formed content-hash index; idempotent") {
    val docs = Tables.documents(spark, dir)
    val idx = Dedup.exactIndex(docs, "doc_id", "text")
    val once = IndexMaintenance.compact(idx)
    assert(same(once, idx))
    assert(same(IndexMaintenance.compact(once), once))
  }

  test("replayed batch append collapses back to the from-scratch index") {
    val docs = Tables.documents(spark, dir)
    val hist = docs.filter($"doc_id" < 250)
    val batch = docs.filter($"doc_id" >= 250)
    val good = Dedup.exactIndexAfterBatch(
      Dedup.exactIndex(hist, "doc_id", "text"), batch, "doc_id", "text")
    // the at-least-once failure mode: the batch's novel entries appended
    // a second time — duplicate h rows across files
    val batchNovel = Dedup.exactIndex(batch, "doc_id", "text")
      .join(Dedup.exactIndex(hist, "doc_id", "text").select($"h"), Seq("h"), "left_anti")
    val corrupted = good.unionByName(batchNovel)
    assert(corrupted.count() > good.count())
    assert(same(IndexMaintenance.compact(corrupted), good))
  }

  test("earliest keeper wins per hash (paragraph/window schema shape)") {
    // window-index schema: (h, keeper_doc_id, keeper_start) — the later
    // duplicate entry (from a replay racing a concurrent append) loses.
    val corrupted = Seq(
      ("aa", 1L, 0L), ("aa", 7L, 3L), // duplicate h: (1,0) is first
      ("bb", 2L, 5L)
    ).toDF("h", "keeper_doc_id", "keeper_start")
    val got = IndexMaintenance.compact(corrupted)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("aa", 1L, 0L), ("bb", 2L, 5L)))
  }

  test("rewriteCompacted: round-trips content into numFiles sorted files") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_compact").toString
    val docs = Tables.documents(spark, dir)
    val idx = Dedup.exactIndex(docs, "doc_id", "text")
    // simulate per-batch appends (many small files, one duplicated)
    idx.filter(substring($"h", 1, 1) < "8").coalesce(1).write.mode("append").parquet(s"$root/in")
    idx.filter(substring($"h", 1, 1) >= "8").coalesce(1).write.mode("append").parquet(s"$root/in")
    idx.filter(substring($"h", 1, 1) >= "8").coalesce(1).write.mode("append").parquet(s"$root/in")
    IndexMaintenance.rewriteCompacted(spark, s"$root/in", s"$root/out", 2)
    val out = spark.read.parquet(s"$root/out")
    assert(same(out, idx))
    val files = new java.io.File(s"$root/out").listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length <= 2)
  }

  test("compactBy: doc_id-keyed signature index — replay dups collapse, idempotent") {
    val docs = Tables.documents(spark, dir).limit(50)
    val sig = Dedup.signatureTable(docs, "doc_id", "text")
    // a replayed batch appended every row twice
    val corrupted = sig.unionByName(sig)
    val compacted = IndexMaintenance.compactBy(corrupted, "doc_id")
    assert(compacted.count() == sig.count())
    assert(compacted.select("doc_id").distinct().count() == compacted.count())
    // idempotent, and equal to the clean index row-for-row
    val again = IndexMaintenance.compactBy(compacted, "doc_id")
    assert(same(again, compacted))
    assert(same(compacted, sig))
  }
}
