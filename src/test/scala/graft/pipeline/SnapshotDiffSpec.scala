package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-diff contracts on a hand-built version pair: exact status
  * assignment, unchanged docs omitted, and the summary counts. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldV = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")
  ).toDF("doc_id", "text")
  private val newV = Seq(
    (2L, "bravo"),          // unchanged -> omitted
    (3L, "charlie edited"), // changed
    (4L, "delta"),          // unchanged -> omitted
    (5L, "echo")            // added
  ).toDF("doc_id", "text")  // 1 removed

  test("statuses: added / removed / changed; unchanged omitted") {
    val got = SnapshotDiff.snapshotDiff(oldV, newV, "doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "removed"), (3L, "changed"), (5L, "added")))
  }

  test("summary counts the churn by status") {
    val d = SnapshotDiff.snapshotDiff(oldV, newV, "doc_id", "text")
    val got = SnapshotDiff.summary(d).as[(String, Long)].collect().toSeq
    assert(got === Seq(("added", 1L), ("changed", 1L), ("removed", 1L)))
  }

  test("diff of identical snapshots is empty") {
    assert(SnapshotDiff.snapshotDiff(oldV, oldV, "doc_id", "text").isEmpty)
  }
}
