package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: equivalence with the direct theta join, boundary
  * semantics, multi-bin intervals, and the no-nested-loop plan contract. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // points: (pid, key, t); intervals: (key, start, end, label)
  private def points = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")), // inside A
    (2L, "u1", ts("2024-01-01 09:00:00")), // exactly at A.start -> inside
    (3L, "u1", ts("2024-01-01 11:00:00")), // exactly at A.end -> OUTSIDE
    (4L, "u1", ts("2024-01-02 05:30:00")), // inside B (multi-bin interval)
    (5L, "u2", ts("2024-01-01 10:00:00")), // u2 has no interval -> dropped
    (6L, "u1", ts("2024-01-03 00:00:00"))  // outside everything
  ).toDF("pid", "k", "t")

  private def intervals = Seq(
    ("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), "A"),
    ("u1", ts("2024-01-02 00:00:00"), ts("2024-01-02 08:00:00"), "B") // spans many 30-min bins
  ).toDF("k", "s", "e", "label")

  private def run(binSeconds: Long) = RangeJoin.pointInInterval(
    points, intervals, "t", "s", "e", Seq("k"),
    Seq("label" -> "label"), binSeconds)

  test("matches the direct theta join, half-open [start, end)") {
    val direct = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.s" && $"p.t" < $"i.e")
      .select($"pid", $"label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (bin <- Seq(60L, 1800L, 86400L)) {
      val binned = run(bin).select($"pid", $"label")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(binned == direct, s"bin=$bin")
    }
    assert(direct == Set((1L, "A"), (2L, "A"), (4L, "B")))
  }

  test("no duplicate rows even when an interval spans many bins") {
    val out = run(60L) // interval B covers 480 one-minute bins
    assert(out.count() == out.dropDuplicates("pid", "label").count())
  }

  test("interval ending on a bin edge does not claim the next bin") {
    // A ends exactly at 11:00 with 1800s bins (11:00 is a bin edge): point
    // 3 at 11:00 must not match via a spurious bin row.
    assert(!run(1800L).select("pid").as[Long].collect().contains(3L))
  }

  test("degenerate intervals (end <= start) match nothing and never fan out") {
    // Zero-length and reversed intervals can't contain any point under
    // [start, end). The reversed one ends ~2 years before it starts — before
    // the guard, sequence() would generate a DESCENDING multi-thousand-bin
    // array for it (wasted fan-out, OOM risk at scale).
    val bad = Seq(
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), "Z"), // empty
      ("u1", ts("2024-01-01 10:00:00"), ts("2022-01-01 10:00:00"), "R")  // reversed
    ).toDF("k", "s", "e", "label")
    val out = RangeJoin.pointInInterval(points, intervals.unionByName(bad),
      "t", "s", "e", Seq("k"), Seq("label" -> "label"), 1800L)
      .select($"pid", $"label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "A"), (2L, "A"), (4L, "B")))
  }

  test("plan: equi-join on (key, bin) — no nested-loop/cartesian") {
    val df = run(1800L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
