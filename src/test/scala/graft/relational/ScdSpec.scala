package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 history: change collapsing, interval chaining, tie-breaks, null
  * hygiene, and the one-shuffle plan contract. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def changes = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 11L, "A"), // unchanged -> collapses
    (1L, ts("2024-01-03 00:00:00"), 12L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 13L, "B"), // unchanged -> collapses
    (1L, ts("2024-01-05 00:00:00"), 14L, "A"), // back to A = a NEW interval
    (2L, ts("2024-01-01 00:00:00"), 20L, "X")
  ).toDF("user_id", "ts", "event_id", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.history(df, "user_id", "ts", "event_type", "event_id")

  test("collapses unchanged rows; intervals chain; last row is current") {
    val out = run(changes).orderBy($"user_id", $"valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 0),
      (1L, "B", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), 0),
      (1L, "A", ts("2024-01-05 00:00:00"), None, 1),
      (2L, "X", ts("2024-01-01 00:00:00"), None, 1)))
  }

  test("simultaneous changes order by the tie-break") {
    val d = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "A")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = run(d).orderBy($"valid_from", $"state")
      .collect().map(r => (r.getString(1), r.getInt(4)))
    // event 1 (A) precedes event 2 (B): A closes, B is current
    assert(out.toSeq == Seq(("A", 0), ("B", 1)))
  }

  test("null key/timestamp rows are dropped, not propagated") {
    val d = Seq(
      (Some(1L), Some(ts("2024-01-01 00:00:00")), 1L, "A"),
      (Some(1L), None, 2L, "B"),
      (None, Some(ts("2024-01-02 00:00:00")), 3L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = run(d).collect()
    assert(out.length == 1 && out.head.getString(1) == "A")
  }

  test("the SCD2 output joins back as an as-of/range layout") {
    // the produced intervals partition each key's timeline: a point query
    // via RangeJoin hits exactly one interval (the state at that time)
    val hist = run(changes).withColumn("valid_to_c",
      coalesce($"valid_to", lit(ts("2099-01-01 00:00:00"))))
    val points = Seq((100L, 1L, ts("2024-01-03 12:00:00"))).toDF("pid", "user_id", "t")
    val hit = RangeJoin.pointInInterval(points, hist, "t", "valid_from",
      "valid_to_c", Seq("user_id"), Seq("state" -> "state"), 86400L)
    assert(hit.collect().map(_.getString(3)).toSeq == Seq("B"))
  }

  test("plan: one shuffle feeds both window passes") {
    val df = run(changes)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1, plan)
  }
}
