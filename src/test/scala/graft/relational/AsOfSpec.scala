package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics (inclusive bound, tie-break, left-outer null) and
  * the one-shuffle plan contract. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, t, tag)  right: (key, t, rid, w)
  private def left = Seq(
    (1L, 10L, "a"), // after r@5 -> picks rid 51
    (1L, 5L, "b"),  // exactly at r@5 -> inclusive, rid 51
    (1L, 3L, "c"),  // between r@1 and r@5 -> rid 50
    (1L, 0L, "f"),  // before every right row -> null
    (2L, 7L, "d"),  // key 2: picks its own stream's rid 60, not key 1's
    (3L, 9L, "e")   // key with no right rows at all -> null
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 5L, 51L, 0.5),
    (1L, 1L, 50L, 0.1),
    (2L, 2L, 60L, 0.2),
    (2L, 8L, 61L, 0.8) // after d@7 -> not eligible
  ).toDF("k", "t", "rid", "w")

  private def run = AsOf.asofJoin(left, right, "k", "t", "t",
    Seq("rid" -> "rid", "w" -> "w"), tieBreak = Some("rid"))

  test("picks the latest right row at or before the left time, per key") {
    val out = run.collect().map(r =>
      r.getString(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map("a" -> 51L, "b" -> 51L, "c" -> 50L, "f" -> -1L,
      "d" -> 60L, "e" -> -1L))
  }

  test("left rows and columns are preserved; payload renamed") {
    val out = run
    assert(out.columns.toSeq == Seq("k", "t", "tag", "rid", "w"))
    assert(out.count() == 6)
  }

  test("ties on (key, ts) resolve to the greatest tie-break") {
    val r2 = right.unionByName(Seq((1L, 5L, 52L, 0.9)).toDF("k", "t", "rid", "w"))
    val out = AsOf.asofJoin(left, r2, "k", "t", "t",
      Seq("rid" -> "rid"), tieBreak = Some("rid"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out("a") == 52L && out("b") == 52L)
  }

  test("NULL timestamps/keys never match (SQL semantics, like DuckDB ASOF)") {
    val jl = (x: Long) => java.lang.Long.valueOf(x)
    val nul = null.asInstanceOf[java.lang.Long]
    val l = Seq(
      (jl(1L), jl(10L), "a"),      // normal: must pick rid 51, NOT a null-ts row
      (jl(1L), nul, "null_ts"),    // NULL left ts -> no match
      (nul, jl(10L), "null_key")   // NULL left key -> no match
    ).toDF("k", "t", "tag")
    val r = Seq(
      (jl(1L), jl(5L), jl(51L)),
      (jl(1L), nul, jl(99L)),      // NULL right ts: must never be carried
      (nul, jl(1L), jl(98L))       // NULL right key: must never match null_key
    ).toDF("k", "t", "rid")
    val out = AsOf.asofJoin(l, r, "k", "t", "t", Seq("rid" -> "rid"),
        tieBreak = Some("rid"))
      .collect().map(x => x.getString(2) ->
        (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(out == Map("a" -> 51L, "null_ts" -> -1L, "null_key" -> -1L))
  }

  test("plan: exactly one shuffle, no cartesian/nested-loop join") {
    val df = run
    df.collect() // finalize the adaptive plan before inspecting it
    // The adaptive plan prints final + initial sections; audit the final.
    val asString = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(asString.sliding("Exchange".length).count(_ == "Exchange") == 1, asString)
    assert(!asString.contains("CartesianProduct") &&
      !asString.contains("BroadcastNestedLoopJoin"), asString)
  }
}
