package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The engine-reproducible HLL's contracts: estimation error within the
  * sketch's theoretical regime, mergeability (the incremental property),
  * and physical-layout invariance. Cross-engine value equality is the
  * driver gate's job (`hll_distinct_users` carries a full oracle). */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("estimate stays within ~3x rsd of exact, per group") {
    // rsd = 1.04 / sqrt(512) ~ 4.6%; allow 3x (the fixture's per-type
    // cardinalities are in the hundreds, well inside the HLL regime).
    val rows = Hll.distinctWithExact(Tables.events(spark, dir),
        "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, exact, est) =>
      val err = math.abs(est - exact).toDouble / exact
      assert(err < 0.15, s"$tpe: exact $exact vs hll $est (err $err)")
    }
  }

  test("sketch(a union b) == merge(sketch(a), sketch(b)) — incremental") {
    val ev = Tables.events(spark, dir)
    val a = ev.filter($"event_id" % 2 === 0)
    val b = ev.filter($"event_id" % 2 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val whole = rows(Hll.sketch(ev, "user_id", "event_type"))
    val merged = rows(Hll.merge(
      Hll.sketch(a, "user_id", "event_type"),
      Hll.sketch(b, "user_id", "event_type")))
    assert(merged == whole, "merge of partial sketches must equal the full sketch")
  }

  test("estimate is invariant to input partitioning") {
    val ev = Tables.events(spark, dir)
    val x = Hll.estimate(Hll.sketch(ev, "user_id", "event_type"), "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val y = Hll.estimate(Hll.sketch(ev.repartition(13), "user_id", "event_type"),
        "event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(x == y)
  }
}
