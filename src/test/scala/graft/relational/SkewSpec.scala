package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting equivalences: same results as the direct forms under heavy
  * key skew (one key holding ~90% of rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (
    Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i")
  ).zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "v")

  test("saltedCount equals direct groupBy count under skew") {
    val direct = skewed.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, $"key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("hot") == 900L)
  }

  test("saltedJoin equals direct join row-for-row under skew") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val direct = skewed.join(dim, "key")
      .select("key", "v", "label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key")
      .select("key", "v", "label").collect().map(_.toSeq).toSet
    assert(salted == direct)
    assert(salted.count(_.head == "hot") == 900)
  }

  test("approx percentiles stay within 2.5% of exact at high accuracy") {
    // percentile_approx returns an actual data point while the exact form
    // interpolates; at sf0.001 a priority group holds ~150 orders, so the
    // gap to the nearest real point bounds the error, not the sketch.
    val dir = "/root/testdata/sf0.001"
    val exact = graft.relational.Relational.orderPercentiles(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.relational.Relational.orderPercentilesApprox(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.025, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.025, s"$k p90: $a90 vs $e90")
      assert(math.abs(a99 - e99) / e99 < 0.025, s"$k p99: $a99 vs $e99")
    }
  }
}
