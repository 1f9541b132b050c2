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
}
