package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Pins the Misra-Gries machinery (sketch bound, merge semantics) and the
  * end-to-end contract: output equals the naive exact top list above the
  * N/(capacity+1) threshold, independent of partitioning. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(tokens: Seq[String], cap: Int) =
    HeavyHitters.sketchPartition(tokens.iterator, cap)

  test("sketch estimates undercount by at most N/(capacity+1)") {
    val tokens = Seq.fill(300)("hot") ++ (1 to 500).map(i => s"cold$i")
    val (m, n) = mg(scala.util.Random.shuffle(tokens), 10)
    assert(n == 800)
    val exact = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    m.foreach { case (k, est) =>
      assert(est <= exact(k))
      assert(est >= exact(k) - n / 11)
    }
    assert(m.contains("hot")) // 300 > 800/11: must survive
    assert(m.size <= 10)
  }

  test("merge keeps the bound additive and respects capacity") {
    val left = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ (1 to 40).map(i => s"x$i")
    val right = Seq.fill(80)("a") ++ Seq.fill(70)("c") ++ (1 to 40).map(i => s"y$i")
    val (ml, nl) = mg(left, 8)
    val (mr, nr) = mg(right, 8)
    val merged = HeavyHitters.merge(ml, mr, 8)
    assert(merged.size <= 8)
    val n = nl + nr
    val exact = (left ++ right).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    merged.foreach { case (k, est) =>
      assert(est <= exact(k))
      assert(est >= exact(k) - n / 9)
    }
    assert(merged.contains("a")) // 180 > 350/9
  }

  test("end-to-end equals the exact top list above the threshold") {
    // 40 docs, vocabulary engineered so a handful of tokens cross the
    // N/(cap+1) bar; capacity is tiny (20) to stress the sketch.
    val docs = (1 to 40).map { i =>
      val common = "alpha beta " * (i % 3 + 1)
      val rare = (1 to 10).map(j => s"r${i}_$j").mkString(" ")
      (i.toLong, s"$common gamma $rare")
    }.toDF("doc_id", "text")
    val cap = 20
    val got = HeavyHitters.topTokens(docs, "text", cap, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = docs.select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
    val n = toks.count()
    val want = toks.groupBy("t").count()
      .filter(col("count") * (cap + 1) > n)
      .orderBy(col("count").desc, col("t").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("repartitioning does not change the output") {
    val docs = (1 to 30).map(i => (i.toLong, "same words here plus u" + i))
      .toDF("doc_id", "text")
    val a = HeavyHitters.topTokens(docs.repartition(1), "text", 15, 10).collect().toSeq
    val b = HeavyHitters.topTokens(docs.repartition(7), "text", 15, 10).collect().toSeq
    assert(a == b)
  }

  test("empty input yields an empty result") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.topTokens(docs, "text", 10, 5).count() == 0)
  }
}
