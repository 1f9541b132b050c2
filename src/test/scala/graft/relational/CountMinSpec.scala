package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Count-Min sketch contracts: the one-sided error bound (estimates never
  * undercount, overestimate within the ε·N regime), mergeability (the
  * incremental property), and layout invariance. Cross-engine value
  * equality is the driver gate's job (`cms_word_counts` carries a full
  * oracle). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def toksOf(docs: org.apache.spark.sql.DataFrame) =
    graft.text.TextAnalysis.tokens(lower(col("text")))

  test("estimates never undercount, and the head reads near-exact") {
    val docs = Tables.documents(spark, dir)
    val rows = CountMin.wordCountsWithExact(docs, "text", 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 30)
    val n = docs.select(explode(toksOf(docs)).as("t")).count()
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"$tok: CMS $est under exact $exact")
      // ε = e/W of total stream length N bounds the overshoot (w.h.p.)
      assert(est - exact <= (math.E / CountMin.W * n).toLong + 1,
        s"$tok: CMS $est overshoots exact $exact beyond eps*N")
    }
  }

  test("sketch(a union b) == merge(sketch(a), sketch(b)) — incremental") {
    val docs = Tables.documents(spark, dir)
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val whole = CountMin.sketchTokens(docs, toksOf(docs))
    val merged = CountMin.merge(
      CountMin.sketchTokens(a, toksOf(a)),
      CountMin.sketchTokens(b, toksOf(b)))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("sketch is partitioning-invariant") {
    val docs = Tables.documents(spark, dir)
    val one = CountMin.sketchTokens(docs.repartition(1), toksOf(docs))
    val many = CountMin.sketchTokens(docs.repartition(13), toksOf(docs))
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
  }

  test("sketch stays within the D*W cell budget") {
    val docs = Tables.documents(spark, dir)
    val sk = CountMin.sketchTokens(docs, toksOf(docs))
    assert(sk.count() <= CountMin.D.toLong * CountMin.W)
    // every cell addressable: rows in [0, D), cols in [0, W)
    val bad = sk.filter($"r" < 0 || $"r" >= CountMin.D ||
      $"c" < 0 || $"c" >= CountMin.W).count()
    assert(bad === 0)
  }
}
