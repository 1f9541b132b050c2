package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** Guards the printed-constant oracle channel: exact double round-trips,
  * the |c|² convention, and the stash-gated presence of oracle entries. */
class FittedOracleSpec extends AnyFunSuite {

  test("Double.toString prints round-trip exactly, including awkward values") {
    val xs = Seq(0.0, -0.0, 1.0 / 3.0, 1e-300, -2.5e17, 4.9e-324,
      math.Pi, -1.0000000000000002, 123456.789e-12)
    xs.foreach { x =>
      assert(java.lang.Double.parseDouble(FittedOracle.d(x)) == x ||
        (x == 0.0 && FittedOracle.d(x).toDouble == 0.0), s"round-trip broke for $x")
    }
    intercept[IllegalArgumentException](FittedOracle.d(Double.NaN))
    intercept[IllegalArgumentException](FittedOracle.d(Double.PositiveInfinity))
  }

  test("n2 matches the NearestCentroids left-fold convention") {
    val v = Seq(0.1, -0.2, 0.3)
    // the expression precomputes c.map(x => x*x).sum — same fold, same value
    assert(FittedOracle.n2(v) == v.map(x => x * x).sum)
  }

  test("centroidValues/codebookValues shape: row per centroid, index-led") {
    val cents = IndexedSeq(IndexedSeq(1.0, 2.0), IndexedSeq(-0.5, 0.25))
    val cv = FittedOracle.centroidValues(cents)
    assert(cv.startsWith("(0, ") && cv.contains("(1, "))
    assert(cv.contains("[1.0, 2.0]") && cv.contains("[-0.5, 0.25]"))
    val books = IndexedSeq(IndexedSeq(IndexedSeq(1.0), IndexedSeq(2.0)))
    val bv = FittedOracle.codebookValues(books)
    assert(bv.contains("(0, 0, ") && bv.contains("(0, 1, "))
  }

  test("oracle entries appear only after the corresponding fit is stashed") {
    val saved = (FittedOracle.ivfCenters, FittedOracle.semCenters)
    try {
      FittedOracle.ivfCenters = None
      FittedOracle.semCenters = None
      assert(!FittedOracle.oracleEntries.contains("knn_ivf"))
      assert(!FittedOracle.oracleEntries.contains("semantic_dedup"))
      FittedOracle.ivfCenters = Some(IndexedSeq(IndexedSeq(1.0, 0.0)))
      val e = FittedOracle.oracleEntries
      assert(e.contains("knn_ivf") && !e.contains("semantic_dedup"))
      assert(e("knn_ivf").contains("[1.0, 0.0]"))
    } finally {
      FittedOracle.ivfCenters = saved._1
      FittedOracle.semCenters = saved._2
    }
  }
}
