package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The mechanized multi-sweep protocol's pure half (r16, the r15
  * verdict's #7+#8): per-query medians ignore failure sentinels,
  * slow-mode marks split the observed bimodal totals, and the host
  * counter parsers read the documented /proc shapes. The forking half is
  * exercised by running the tool itself (BASELINE.md records each
  * round's definitive invocation). */
class BenchSweepSpec extends AnyFunSuite {

  test("median: odd exact middle, even mean-of-middles") {
    assert(BenchSweep.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchSweep.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(BenchSweep.median(Seq(7.0)) == 7.0)
  }

  test("perQueryMedians: failure sentinels and absent queries drop from " +
      "the sample, not poison it") {
    val sweeps = Seq(
      Map("a" -> 1.0, "b" -> 5.0, "c" -> 2.0),
      Map("a" -> 3.0, "b" -> -4.9, "c" -> 4.0), // b failed this sweep
      Map("a" -> 2.0, "b" -> 6.0)) // c absent (new query mid-protocol)
    val m = BenchSweep.perQueryMedians(sweeps)
    assert(m("a") == 2.0)
    assert(m("b") == 5.5, "median of the two non-negative samples")
    assert(m("c") == 3.0)
    // a query that failed EVERY sweep has no median at all
    assert(!BenchSweep.perQueryMedians(Seq(Map("x" -> -1.0))).contains("x"))
  }

  test("slowMarks: the r15 bimodal totals split at the 8% band") {
    // the observed r15 sweep totals — B and D were the slow mode
    val totals = Seq(442.9, 523.1, 467.7, 522.3, 472.7)
    assert(BenchSweep.slowMarks(totals) ==
      Seq(false, true, false, true, false))
    // a unimodal set marks nothing
    assert(BenchSweep.slowMarks(Seq(100.0, 102.0, 98.0)) ==
      Seq(false, false, false))
  }

  test("parseProcStat / parseDiskstats read the kernel shapes") {
    val stat = "cpu  100 2 30 400 50 0 6 7 0 0\ncpu0 1 2 3 4 5 6 7 8\n"
    val s = BenchSweep.parseProcStat(stat)
    assert(s("user") == 100L && s("system") == 30L &&
      s("idle") == 400L && s("iowait") == 50L && s("steal") == 7L)
    assert(BenchSweep.parseProcStat("no cpu line").isEmpty)
    val disk =
      "   8  0 sda 100 0 2000 0 50 0 1000 0 0 0 0\n" +
      "   8  1 sda1 90 0 1800 0 45 0 900 0 0 0 0\n" + // partition: excluded
      " 252  0 vda 10 0 300 0 5 0 70 0 0 0 0\n" +
      "   7  0 loop0 1 0 10 0 1 0 10 0 0 0 0\n" + // loop: excluded
      " 259  0 nvme0n1 5 0 100 0 2 0 30 0 0 0 0\n"
    assert(BenchSweep.parseDiskstats(disk) == (2400L, 1100L))
    // live read on this box (if Linux): parses without throwing
    val live = try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/stat"))) catch { case _: Throwable => "" }
    if (live.nonEmpty) assert(BenchSweep.parseProcStat(live).nonEmpty)
  }

  test("parseSweep pulls the queries object out of a Bench line, " +
      "negatives included") {
    val line = """{"metric":"total","value":10.5,"unit":"sec",""" +
      """"queries":{"q1_agg":1.25,"q_fail":-2.5,"zz":6.75},""" +
      """"sf":"/root/testdata/sf0.1","failures":1}"""
    val m = BenchSweep.parseSweep(line)
    assert(m == Map("q1_agg" -> 1.25, "q_fail" -> -2.5, "zz" -> 6.75))
    // the meta fields (value/failures) never leak into the per-query map
    assert(!m.contains("value") && !m.contains("failures"))
    assert(BenchSweep.parseSweep("not json").isEmpty)
  }
}
