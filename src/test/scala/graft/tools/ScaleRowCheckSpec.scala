package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Enforces the no-heavy-without-a-scale-row rule (r15, the r14
  * verdict's #5): every query above the wall-clock threshold in the
  * committed per-query bench artifact must hold a numeric scale row in
  * BASELINE.md. The synthetic case proves the checker actually detects a
  * missing row (a checker that can't fail enforces nothing); the real
  * case runs it over the committed artifacts. */
class ScaleRowCheckSpec extends AnyFunSuite {

  /** In-sweep seconds above which a query owes a scale row. The r14
    * bench's heavy tier sits at 9-14 s and the audited set reaches down
    * to ~5 s; everything below runs at the scan floor where a multi-sf
    * row measures fixture overhead, not the operator. */
  private val ThresholdSec = 5.0

  test("synthetic: a heavy query without a scale row is detected; " +
      "adding its row clears it") {
    val perq = Map("q_heavy" -> 9.2, "q_light" -> 0.3, "q_other" -> 7.0)
    val registered = Set("q_heavy", "q_light", "q_other")
    val without = Seq(
      "## Some audit",
      "| query | m1 | m10 | ratio |",
      "|---|---|---|---|",
      "| q_other | 7.0 | 21.0 | 3.0x |",
      "prose mentioning q_heavy does not count")
    assert(ScaleRowCheck.missing(perq, without, registered, ThresholdSec)
      == Seq("q_heavy"))
    // the fix-row must land INSIDE the scale table (r16 anchoring —
    // a row floating after prose has no header context)
    val withRow = without.patch(4, Seq("| q_heavy | 9.2 | 30.1 | 3.3x |"), 0)
    assert(ScaleRowCheck.missing(perq, withRow, registered, ThresholdSec)
      .isEmpty)
    // a light query never owes a row, with or without one
    assert(!ScaleRowCheck.heavy(perq, ThresholdSec).contains("q_light"))
  }

  test("synthetic: prose rows and non-registered first cells never count " +
      "as coverage") {
    val perq = Map("q_heavy" -> 9.2)
    val registered = Set("q_heavy")
    val decoys = Seq(
      "| query | m1 | m10 | ratio |",
      "|---|---|---|---|",
      "| q_heavy | valve-capped MinHash keepers over gated survivors |", // no digits
      "| q_heavy | 13.8 s total in one sweep |", // ONE numeric cell — a
      // single-scale bench/telemetry row is not multi-sf evidence
      "| other_label | 9.9 | 12.1 |") // not a registered query
    assert(ScaleRowCheck.scaleRowQueries(decoys, registered).isEmpty)
    assert(ScaleRowCheck.missing(perq, decoys, registered, ThresholdSec)
      == Seq("q_heavy"))
  }

  test("synthetic: a digit-bearing row under a NON-scale table header is " +
      "not multi-sf evidence (r16 header anchoring, the r15 ADVICE)") {
    val perq = Map("q_heavy" -> 9.2)
    val registered = Set("q_heavy")
    // a single-scale bench table: seconds + row-count columns both carry
    // digits, which satisfied the pre-r16 >=2-digit-cells rule without
    // any multi-sf evidence
    val benchTable = Seq(
      "| query | seconds | rows |",
      "|---|---|---|",
      "| q_heavy | 9.2 | 45000 |")
    assert(ScaleRowCheck.scaleRowQueries(benchTable, registered).isEmpty)
    assert(ScaleRowCheck.missing(perq, benchTable, registered, ThresholdSec)
      == Seq("q_heavy"))
    // the same row under a real ScaleAudit header DOES count...
    val scaleTable = Seq(
      "| query | m1 | m10 (10×) | ratio |",
      "|---|---|---|---|",
      "| q_heavy | 9.2 | 30.1 | 3.3× |")
    assert(ScaleRowCheck.scaleRowQueries(scaleTable, registered)
      == Set("q_heavy"))
    // ...and the sf-style header shape counts too
    val sfTable = Seq(
      "| query | sf0.1 | 10× docs | ratio | read |",
      "|---|---|---|---|---|",
      "| q_heavy | 9.2 s | 30.1 s | 3.3× | sublinear |")
    assert(ScaleRowCheck.scaleRowQueries(sfTable, registered)
      == Set("q_heavy"))
    // a blank line ends a table: a stray digit row AFTER the scale table
    // has no header context
    val detached = scaleTable.updated(2, "| q_other | 1 | 2 | 3 |") ++
      Seq("", "| q_heavy | 9.2 | 30.1 | 3.3× |")
    assert(!ScaleRowCheck.scaleRowQueries(detached, registered + "q_other")
      .contains("q_heavy"))
  }

  test("synthetic: a registered query absent from the per-query artifact " +
      "is a failure, not an exemption (r16, the r15 verdict's #2)") {
    val perq = Map("q_a" -> 1.0, "q_b" -> 9.0)
    assert(ScaleRowCheck.absentFromArtifact(perq, Set("q_a", "q_b")).isEmpty)
    assert(ScaleRowCheck.absentFromArtifact(perq, Set("q_a", "q_b", "q_new"))
      == Seq("q_new"))
  }

  test("committed artifacts: every heavy in the latest per-query bench " +
      "has a BASELINE.md scale row") {
    val root = java.nio.file.Paths.get(".")
    val perqFiles = java.nio.file.Files.list(root).toArray.toSeq
      .map(_.toString.stripPrefix("./"))
      .filter(_.matches("BENCH_r\\d+_perq\\.json"))
      .sortBy(f => "\\d+".r.findFirstIn(f).get.toInt)
    assert(perqFiles.nonEmpty,
      "no BENCH_r{N}_perq.json committed — write the per-query artifact " +
        "at the round's definitive idle sweep (the r14 verdict's #8 made " +
        "it mechanical; this spec makes it mandatory)")
    val perq = ScaleRowCheck.parsePerQuery(
      java.nio.file.Files.readString(java.nio.file.Paths.get(perqFiles.last)))
    assert(perq.nonEmpty, s"${perqFiles.last} parsed to an empty map")
    val baseline = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("BASELINE.md"))
      .toArray.toSeq.map(_.toString)
    val registered = graft.SparkEntry.queries.keySet
    // the artifact and registry may drift within a round (a new query
    // lands before the next sweep) — enforcement covers the intersection
    val known = perq.view.filterKeys(registered).toMap
    val miss = ScaleRowCheck.missing(known, baseline, registered, ThresholdSec)
    assert(miss.isEmpty,
      s"heavy queries (>= $ThresholdSec s in ${perqFiles.last}) without a " +
        s"BASELINE.md scale row: ${miss.mkString(", ")} — run: sbt " +
        s"""'runMain graft.tools.ScaleAudit ${miss.mkString(" ")}'""")
  }
}
