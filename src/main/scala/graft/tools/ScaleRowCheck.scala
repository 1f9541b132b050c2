package graft.tools

/** No-heavy-without-a-scale-row enforcement (r15, the r14 verdict's #5;
  * tightened r16).
  *
  * [[ScaleAudit]] made multi-sf scale rows cheap to produce, but nothing
  * FAILED when a new heavy query shipped without one — the audit table in
  * BASELINE.md was complete by discipline, not by construction. This
  * object holds the pure checking logic; `ScaleRowCheckSpec` runs it over
  * the committed artifacts each round:
  *
  *  - the heavy set comes from the committed per-query bench artifact
  *    (`BENCH_r{N}_perq.json`, a flat `{"query": seconds}` map written at
  *    each round's definitive idle sweep);
  *  - the covered set is every markdown data row INSIDE A SCALE TABLE —
  *    a table whose header carries at least two scale-labeled columns
  *    (`m1`/`m10`/`m100`, `sf0.1`, `10× docs`: the ScaleAudit shapes) —
  *    whose first cell is a registered query name and whose remaining
  *    cells carry at least two numeric readings. Anchoring on the header
  *    (r16, the r15 ADVICE) closes the hole where any digit-bearing row
  *    (a single-scale bench row with seconds + row-count columns)
  *    satisfied the enforcement without multi-sf evidence;
  *  - a heavy query not covered fails the spec with the exact ScaleAudit
  *    command that would fix it;
  *  - additionally (r16, the r15 verdict's #2): every REGISTERED query
  *    must appear in the committed per-query artifact at all — absence
  *    previously passed vacuously (the heavy set is derived FROM the
  *    artifact, so a query missing from it could never be heavy), which
  *    is exactly how `part_communities_earlystop_ppm` shipped in r15
  *    with no perq entry and no scale row.
  *
  * Pure text processing — no Spark session, same dependency discipline as
  * [[CoverageMap]].
  */
object ScaleRowCheck {

  /** Flat per-query JSON (`{"name": 1.23, ...}`) → map. Regex-parsed like
    * the plan-cost snapshot — no JSON library on the compile classpath by
    * design. */
  def parsePerQuery(json: String): Map[String, Double] =
    """"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap

  /** Queries at or above the wall-clock threshold (in-sweep seconds). */
  def heavy(perQuery: Map[String, Double], thresholdSec: Double): Set[String] =
    perQuery.collect { case (q, s) if s >= thresholdSec => q }.toSet

  private val Row = """^\|\s*`?([A-Za-z0-9_]+)`?\s*\|(.+)\|\s*$""".r
  private val Separator = """^\|[\s:|-]+\|\s*$""".r
  /** A header cell announcing a SCALE column: a GenSf multiplier tier
    * (`m1`, `m10 (10×)`), a scale-factor label (`sf0.1`), or an explicit
    * multiplier (`10× docs`). Matched per-cell so prose cells containing
    * incidental digits don't qualify a table. */
  private val ScaleCell = """(?i)^\s*(m\d+\b|sf[0-9.]+|\d+(?:×|x\b)).*""".r

  private def cells(rest: String): Seq[String] =
    rest.split('|').toSeq

  /** Query names holding a SCALE ROW in the baseline text: a data row
    * whose enclosing table header has ≥2 scale-labeled columns, whose
    * first cell is a registered query name, and whose remaining cells
    * carry ≥2 numeric readings. The `registered` filter keeps prose
    * tables (op inventories, gate telemetry keyed by other labels) from
    * accidentally counting. */
  def scaleRowQueries(baselineLines: Seq[String],
                      registered: Set[String]): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    var inScaleTable = false
    var i = 0
    val lines = baselineLines.toIndexedSeq
    while (i < lines.length) {
      val line = lines(i)
      line match {
        case Separator() => () // keep current table context
        case Row(name, rest) =>
          // a header row is a table row immediately followed by the
          // markdown separator — it OPENS a table and sets its kind
          val isHeader =
            i + 1 < lines.length && Separator.matches(lines(i + 1))
          if (isHeader)
            inScaleTable =
              cells(rest).count(c => ScaleCell.matches(c)) >= 2
          else if (inScaleTable && registered(name) &&
              cells(rest).count(_.exists(_.isDigit)) >= 2)
            out += name
        case _ =>
          // any non-table line ends the current table
          if (!line.trim.startsWith("|")) inScaleTable = false
      }
      i += 1
    }
    out.toSet
  }

  /** The scale-row enforcement: heavies without a scale row, sorted for
    * stable failure messages. */
  def missing(perQuery: Map[String, Double], baselineLines: Seq[String],
              registered: Set[String], thresholdSec: Double): Seq[String] =
    (heavy(perQuery, thresholdSec) -- scaleRowQueries(baselineLines, registered))
      .toSeq.sorted

  /** The artifact-completeness enforcement (r16): registered queries
    * absent from the committed per-query artifact. Absence means the
    * heavy check is vacuous for them — it must be a FAILURE demanding a
    * perq regeneration, not an exemption. */
  def absentFromArtifact(perQuery: Map[String, Double],
                         registered: Set[String]): Seq[String] =
    (registered -- perQuery.keySet).toSeq.sorted
}
