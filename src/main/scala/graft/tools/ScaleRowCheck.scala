package graft.tools

/** No-heavy-without-a-scale-row enforcement (r15, the r14 verdict's #5).
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
  *  - the covered set is every markdown table row in BASELINE.md whose
  *    first cell is a registered query name and whose remaining cells
  *    carry at least one numeric reading (the ScaleAudit table shape —
  *    prose mentions don't count);
  *  - a heavy query not covered fails the spec with the exact ScaleAudit
  *    command that would fix it.
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

  /** Query names holding a SCALE ROW in the baseline text: first table
    * cell is the (registered) query name, and at least TWO further
    * cells carry digits — the `| query | m1 | m10 | ratio |` shape
    * every ScaleAudit tier emits. A single numeric cell (a one-scale
    * bench or telemetry row) is NOT multi-sf evidence and must not
    * satisfy the enforcement (r15 review). The `registered` filter
    * keeps prose tables (op inventories, gate telemetry keyed by other
    * labels) from accidentally counting. */
  def scaleRowQueries(baselineLines: Seq[String],
                      registered: Set[String]): Set[String] =
    baselineLines.collect {
      case Row(name, rest) if registered(name) &&
          rest.split('|').count(_.exists(_.isDigit)) >= 2 =>
        name
    }.toSet

  /** The enforcement: heavies without a scale row, sorted for stable
    * failure messages. */
  def missing(perQuery: Map[String, Double], baselineLines: Seq[String],
              registered: Set[String], thresholdSec: Double): Seq[String] =
    (heavy(perQuery, thresholdSec) -- scaleRowQueries(baselineLines, registered))
      .toSeq.sorted
}
