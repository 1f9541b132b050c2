package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Range (interval-containment) join — match each point row to the
  * interval rows containing its timestamp: `start <= t < end`, plus
  * optional equi-keys. The second temporal-join operator Spark lacks as a
  * built-in (alongside [[AsOf]]).
  *
  * Spark plans a raw `t >= start && t < end` condition as a nested-loop
  * join — |points| × |intervals| comparisons (per equi-key group at best).
  * This implementation BINS time instead:
  *
  *  - each interval explodes to one row per `binSeconds`-wide bin it
  *    overlaps;
  *  - each point maps to exactly ONE bin (`floor(t / bin)`);
  *  - equi-join on (keys…, bin), then the exact containment predicate
  *    filters survivors.
  *
  * A (point, interval) match meets in exactly one bin — the point's — so
  * the join output needs NO de-duplication pass. Work is |points| +
  * Σ(interval span / bin) join rows: linear, shuffled once on (keys, bin),
  * hash-joinable. Pick `binSeconds` near the MEDIAN interval length: too
  * small fans intervals out, too large piles unrelated rows into a bucket
  * (both only cost, never correctness — the exact predicate still runs).
  * Degenerate long intervals (span ≫ bin) are the known cost; split those
  * into a separate broadcast side if they are few, as at 100 TB they
  * usually are.
  */
object RangeJoin {

  /** Inner point-in-interval join.
    *
    * @param payload (intervalColumn, outputName) pairs to attach to each
    *                matched point row (renamed to dodge collisions).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tCol: String, startCol: String, endCol: String,
                      keyCols: Seq[String], payload: Seq[(String, String)],
                      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    def binOf(c: Column): Column = floor(unix_micros(c) / binMicros)

    val p = points.withColumn("__bin", binOf(col(tCol)))
    // Interval bins: floor(start/bin) .. floor((end - 1µs)/bin) — the end
    // bound is exclusive, so an interval ending exactly on a bin edge must
    // not claim the next bin.
    // Degenerate intervals (end <= start) contain no point — drop them
    // BEFORE the explode: their stop bin falls below the start bin and
    // Spark's 2-arg sequence() would generate a DESCENDING bin range (2
    // spurious rows for a zero-length interval; a huge array for a corrupt
    // end far before start). The exact predicate would still filter the
    // matches, but the fan-out is pure waste and a potential OOM.
    // Distinct names on the interval side: points and intervals are
    // routinely projections of the SAME table (events vs their session
    // windows), so `p(k) === i(k)` is the ambiguous-self-join shape that
    // relies on dataset-id disambiguation and warns "trivially true
    // equals predicate" — rename instead (the Dedup/StreamJoin
    // discipline); the final projection drops the temp names.
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__ibin", explode(sequence(
        binOf(col(startCol)),
        floor((unix_micros(col(endCol)) - 1) / binMicros))))
      .select((keyCols.map(k => col(k).as(s"__ik_$k")) :+ col("__ibin") :+
        col(startCol).as("__istart") :+ col(endCol).as("__iend")) ++
        payload.map { case (src, out) => col(src).as(s"__pay_$out") }: _*)

    val cond = (keyCols.map(k => p(k) === col(s"__ik_$k")) :+
      (p("__bin") === col("__ibin")) :+
      (p(tCol) >= col("__istart")) :+ (p(tCol) < col("__iend"))).reduce(_ && _)
    p.join(i, cond)
      .select(points.columns.toSeq.map(p(_)) ++
        payload.map { case (_, out) => col(s"__pay_$out").as(out) }: _*)
  }
}
