package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Z-order (Morton-curve) storage layout — multi-dimensional data
  * clustering for scan pruning (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`; Morton 1966).
  *
  * A corpus sorted by ONE column prunes scans on that column only: parquet
  * row-group/file min-max stats on any other column span the whole domain,
  * so a predicate on it reads everything. Interleaving the BITS of two (or
  * more) key columns and sorting by the interleaved code keeps rows that
  * are close in EVERY dimension close on disk — each file's bounding box
  * is tight in both `x` and `y`, and a 2-dim box predicate skips most
  * files from their footer stats alone.
  *
  * At 100 TB this is the difference between "point-in-range queries on
  * (customer, date) read ~√N of the data" and "they read all of it" —
  * pruning happens in the parquet reader from metadata, before any row is
  * decoded. The code is a pure per-row expression; the layout write is one
  * range-repartition + in-partition sort (a single shuffle, the same cost
  * as any global sort).
  */
object ZOrder {

  /** Morton code of two non-negative int columns: bit i of `x` lands at
    * even position 2i, bit i of `y` at odd position 2i+1. Values must fit
    * in `bits` bits (callers bucket/clamp first — standard practice is to
    * z-order on coarse buckets, not raw values). Static expression tree of
    * shift/and/or — codegen-friendly, no UDF, reproducible in any engine
    * with integer bit ops (the DuckDB oracle runs the same formula). */
  def morton2(xc: Column, yc: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "need 0 < bits <= 31")
    val x = xc.cast("long")
    val y = yc.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` laid out along the Z-curve of (xCol, yCol) into ~numFiles
    * files: range-partition on the Morton code (contiguous curve segments
    * per file), sort within each partition, drop the helper column. Each
    * output file then covers a compact curve segment — a small bounding
    * box in BOTH dimensions — which is what min-max pruning needs.
    * ZOrderSpec measures the per-file bounding-box shrink vs a
    * single-column sort layout. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", morton2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
