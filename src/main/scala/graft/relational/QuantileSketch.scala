package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Engine-reproducible mergeable quantile sketch
  * (`order_percentiles_sketch` query) — the [[Hll]] recipe applied to
  * the LAST rows-only sketch in the repo: `percentile_approx` (the
  * `order_percentiles_approx` query) is a t-digest whose centroid
  * placement is engine-internal, so it can never hash-match an oracle.
  * THIS sketch is a fixed-width integer histogram over cents:
  *
  *  - sketch: (group, bucket, cnt) with bucket = cents div width — one
  *    map-side-combined aggregate; counts are INTEGERS, so the sketch
  *    is exactly MERGEABLE (bucket-wise sum, [[merge]]) — per-partition
  *    partials, per-day partials, and historical sketch tables combine
  *    losslessly, the incremental property `percentile_approx` only
  *    approximates;
  *  - estimate: rank r = ceil(q·N); the crossing bucket is the unique
  *    row with cum−cnt < r ≤ cum on the bucket-ordered cumulative sum
  *    (a GROUP-keyed window, never global); within-bucket linear
  *    interpolation floor(width·(r−cum_before)∕cnt) stays in exact
  *    integer/dyadic double range (< 2⁵³), so both engines compute the
  *    identical cent value — the estimate itself carries a full DuckDB
  *    oracle, unlike any t-digest.
  *
  * Error contract: the estimate lands inside the bucket of the exact
  * rank-ceil(q·N) order statistic, so |est − value@rank| < `width`
  * cents — a caller-chosen ABSOLUTE error (QuantileSketchSpec pins it).
  * Against an INTERPOLATED quantile (quantile_cont) add the gap to the
  * adjacent order statistic — inherent to any rank-based summary, not
  * to the histogram.
  * The production refinement for wide-range data is DDSketch-style
  * log-width buckets (relative error); this operator keeps fixed width
  * because the bucket function must be integer-exact for the
  * cross-engine oracle — the documented tradeoff.
  *
  * Scale shape: the only exchange is the (group, bucket) aggregate key;
  * the quantile finish touches ≤ range∕width aggregated rows per group.
  */
object QuantileSketch {

  /** Cents form of a 2-decimal monetary double: exact for values within
    * 1e-9 of a 2-decimal quantity (both engines round the same way). */
  def cents(v: Column): Column = round(v * 100.0, 0).cast("long")

  /** The sketch table: (groupCols..., bucket, cnt). */
  def sketch(df: DataFrame, valueCents: Column, width: Long,
             groupCols: String*): DataFrame = {
    require(width > 0)
    graft.Par.widen(df)
      .select(groupCols.map(col) :+ floor(valueCents.cast("double") / width)
        .cast("long").as("bucket"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bucket-wise sum — the exact merge (sketch(a ∪ b) ==
    * merge(sketch(a), sketch(b)), spec-pinned). */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionByName _)
    val groupCols = all.columns.filterNot(Set("bucket", "cnt")).toSeq
    all.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates in cents from a sketch: one output column per
    * requested q (named by `names`), plus the group count n. */
  def quantiles(sk: DataFrame, width: Long, qs: Seq[(String, Double)],
                groupCols: String*): DataFrame = {
    val gc = groupCols.map(col)
    val wCum = Window.partitionBy(gc: _*).orderBy(col("bucket"))
    val c = sk
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(gc: _*)))
    val perQ = qs.map { case (name, q) =>
      // r = ceil(q·N); the crossing bucket is unique: cum−cnt < r ≤ cum.
      val r = ceil(lit(q) * col("n")).cast("long")
      c.filter(col("cum") - col("cnt") < r && r <= col("cum"))
        .select(gc :+ (col("bucket") * width +
            floor(lit(width.toDouble) * (r - col("cum") + col("cnt")).cast("double") /
              col("cnt").cast("double")).cast("long")).as(name): _*)
    }
    val counts = sk.groupBy(gc: _*).agg(sum(col("cnt")).as("n"))
    perQ.foldLeft(counts)((acc, qdf) => acc.join(qdf, groupCols))
      .orderBy(gc: _*)
  }
}
