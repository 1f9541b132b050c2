package graft.streaming

import graft.Mat.Pinnable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.relational.Money

/** ST5 [EXT]: tumbling / sliding / session windows over the `events`
  * stream table, plus F15 JSON-props extraction.
  *
  * Every query here is written against a plain DataFrame so the SAME
  * expression tree serves batch (driver oracle checks) and Structured
  * Streaming (`readStream` input + watermark — see [[StreamingIngest]]):
  * Spark's unified semantics make the batch result the ground truth for
  * the streaming one.
  *
  * Aggregated measures use exact integer-scaled sums ([[Money]]) so
  * hash-compares against the single-threaded DuckDB oracle cannot drift
  * on double summation order.
  *
  * Scale: tumbling/sliding windows are hash aggregates on (window, keys) —
  * partial+final with map-side combine, one shuffle. Session windows
  * shuffle on user and merge per key; state size is bounded by the gap
  * via watermark in streaming mode.
  */
object EventWindows {

  /** Hourly tumbling counts + exact value sums, per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Money.sumMoney(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4). */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .orderBy(col("ws"))

  /** Per-user sessions with a 30-minute inactivity gap: Spark's
    * `session_window` (streaming-capable). Session end = last event +
    * gap, so `n_events` and bounds are what a gaps-and-islands SQL
    * computes. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** F15: JSON props → typed column; per-type stats over the extracted
    * value (`events.props` is a JSON string like `{"k": 87}`). */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Day × event-type pivot (`events_pivot` query): one row per day, one
    * count column per type. The type list is EXPLICIT — `pivot(col)`
    * without values runs an extra distinct-collect job over the stream and
    * bakes a data-dependent schema (both wrong at 100 TB; a pivot's
    * columns are a contract, not a discovery). Plan is a single hash
    * aggregate on day — the pivot compiles to conditional counts, not a
    * join per type. */
  def dailyTypePivot(events: DataFrame, types: Seq[String]): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("day"))

  /** Ordered-funnel completion (`event_funnel` query): per step, how many
    * users reached it, where step k counts only if it happens STRICTLY
    * AFTER the user's step-(k−1) completion time (first-touch attribution:
    * each step's completion is the user's EARLIEST qualifying event). The
    * product-analytics staple over a raw event stream.
    *
    * Shape: one hash aggregation per step over only that step's events
    * (the type filter pushes to the scan), each joined back on user_id —
    * k small (key, ts) tables, never the event payload; no window over the
    * whole stream, no per-user collect. Funnels are short (k ≤ ~6), so k
    * pruned passes beat one full-stream sort at 100 TB. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ev = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val times = steps.indices.drop(1).foldLeft(first) { (acc, i) =>
      val nxt = ev.filter(col("event_type") === steps(i))
        .join(acc.select(col("user_id"), col(s"t$i")), Seq("user_id"))
        .filter(col("ts") > col(s"t$i"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(s"t${i + 1}"))
      acc.join(nxt, Seq("user_id"), "left")
    }
    // One row of step counts (count ignores the NULLs of users who fell
    // out), materialized once, then melted to (step, name, n_users).
    val counts = times.agg(
      count(col("t1")).as("n1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
      .pinned
    steps.indices.map(i =>
        counts.select(lit(i + 1).as("step"), lit(steps(i)).as("name"),
          col(s"n${i + 1}").as("n_users")))
      .reduce(_ unionByName _)
      .orderBy(col("step"))
  }

  /** Day-grain retention cohorts (`retention_cohorts` query): users
    * grouped by their FIRST-seen day; for each (cohort, day offset) the
    * distinct users active that day. Integer date arithmetic only —
    * engine-exact. Two shuffles (per-user min, then the cohort hash agg);
    * the join back is on user_id, carrying one date per row. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val ev = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Fixed-width histogram of `value` (`value_histogram` query): one hash
    * aggregate keyed by the bin index — map-side combined, one shuffle of
    * (bin, partial count) pairs, independent of row count. `floor(v/w)` is
    * IEEE-exact division + floor, so bin edges are engine-identical. */
  def valueHistogram(events: DataFrame, binWidth: Double): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(floor(col("value") / binWidth).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), round(col("bin") * binWidth, 4).as("lo"), col("n"))
      .orderBy(col("bin"))

  /** Robust outlier report (`value_outliers` query): per event type, the
    * median/MAD gate — a value is an outlier when |v − median| > k·MAD
    * (MAD = median absolute deviation). Unlike mean/stddev z-scores, the
    * thresholds themselves are outlier-resistant: one corrupt 1e12 value
    * shifts a mean arbitrarily but moves a median by at most one rank.
    *
    * Exact interpolated `percentile` (the same function the
    * `order_percentiles` oracle proved equal to DuckDB `quantile_cont`),
    * two aggregate passes (median, then MAD over |v − median|) with the
    * tiny per-type medians broadcast back — the events stream itself never
    * re-shuffles. At 100 TB swap `percentile` for `percentile_approx`
    * exactly as [[graft.relational.Relational.orderPercentilesApprox]]
    * does. Derived medians are rounded once at the end; the outlier
    * comparison runs on unrounded IEEE-exact arithmetic (+, −, ·). */
  def valueOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val vals = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = vals.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = vals.join(broadcast(med), Seq("event_type"))
    val mad = withMed
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("value") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** A8 [EXT]: exact vs approximate distinct users per event type.
    * `approx_count_distinct` is HLL++-based and engine-specific, so the
    * oracle covers the exact column; the approx column's error bound is
    * pinned by spec instead. */
  def distinctUsers(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd).as("n_approx"))
      .orderBy(col("event_type"))
}
