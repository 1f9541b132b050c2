package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Stream-stream interval join (`events_interval_join` query) —
  * the correlation join every event pipeline eventually needs: attach to
  * each left event the right-side events of the same key whose timestamp
  * falls in `[left.ts − window, left.ts]` (purchases ⋈ the clicks that
  * preceded them, alerts ⋈ recent log lines). [[graft.relational.AsOf]]
  * picks ONE prior row; this keeps ALL of them, and unlike the as-of
  * sweep it is directly runnable as a Structured Streaming join.
  *
  * The SAME function serves both execution modes — the driver query runs
  * it batch (where it carries a theta-join DuckDB oracle), and
  * StreamJoinSpec runs it on MemoryStreams, pinning streaming == batch
  * on identical input plus the watermark divergence (a right row older
  * than the watermark is dropped in streaming, kept in batch — the ST3
  * policy pin).
  *
  * Scale shape: Spark plans key-equality + time-band as a sort-merge (or
  * streaming symmetric-hash) join on the KEY — the band is a residual
  * filter, never a nested loop (plan-pinned in the spec). In streaming,
  * the watermarks plus the closed time bound let the state store evict:
  * buffered right rows older than `leftWatermark − window` can never
  * join again and are cleaned — state is O(window · rate), not O(stream).
  * Output fan-out is bounded by the key's event rate within `window`,
  * the quantity the caller chose by picking the window.
  */
object StreamJoin {

  /** Rows (l.*, r.* minus r's key) for every pair with equal `keyCol`
    * and `r.ts ∈ [l.ts − windowSeconds, l.ts]`. Columns of `right` must
    * not otherwise collide with `left`'s. Pass `watermarkDelay = None`
    * for batch inputs. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   windowSeconds: Long,
                   watermarkDelay: Option[String] = None): DataFrame = {
    require(windowSeconds > 0, "need windowSeconds > 0")
    // Distinct key names per side: both inputs are routinely projections
    // of the SAME source table (purchases/clicks of one event stream), so
    // `l(key) === r(key)` is the ambiguous-self-join shape that relies on
    // dataset-id disambiguation and warns "trivially true equals
    // predicate" on every run — rename the right key instead (the Dedup
    // setJaccardPairs discipline). The temp name is dropped by the final
    // projection; ts columns are distinct per contract (caller renames).
    val rk = s"__rk_$keyCol"
    val l = watermarkDelay.fold(left)(d => left.withWatermark(leftTsCol, d))
    val r = watermarkDelay.fold(right)(d => right.withWatermark(rightTsCol, d))
      .withColumnRenamed(keyCol, rk)
    val joined = l.join(r,
      col(keyCol) === col(rk) &&
        col(rightTsCol) >= col(leftTsCol) -
          expr(s"INTERVAL $windowSeconds SECONDS") &&
        col(rightTsCol) <= col(leftTsCol))
    joined.select(left.columns.map(col(_)) ++
      right.columns.filter(_ != keyCol).map(col(_)): _*)
  }

  /** The driver-query instantiation: purchases pick up all clicks of the
    * same user in the preceding `windowSeconds` (default 30 min).
    *
    * BATCH-ONLY: the trailing total-order `.orderBy` (for the oracle's
    * deterministic compare) is unsupported on append-mode streams. For
    * streaming reuse call [[intervalJoin]] directly (as StreamJoinSpec
    * does) and skip the sort. */
  def purchasesWithPriorClicks(events: DataFrame,
                               windowSeconds: Long = 1800L): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .filter(col("purchase_ts").isNotNull)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .filter(col("click_ts").isNotNull)
    intervalJoin(purchases, clicks, "user_id", "purchase_ts", "click_ts",
        windowSeconds)
      .orderBy(col("purchase_id"), col("click_id"))
  }
}
