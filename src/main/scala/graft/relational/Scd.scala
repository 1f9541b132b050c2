package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Slowly-changing-dimension (type 2) history — turn a keyed change
  * stream into validity intervals: one row per (key, state change) with
  * `[valid_from, valid_to)` bounds and NULL `valid_to` on the current row.
  * The standard warehouse shape for "what was this entity's state at time
  * t" — pairs with [[AsOf]] (point-in-time lookup) and [[RangeJoin]]
  * (interval containment), which both consume exactly this layout.
  *
  * Scale shape: ONE hash shuffle on the key feeds both window passes (the
  * change-dedup lag and the interval lead share partitioning and ordering,
  * so Catalyst plans a single Exchange + sort). No joins, no fan-out;
  * state per key is bounded by its change count.
  */
object Scd {

  /** @param attrCol  the tracked state column — consecutive rows with the
    *                 same value collapse into one interval (true SCD2, not
    *                 an event log);
    * @param tieCol   unique tie-break for simultaneous timestamps (change
    *                 order must be total for the intervals to be
    *                 deterministic). */
  def history(changes: DataFrame, keyCol: String, tsCol: String,
              attrCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changes
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol), col(attrCol))
      // keep only CHANGES: the first row per key (prev ts is null — ts
      // itself can't be, it's filtered) or a state differing null-safely
      // from the previous row's
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .filter(col("__prev_ts").isNull || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(col(keyCol), col(attrCol).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
