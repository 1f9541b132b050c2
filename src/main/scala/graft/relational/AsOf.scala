package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** [EXT] As-of (backward) join — for each left row, attach the single most
  * recent right row with the same key and `rightTs <= leftTs` (time-series
  * point-in-time lookup; the reference has no temporal join, this is the
  * north-star operator Spark lacks as a built-in).
  *
  * Implementation is the union-and-sweep form, NOT a range join:
  *
  *  - tag both inputs and union them into one (key, ts, side) stream;
  *  - one window pass per key ordered by (ts, side): `last(payload,
  *    ignoreNulls)` over an unbounded-preceding frame carries the latest
  *    right payload forward to each left row;
  *  - keep the left rows, unpack the carried payload.
  *
  * Scale shape: exactly ONE hash shuffle (the window partitioning on key)
  * plus a per-partition sort — linear in |L| + |R|, no per-pair work. The
  * naive formulations Spark would otherwise run — a `l.ts >= r.ts` theta
  * join (BroadcastNestedLoop, |L|x|R| per key) or a groupBy-collect —
  * explode quadratically on hot keys. Skewed keys are plain window skew,
  * handled the usual ways (AQE, or pre-splitting hot keys by time range).
  *
  * Tie semantics (pinned by AsOfSpec):
  *  - a right row at exactly `leftTs` IS eligible (inclusive bound): right
  *    sorts before left at equal ts via the side tag (0 < 1);
  *  - among right rows sharing (key, ts), the greatest `tieBreak` wins
  *    (they sort last under the frame) — pass a unique column for
  *    determinism;
  *  - left rows with no eligible right row keep NULL payload columns
  *    (left-outer semantics, like DuckDB's `ASOF LEFT JOIN`).
  */
object AsOf {

  /** @param payload  (rightColumn, outputName) pairs to attach — renamed so
    *                 self-joins (left and right cut from the same table)
    *                 can't collide.
    * @param tieBreak right column ordering the winner among right rows that
    *                 share (key, ts); None = first-encountered (only safe
    *                 when (key, rightTs) is unique). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               payload: Seq[(String, String)],
               tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = struct(payload.map { case (src, out) => col(src).as(out) }: _*)
    val payType = right.select(payStruct).schema.fields.head.dataType
    val leftType = StructType(left.schema.fields)
    val tieCol = tieBreak.map(col).getOrElse(lit(0))
    val tieType = right.select(tieCol).schema.fields.head.dataType

    val l = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(payType).as("__p"))
    // SQL join semantics: a NULL key or NULL timestamp on the right can
    // never be an as-of match (NULL = NULL is not true, NULL <= ts is not
    // true). Without this filter the window's nulls-first ordering would
    // carry a NULL-ts right payload to every left row, and partitionBy
    // would match NULL keys to each other. Left NULL-ts/key rows then
    // naturally keep a NULL payload (nothing sorts before them).
    val r = right
      .filter(col(rightTsCol).isNotNull && col(keyCol).isNotNull)
      .select(
        col(rightTsCol).as("__t"), tieCol.as("__tie"), payStruct.as("__p"),
        col(keyCol).as("__k"))
      .select(col("__k"), col("__t"), lit(0).as("__side"), col("__tie"),
        lit(null).cast(leftType).as("__lrow"), col("__p"))

    // Right rows sort (ts, 0, tie): at a left row (ts, 1, null) the frame
    // holds every right row with ts' <= ts, the last being the latest ts'
    // with the greatest tie-break — the as-of winner. Left rows' relative
    // order is irrelevant (each only reads the frame behind it).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lrow.`$c`").as(c)) ++
        payload.map { case (_, out) => col(s"__m.`$out`").as(out) }: _*)
  }
}
