// Same placement rationale as VectorExpressions.scala: wrapping Spark's
// private[sql] Bloom expressions into public Columns needs ExpressionUtils.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own Bloom-filter expressions — the exact
  * machinery Spark's runtime row-level filtering (injected bloom joins)
  * uses internally, exposed for explicit use in graft operators.
  *
  * Why these and not `DataFrameStatFunctions.bloomFilter` + a UDF probe:
  * the aggregate runs as a normal (partial-merge-final) aggregation — one
  * pass, map-side combined — and `BloomFilterMightContain` is a codegen'd
  * expression, so a probe stays inside whole-stage codegen instead of
  * falling out to a boxed UDF call per row.
  */
object BloomFunctions {

  /** Aggregate a LongType hash column (use `xxhash64(...)` over the item)
    * into a serialized Bloom filter (BinaryType, one row).
    *
    * `expectedItems` sizes the filter; `numBits` caps its memory
    * (m = items·20 bits ≈ 0.63% false-positive rate at the default
    * loading). Both must be positive literals.
    *
    * Conf dependency (round-4 advice): `BloomFilterAggregate` silently
    * clamps its arguments via `Math.min` against
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 2^26)
    * and `.maxNumItems` (default 4M) — above ~3.3M items the filter would
    * quietly get fewer bits than requested, raising the fpp without any
    * error. Correctness of graft's bloom users is unaffected (they all
    * exact-verify survivors), but the prefilter's benefit would shrink, so
    * raise the two session confs to cover the request before building. */
  def bloomFilterAgg(itemHash: Column, expectedItems: Long, numBits: Long): Column = {
    require(expectedItems > 0 && numBits > 0, "need positive items/bits")
    val conf = org.apache.spark.sql.SparkSession.active.conf
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    if (conf.get(bitsKey).toLong < numBits) conf.set(bitsKey, numBits)
    if (conf.get(itemsKey).toLong < expectedItems) conf.set(itemsKey, expectedItems)
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(itemHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe a driver-held serialized Bloom filter: true if `itemHash`
    * (the same `xxhash64` used at build time) might be in the set —
    * no false negatives, false positives at the filter's configured rate.
    * The bytes embed as a literal, which Spark broadcasts with the task
    * binary — at 100 TB the filter ships once per executor, not per row. */
  def mightContain(bloom: Array[Byte], itemHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ExpressionUtils.expression(itemHash)))
}
