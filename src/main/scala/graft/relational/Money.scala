package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-money arithmetic for oracle-checkable aggregates.
  *
  * Double summation is order-dependent; Spark's partial aggregation (and AQE)
  * makes the summation order non-deterministic across runs and different from
  * any single-threaded oracle. For hash-compared results we therefore sum in
  * integer cents: `round(x*100)` on the SAME input double is identical in
  * every engine, BIGINT sums are exact and order-independent, and the final
  * `/100.0` is one deterministic double op. Same trick at 1e4 scale for
  * 2-decimal × 2-decimal products.
  */
object Money {
  /** Exact cents as long: round(x * 100). */
  def cents(x: Column): Column = round(x * 100).cast("long")

  /** Σ x, exact, as double: sum(cents)/100. */
  def sumMoney(x: Column): Column = (sum(cents(x)).cast("double") / 100.0)

  /** Σ x*(1±d) with x money and d a 2-decimal rate, exact at 1e4 scale. */
  def sumMoneyTimesRate(x: Column, rate: Column): Column =
    (sum(cents(x) * round(rate * 100).cast("long")).cast("double") / 10000.0)
}
