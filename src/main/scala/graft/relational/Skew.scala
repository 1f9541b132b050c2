package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 / the 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles skewed SORT-MERGE joins at runtime and needs no code.
  * Salting is for the two cases AQE does not cover:
  *  - skewed AGGREGATION (one giant group hot-spots a single reducer);
  *  - skewed join keys where the other side is small enough to replicate.
  */
object Skew {

  /** Two-phase count for a skewed group key: phase 1 aggregates
    * (key, salt) — the hot key spreads over `salts` reducers — phase 2
    * merges the partials. Same result as a direct groupBy-count for ANY
    * distribution; cost is one extra (tiny) shuffle of partial rows. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))

  /** Salted equi-join for a skewed LEFT side against a small RIGHT side:
    * left rows get a random salt in [0, salts); the right side replicates
    * once per salt value, so each (key, salt) bucket holds ~1/salts of a
    * hot key's rows. Equivalent to `left.join(right, key)` row-for-row.
    * Right side must be replicate-tolerably small (it usually is — skew
    * with a huge OTHER side is AQE's sort-merge case instead). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
