package graft.relational

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed storage (SURVEY §4 / the 100 TB
  * checklist: "co-locate joins via bucketing or pre-partitioning").
  *
  * Writing both join sides bucketed (and sorted) BY THE JOIN KEY with the
  * same bucket count lets every future join on that key run with zero
  * exchange: each task reads bucket i of both tables. For a fact table
  * joined repeatedly on the same key (orders ⋈ lineitem on orderkey,
  * events ⋈ users on user_id) this converts the recurring shuffle —
  * the dominant cost at 100 TB — into a one-time write-side layout.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free
    * when both were written with [[writeBucketed]] and equal bucket
    * counts. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
