package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (`TESTDATA.md` / `FIXTURES.md`).
  *
  * Each table is one parquet file under the scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst column pruning / predicate pushdown
  * reach the scan (at 100 TB these tables would be partitioned directories —
  * the loader shape is unchanged, only the path layout grows).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  /** `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader only surfaces as raw
    * nanos via the legacy conf) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark reads as TIMESTAMP_NTZ). The loader adapts to whichever
    * schema arrives: a Long column is nanos and is converted with exact
    * integer division; an NTZ/timestamp column is cast to the session-TZ
    * timestamp (the session TZ is pinned to UTC, so the instant is
    * unchanged). DuckDB reads both generations as µs TIMESTAMP, so oracle
    * comparisons line up either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unexpected type $other")
    }
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
}
