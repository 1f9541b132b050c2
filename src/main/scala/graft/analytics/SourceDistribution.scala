package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source distribution — the data behind the reference's pie chart.
  *
  * Reference (`app.py:74-82`): count documents per source, treating a missing
  * source as `'Unknown'` (`app.py:75`), and render each slice's percentage of
  * the total (`autopct='%1.1f%%'`, `app.py:80` → one decimal place).
  *
  * Scale shape: single hash aggregate (map-side partial combine, one shuffle
  * on the low-cardinality source key). The percent-of-total window runs over
  * the tiny aggregated result (#sources rows), not the input — moving it to
  * one partition is free.
  */
object SourceDistribution {
  def apply(docs: DataFrame, sourceCol: String = "source"): DataFrame = {
    val counts = docs
      .groupBy(coalesce(col(sourceCol), lit("Unknown")).as("source"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("pct", round(col("n") * 100.0 / sum(col("n")).over(Window.partitionBy()), 1))
      .orderBy(col("n").desc, col("source").asc)
  }
}
