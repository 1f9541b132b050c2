package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus totals (reference `app.py:142`, `crawl.py:137`: `count_documents`).
  *
  * `count(lit(1))` aggregates partially per partition (a long per partition
  * travels to the final agg) — the canonical "free at any scale" query.
  */
object Totals {
  def counts(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    Tables.documents(spark, dir).agg(count(lit(1)).as("n_documents"))
      .crossJoin(Tables.events(spark, dir).agg(count(lit(1)).as("n_events")))
      .crossJoin(Tables.embeddings(spark, dir).agg(count(lit(1)).as("n_embeddings")))
  }
}
