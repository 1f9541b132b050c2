package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.Tables
import graft.text.WordFrequencies

/** E2 as one unit: the reference dashboard renders four artifacts from
  * FOUR separate full collection scans per page view (`app.py:26,75,86,
  * 137` — only the connection is cached, `app.py:18-23`). Here the shared
  * scan is cached once and every artifact reuses it — the deliberate
  * improvement recorded in SURVEY §4 (caching / CSE across queries).
  *
  * At scale: `cache()` on the projected columns only (Spark caches the
  * pruned plan, so the memory footprint is the needed columns, not the
  * table), and the four artifact queries share it without re-reading
  * storage. `unpersist` when the "page view" is served.
  */
object Dashboard {

  /** The four artifact queries plus the shared cached scan; call
    * [[Artifacts.unpersist]] once the page view is served. */
  case class Artifacts(
      wordFrequencies: DataFrame,
      sourceDistribution: DataFrame,
      timeline: DataFrame,
      recent: DataFrame,
      total: Long,
      sharedScan: DataFrame) {
    def unpersist(): Unit = sharedScan.unpersist()
  }

  def run(spark: SparkSession, dir: String, cache: Boolean = true): Artifacts = {
    val docs0 = Tables.documents(spark, dir)
    val docs = if (cache) docs0.cache() else docs0
    val events = Tables.events(spark, dir)
    Artifacts(
      wordFrequencies = WordFrequencies(docs),
      sourceDistribution = SourceDistribution(docs),
      timeline = Timeline(events, "ts"),
      recent = RecentArticles(
        events.select(col("event_id"), col("ts"), col("event_type"), col("user_id")),
        5, col("ts").desc, col("event_id").desc),
      total = docs.count(), // materializes the cache for the other queries
      sharedScan = docs)
  }
}
