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

  /** The four dashboard artifacts over an ARTICLE table — title,
    * sources, content, source, published_at, the `crawl.py:104-111`
    * writer shape — as ONE union-typed frame (section, k, v, n), the
    * surface the `crawl_then_dashboard` capstone hash-checks after the
    * streaming crawl grows the table (`app.py:112-142` over the
    * `crawl.py` sink, end-to-end):
    *
    *   - ('total', 'articles', null, count) — the page-head counter;
    *   - ('source', name, null, count) — the source distribution;
    *   - ('timeline', yyyy-MM-dd, null, count) — gap-filled daily
    *     publish counts ([[Timeline]]'s spine discipline);
    *   - ('recent', rank 1..5, article URL, null) — newest five by
    *     (publish date desc, URL desc);
    *   - ('word', token, null, count) — the top-150 word-cloud counts
    *     ([[WordFrequencies]]' stopword/min-length contract).
    *
    * One pinned scan feeds all five branches (the reference re-scans
    * per artifact — SURVEY §4's deliberate improvement, same as [[run]]);
    * every branch aggregates to bounded rows before its union leg. */
  def composite(articles: DataFrame): DataFrame = {
    import graft.Mat.Pinnable
    val arts = articles
      .select(col("sources"), col("content"), col("source"),
        col("published_at"))
      .pinned
    def nullV = org.apache.spark.sql.functions.lit(null).cast("string")
    import org.apache.spark.sql.functions._
    val total = arts.agg(count(lit(1)).as("n"))
      .select(lit("total").as("section"), lit("articles").as("k"),
        nullV.as("v"), col("n").cast("long").as("n"))
    val bySource = arts
      .groupBy(coalesce(col("source"), lit("Unknown")).as("k"))
      .agg(count(lit(1)).as("n"))
      .select(lit("source").as("section"), col("k"), nullV.as("v"),
        col("n").cast("long").as("n"))
    val timeline = Timeline(
        arts.withColumn("_ts", Timeline.lenientTs(col("published_at"))), "_ts")
      .select(lit("timeline").as("section"),
        date_format(col("date"), "yyyy-MM-dd").as("k"), nullV.as("v"),
        col("n").cast("long").as("n"))
    val recent = arts
      .select(col("sources"), col("published_at"))
      .orderBy(col("published_at").desc, col("sources").desc)
      .limit(5)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("published_at").desc, col("sources").desc)))
      .select(lit("recent").as("section"), col("rk").cast("string").as("k"),
        col("sources").as("v"), lit(null).cast("long").as("n"))
    val words = graft.text.WordFrequencies(
        arts.select(col("content").as("text")))
      .select(lit("word").as("section"), col("word").as("k"), nullV.as("v"),
        col("n").cast("long").as("n"))
    total.unionByName(bySource).unionByName(timeline).unionByName(recent)
      .unionByName(words)
      .orderBy(col("section"), col("k"))
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
