package graft.ingest

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's E1 ingest pipeline (`/root/reference/crawl.py:29-124`)
  * as one declarative Spark batch over table-shaped inputs:
  *
  * {{{
  * listings(source, html)                           -- fetched listing pages
  *   → explode(article blocks)                      -- selector cascade P8/P9
  *   → first link, resolved absolute                -- F6/F7, skip-null P10
  *   → left_anti(existing, "sources")               -- dedup J1 (ST2 state)
  *   → join article pages(sources, html)            -- per-article fetch S3
  *   → project title/content/published_at           -- F7/F8
  * }}}
  *
  * Live HTTP is out of scope by design (zero-egress build): page fetches
  * are table-in (the `html` columns). In a deployment the two fetch stages
  * are `mapPartitions` enrichments with a pooled HTTP client per partition
  * — the surrounding plan is unchanged. The reference's per-row
  * `find_one` dedup probe (`crawl.py:73`) is decorrelated into the one
  * set-based anti-join, the biggest semantic-preserving restructure of the
  * port (SURVEY §4).
  *
  * Scale notes: the anti-join broadcasts `existing`'s key column when it
  * fits, else shuffles on `sources` hash; the explode keeps extraction
  * row-local (no state, no shuffle); per-record failure isolation comes
  * from every extractor being total (null/empty, never throw) — ST4.
  */
object Ingest {

  private val blocksUdf = udf((html: String) => Html.articleBlocks(html))
  private val hrefUdf = udf((block: String) => Html.firstHref(block))
  private val resolveUdf = udf((base: String, href: String) => Html.resolveUrl(base, href))
  private val titleUdf = udf((html: String) => Html.title(html))
  private val parasUdf = udf((html: String) => Html.paragraphs(html))
  private val dateUdf = udf((html: String) => Html.publishDate(html))

  /** listings(source, html) → candidate links (source, sources). One row
    * per article block that has a link; `sources` is the absolute URL. */
  def candidates(listings: DataFrame): DataFrame =
    listings
      .select(col("source"), explode(blocksUdf(col("html"))).as("block"))
      .withColumn("href", hrefUdf(col("block")))
      .filter(col("href").isNotNull)
      .select(col("source"), resolveUdf(col("source"), col("href")).as("sources"))
      .filter(col("sources").isNotNull)

  /** J1: candidates not yet in `existing` (match on exact `sources`).
    * Candidate URLs discovered twice in one batch collapse to one row,
    * keeping the MIN discovering seed — `dropDuplicates` would keep an
    * arbitrary one, making re-runs nondeterministic. (The reference's
    * sequential loop keeps the first listing's hit; min(source) is our
    * deterministic stand-in for "first".) */
  def newCandidates(candidates: DataFrame, existing: DataFrame): DataFrame = {
    val deduped =
      if (candidates.columns.contains("source"))
        candidates.groupBy(col("sources")).agg(min(col("source")).as("source"))
      else candidates.dropDuplicates("sources")
    deduped.join(existing.select("sources"), Seq("sources"), "left_anti")
  }

  /** Full record extraction given fetched article pages(sources, html).
    * Output matches the writer shape `crawl.py:104-111`. */
  def records(newCands: DataFrame, articlePages: DataFrame): DataFrame =
    newCands
      .join(articlePages, Seq("sources"))
      .select(
        titleUdf(col("html")).as("title"),
        col("sources"),
        parasUdf(col("html")).as("content"),
        col("source"),
        dateUdf(col("html")).as("published_at"),
        unix_timestamp(current_timestamp()).cast("double").as("crawled_at"))

  /** E1 end-to-end; `existing` plays the sink's current key set. */
  def run(listings: DataFrame, articlePages: DataFrame, existing: DataFrame): DataFrame =
    records(newCandidates(candidates(listings), existing), articlePages)

  /** E1 with LIVE page enrichment through the [[Fetcher]] seam (S3,
    * `crawl.py:77-79`): article pages are fetched per partition instead of
    * joined from a pre-fetched table; everything around the fetch — the
    * selector cascade, anti-join dedup, extraction — is the same plan as
    * [[run]]. Candidates are materialized once so the fetch's side effects
    * run exactly once per URL (the pages branch is the only consumer of
    * the fetched HTML). Listings arrive the same way via
    * [[fetchListings]]. */
  def runFetched(listings: DataFrame, existing: DataFrame, fetcher: Fetcher): DataFrame = {
    val cands = newCandidates(candidates(listings), existing).pinned
    // null html = failed fetch -> row skipped, like the reference's
    // except/continue (crawl.py:116-124) and like a missing row in the
    // table-join path (inner join).
    records(cands, Fetcher.pagesFor(cands, "sources", fetcher)
      .filter(col("html").isNotNull))
  }

  /** S2: seed URLs → listings(source, html), one pooled client per
    * partition (`crawl.py:32-36`). */
  def fetchListings(seeds: DataFrame, seedCol: String, fetcher: Fetcher): DataFrame =
    Fetcher.pagesFor(seeds, seedCol, fetcher)
      .withColumnRenamed("sources", "source")

  /** A7: per-source inserted-count summary (`crawl.py:127-133`). */
  def newCounts(ingested: DataFrame): DataFrame =
    ingested.groupBy(col("source")).agg(count(lit(1)).as("new_count"))
      .orderBy(col("source"))
}
