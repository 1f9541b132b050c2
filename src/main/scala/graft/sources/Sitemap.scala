package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] XML sitemap parsing (`sitemap_entries` query) — the OTHER seed
  * channel next to the curated list the reference hardcodes
  * (crawl.py:29-35): sites publish `sitemap.xml` (sitemaps.org protocol)
  * and a crawler reads it to discover URLs WITH freshness metadata —
  * `lastmod` drives recrawl scheduling ([[graft.ingest.Frontier]]'s
  * priority wants exactly this signal), `priority` is the site's own
  * importance hint. A sitemap INDEX file points at child sitemaps
  * instead of pages; both record kinds surface as typed rows so the
  * frontier can enqueue pages and recurse into children with one scan.
  *
  * Parsing is pure scan-stage regexp over the XML text — the same
  * posture as [[Warc]]/[[Jsonl]]: no XML parser object, no UDF, 1:1
  * DuckDB mirror. Contract (documented subset of the protocol, the
  * regex-over-XML discipline every extractor in this repo states):
  * `<url>`/`<sitemap>` blocks with their `<loc>`/`<lastmod>`/
  * `<changefreq>`/`<priority>` children in any order; entity-decoding
  * limited to the five XML predefined entities in `loc` (ampersands in
  * URLs arrive as `&amp;`); CDATA and XML comments are out of contract.
  * Blocks without a `<loc>` are dropped (a sitemap entry IS its URL).
  */
object Sitemap {

  private[graft] val UrlBlockRe = "(?is)<url>(.*?)</url>"
  private[graft] val SitemapBlockRe = "(?is)<sitemap>(.*?)</sitemap>"
  private def tagRe(tag: String) = s"(?is)<$tag>\\s*(.*?)\\s*</$tag>"

  /** The five XML predefined entities, `&amp;` last (same chained-
    * replacement order as [[graft.ingest.Html.text]]). */
  private def xmlUnescape(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&").foldLeft(c) {
      case (acc, (from, to)) => replace(acc, lit(from), lit(to))
    }

  private def sqlXmlUnescape(x: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&").foldLeft(x) {
      case (acc, (from, to)) =>
        s"replace($acc, '$from', '${to.replace("'", "''")}')"
    }

  /** Entries of the sitemaps under `xmlCol`, one row per `<url>` or
    * `<sitemap>` block that carries a `<loc>`:
    * (carried id, kind 'url'|'sitemap', loc, lastmod DATE or null,
    * changefreq or null, priority DOUBLE or null). Child-sitemap rows
    * carry only loc + lastmod (the protocol defines no
    * changefreq/priority on index entries — nulls, enforced rather
    * than parsed). Missing/empty optional tags are null. */
  /** ANSI-safe typed casts: a value that doesn't match the shape nulls,
    * never errors (the [[Warc]] status-line discipline). Dates accept
    * the plain `YYYY-MM-DD` form only — the protocol's W3C-datetime
    * long forms are out of contract (documented; recrawl scheduling
    * wants day granularity). */
  private[graft] val DateShape = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  private[graft] val NumShape = "^[0-9]+(\\.[0-9]+)?$"

  def entries(sitemaps: DataFrame, idCol: String = "site_id",
              xmlCol: String = "xml"): DataFrame = {
    def field(block: Column, tag: String): Column = {
      val v = regexp_extract(block, tagRe(tag), 1)
      when(v === "", lit(null).cast("string")).otherwise(v)
    }
    def rows(blockRe: String, kind: String, withMeta: Boolean) = {
      val b = col("b")
      def guarded(c: Column, shape: String, to: String): Column =
        when(c.rlike(shape), c).otherwise(lit(null).cast("string")).cast(to)
      val meta =
        if (withMeta) Seq(field(b, "changefreq").as("changefreq"),
          guarded(field(b, "priority"), NumShape, "double").as("priority"))
        else Seq(lit(null).cast("string").as("changefreq"),
          lit(null).cast("double").as("priority"))
      sitemaps
        .select(col(idCol),
          explode(regexp_extract_all(col(xmlCol), lit(blockRe), lit(1))).as("b"))
        .select(Seq(col(idCol), lit(kind).as("kind"),
          xmlUnescape(field(b, "loc")).as("loc"),
          guarded(field(b, "lastmod"), DateShape, "date").as("lastmod")) ++ meta: _*)
        .filter(col("loc").isNotNull)
    }
    rows(UrlBlockRe, "url", withMeta = true)
      .unionByName(rows(SitemapBlockRe, "sitemap", withMeta = false))
      .orderBy(col(idCol), col("kind"), col("loc"))
  }

  /** [[entries]] as a DuckDB CTE chain + final SELECT over a relation
    * exposing (idCol, xml); the caller opens the WITH
    * (`WITH <defs>, ${sqlEntries(...)}`). */
  def sqlEntries(from: String, idCol: String = "site_id",
                 xmlCol: String = "xml"): String = {
    def field(tag: String) =
      s"nullif(regexp_extract(b, '${tagRe(tag)}', 1), '')"
    def guarded(x: String, shape: String, to: String) =
      s"CAST(CASE WHEN regexp_matches($x, '$shape') THEN $x END AS $to)"
    val lastmod = guarded(field("lastmod"), DateShape, "DATE")
    val priority = guarded(field("priority"), NumShape, "DOUBLE")
    s"""ub AS (
       |  SELECT $idCol, UNNEST(regexp_extract_all($xmlCol, '$UrlBlockRe', 1)) AS b
       |  FROM $from),
       |sb AS (
       |  SELECT $idCol, UNNEST(regexp_extract_all($xmlCol, '$SitemapBlockRe', 1)) AS b
       |  FROM $from),
       |rows_u AS (
       |  SELECT $idCol, 'url' AS kind,
       |    ${sqlXmlUnescape(field("loc"))} AS loc,
       |    $lastmod AS lastmod,
       |    ${field("changefreq")} AS changefreq,
       |    $priority AS priority
       |  FROM ub),
       |rows_s AS (
       |  SELECT $idCol, 'sitemap' AS kind,
       |    ${sqlXmlUnescape(field("loc"))} AS loc,
       |    $lastmod AS lastmod,
       |    CAST(NULL AS VARCHAR) AS changefreq,
       |    CAST(NULL AS DOUBLE) AS priority
       |  FROM sb)
       |SELECT * FROM (SELECT * FROM rows_u WHERE loc IS NOT NULL
       |               UNION ALL
       |               SELECT * FROM rows_s WHERE loc IS NOT NULL)
       |ORDER BY $idCol, kind, loc""".stripMargin
  }
}
