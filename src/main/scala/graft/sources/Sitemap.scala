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
      // try_cast, not cast: the shape regex can't validate RANGES
      // ("2024-02-30" matches DateShape), and under Spark 4's default
      // ANSI mode a plain cast would throw — violating the totality
      // contract (the TRY_CAST discipline of the Warc status line).
      def guarded(c: Column, shape: String, to: String): Column =
        when(c.rlike(shape), c).otherwise(lit(null).cast("string"))
          .try_cast(to)
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

  /** [[entries]]'s CTE chain alone, ending at `sm_entries` — the
    * composable producer both [[sqlEntries]] (which appends the final
    * SELECT) and [[sqlFrontier]] (which chains its own CTEs after it)
    * build on. The r10 advice flagged the old arrangement — sqlFrontier
    * spliced sqlEntries' output by `indexOf` of an exact literal, so any
    * formatting drift in sqlEntries would have thrown
    * StringIndexOutOfBoundsException at query-construction time. */
  def sqlEntriesCtes(from: String, idCol: String = "site_id",
                     xmlCol: String = "xml"): String = {
    def field(tag: String) =
      s"nullif(regexp_extract(b, '${tagRe(tag)}', 1), '')"
    def guarded(x: String, shape: String, to: String) =
      s"TRY_CAST(CASE WHEN regexp_matches($x, '$shape') THEN $x END AS $to)"
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
       |  FROM sb),
       |sm_entries AS (SELECT * FROM rows_u WHERE loc IS NOT NULL
       |               UNION ALL
       |               SELECT * FROM rows_s WHERE loc IS NOT NULL)""".stripMargin
  }

  /** [[entries]] as a DuckDB CTE chain + final SELECT over a relation
    * exposing (idCol, xml); the caller opens the WITH
    * (`WITH <defs>, ${sqlEntries(...)}`). */
  def sqlEntries(from: String, idCol: String = "site_id",
                 xmlCol: String = "xml"): String =
    s"""${sqlEntriesCtes(from, idCol, xmlCol)}
       |SELECT * FROM sm_entries
       |ORDER BY $idCol, kind, loc""".stripMargin

  /** [EXT] Sitemap-driven discovery frontier (`sitemap_frontier` query) —
    * the composition a crawler actually runs over its sitemap haul:
    *
    *  1. page entries only (kind 'url'), locs CANONICALIZED
    *     ([[graft.ingest.Urls.canonicalize]] — the same URL published by
    *     two sitemaps, or with tracking params, is ONE frontier row);
    *  2. per canonical loc: mention count, freshest `lastmod`, the
    *     strongest priority hint (missing priority reads as the
    *     protocol's 0.5 default BEFORE the max, lifted to integer
    *     per-mille — `⌊round(p·1000)⌋`, both engines on the same IEEE
    *     multiply);
    *  3. robots gate on the canonical loc
    *     ([[graft.ingest.Robots.allowed]] — a sitemap may list what
    *     robots.txt forbids; the gate wins);
    *  4. per-host fetch rank: priority desc, lastmod desc (nulls rank
    *     as the epoch — explicit, because Spark and DuckDB default
    *     null ordering differently), loc asc.
    *
    * One aggregate on the canonical loc + the robots broadcast-shaped
    * rule join + one host-keyed window. Output:
    * (host, loc, n_sitemaps, lastmod, priority_pm, rk). */
  def frontier(sitemaps: DataFrame, rules: DataFrame,
               idCol: String = "site_id", xmlCol: String = "xml"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val urls = entries(sitemaps, idCol, xmlCol)
      .filter(col("kind") === "url")
      .select(graft.ingest.Urls.canonicalize(col("loc")).as("loc"),
        col("lastmod"), col("priority"))
    val agg = urls.groupBy(col("loc"))
      .agg(count(lit(1)).as("n_sitemaps"),
        max(col("lastmod")).as("lastmod"),
        round(max(coalesce(col("priority"), lit(0.5))) * 1000.0)
          .cast("long").as("priority_pm"))
    graft.ingest.Robots.allowed(agg, "loc", rules, idCol = "loc")
      .withColumn("host", graft.ingest.Urls.host(col("loc")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("host"))
        .orderBy(col("priority_pm").desc,
          coalesce(col("lastmod"), lit("1970-01-01").cast("date")).desc,
          col("loc").asc)))
      .select(col("host"), col("loc"), col("n_sitemaps"), col("lastmod"),
        col("priority_pm"), col("rk"))
      .orderBy(col("host"), col("rk"))
  }

  /** [[frontier]] as a DuckDB CTE chain + final SELECT (same caller
    * contract as [[sqlEntries]]; `rulesRel` exposes
    * (host, rule, prefix)). */
  def sqlFrontier(from: String, rulesRel: String,
                  idCol: String = "site_id", xmlCol: String = "xml"): String = {
    s"""${sqlEntriesCtes(from, idCol, xmlCol)},
       |sf_u AS (
       |  SELECT ${graft.ingest.Urls.sqlCanonicalize("loc")} AS loc,
       |    lastmod, priority
       |  FROM sm_entries WHERE kind = 'url'),
       |sf_a AS (
       |  SELECT loc, CAST(COUNT(*) AS BIGINT) AS n_sitemaps,
       |    MAX(lastmod) AS lastmod,
       |    CAST(round(MAX(COALESCE(priority, 0.5)) * 1000.0) AS BIGINT)
       |      AS priority_pm
       |  FROM sf_u GROUP BY loc),
       |sf_d AS (${graft.ingest.Robots.sqlDecisions("sf_a", "loc", rulesRel,
                     idCol = "loc")}),
       |sf_g AS (
       |  SELECT a.loc, a.n_sitemaps, a.lastmod, a.priority_pm,
       |    ${graft.ingest.Urls.sqlHost("a.loc")} AS host
       |  FROM sf_a a JOIN sf_d d ON a.loc = d.loc WHERE d.allowed)
       |SELECT host, loc, n_sitemaps, lastmod, priority_pm,
       |  ROW_NUMBER() OVER (PARTITION BY host
       |    ORDER BY priority_pm DESC,
       |      COALESCE(lastmod, DATE '1970-01-01') DESC, loc ASC) AS rk
       |FROM sf_g
       |ORDER BY host, rk""".stripMargin
  }
}
