package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] URL canonicalization (`canonical_urls` / `canonical_url_dedup`
  * queries) — the scale form of the reference's link dedup: the crawler
  * probes the store for each candidate URL byte-for-byte
  * (crawl.py:73, `find_one({'sources': url})`), which treats
  * `HTTP://Example.com/a?utm_source=x#top` and `http://example.com/a` as
  * different pages and re-crawls them. At corpus scale the dedup key
  * must be the CANONICAL form.
  *
  * Canonicalization contract (each step a pure string expression, so the
  * whole operator lives in whole-stage codegen and mirrors 1:1 into the
  * DuckDB oracle — the oracle hash-check IS the cross-engine parity pin):
  *
  *  1. trim surrounding whitespace; drop the fragment (`#...`);
  *  2. scheme and authority lowercase (path/query case is significant);
  *  3. default ports stripped (`:80` for http, `:443` for https);
  *  4. empty path → `/`; trailing slashes dropped (all of them; the
  *     root path stays `/`); duplicate interior slashes are KEPT (they
  *     can be significant to servers);
  *  5. query: parameters split on `&`, empties dropped, tracking params
  *     removed (`utm_*`, `fbclid`, `gclid`), the rest sorted
  *     byte-lexicographically and rejoined; an emptied query drops its
  *     `?`;
  *  6. URLs without a `scheme://` prefix pass through steps 1 only
  *     (relative links are resolved against a base by
  *     [[Html.resolveUrl]] BEFORE canonicalization, so a scheme-less
  *     input here is malformed — normalize nothing, lose nothing).
  *
  * Documented simplifications vs RFC 3986 full normalization: no
  * percent-encoding case-folding, no dot-segment resolution (resolveUrl
  * already handles those for crawl-sourced links), userinfo lowercases
  * with the authority.
  */
object Urls {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val AuthRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private[graft] val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid)="

  /** Canonical form of `url` as a single codegen-friendly expression. */
  def canonicalize(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val auth0 = lower(regexp_extract(u, AuthRe, 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = rtrim(regexp_extract(u, PathRe, 1), "/")
    val path = when(path0 === "", "/").otherwise(path0)
    val q = array_join(
      array_sort(filter(split(regexp_extract(u, QueryRe, 1), "&"),
        x => x =!= "" && !x.rlike(TrackingRe))), "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), auth, path,
        when(q === "", "").otherwise(concat(lit("?"), q))))
  }

  /** Hostname of `url`: lowercased authority minus userinfo and port.
    * Scheme-less input → empty string (resolve relative links first, as
    * with [[canonicalize]]). IPv6 bracket literals are out of scope
    * (documented; web-corpus URLs are hostnames). */
  def host(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(trim(url), AuthRe, 1)), "^[^@]*@", ""),
      ":[0-9]+$", "")

  /** [[host]] as DuckDB SQL — same regexes, same step order. */
  def sqlHost(colName: String): String =
    s"regexp_replace(regexp_replace(lower(regexp_extract(trim($colName), " +
      s"'$AuthRe', 1)), '^[^@]*@', ''), ':[0-9]+$$', '')"

  /** Registered domain (eTLD+1) of `url` — the per-domain cap key of
    * RefinedWeb-style curation ("at most N documents per registered
    * domain"): subdomains collapse (`news.example.com` and
    * `blog.example.com` are both `example.com`), public suffixes keep one
    * more label (`archive.foo.co.uk` → `foo.co.uk`, `a.b.github.io` →
    * `b.github.io` — the full Public Suffix List including wildcard,
    * exception, and private-registry rules; [[Psl]]), IPv4 literals and
    * bare single-label hosts pass through. The lookup is the codegen'd
    * [[org.apache.spark.sql.graft.RegisteredDomain]] expression; the
    * DuckDB mirror is [[Psl.sqlDomainCtes]]'s candidate-suffix equi-join
    * over the same printed rule table. */
  def registeredDomain(url: Column): Column =
    org.apache.spark.sql.graft.ArrayFunctions.registeredDomain(host(url))

  /** Default URL word-score list for [[spamScore]] — the RefinedWeb-style
    * SOFT URL filter (Penedo et al. 2023 run a curated-blocklist gate
    * plus word scoring of the URL string itself; the hard eTLD+1
    * blocklist is [[registeredDomain]] + `excludeByKey`). Weights:
    * 1.0 = blocking on its own, 0.5 = needs a second signal. A
    * documented subset — production swaps in a full category list (e.g.
    * the UT1 blocklists, public data); the expression shape is
    * unchanged, exactly the PSL swap-point discipline. */
  val SpamWords: Seq[(String, Double)] = Seq(
    "casino" -> 1.0, "viagra" -> 1.0, "xvideos" -> 1.0, "escort" -> 1.0,
    "porn" -> 1.0, "xxx" -> 0.5, "poker" -> 0.5, "betting" -> 0.5,
    "free-download" -> 0.5, "crack" -> 0.5, "warez" -> 1.0,
    "pharmacy" -> 0.5)

  /** Word score of the URL STRING (lowercased substring hits, weights
    * summed): RefinedWeb's soft URL gate — spam/adult content announces
    * itself in the URL long before the page text is fetched, so this
    * gate runs at the cheapest possible point (a pure scan-stage string
    * expression over the url column; no fetch, no parse). Weights are
    * halves, so the double sum is exact dyadic arithmetic on both
    * engines ([[sqlSpamScore]] is the DuckDB twin). Null url → 0.0. */
  def spamScore(url: Column,
                weights: Seq[(String, Double)] = SpamWords): Column =
    if (weights.isEmpty) lit(0.0) // an empty category list scores nothing
    else {
      val u = lower(coalesce(url, lit("")))
      weights.map { case (w, wt) =>
        when(u.contains(w), lit(wt)).otherwise(lit(0.0))
      }.reduce(_ + _)
    }

  /** DuckDB mirror of [[spamScore]] — same words, same order, same
    * left-assoc sum (and the same empty-list zero). */
  def sqlSpamScore(colName: String,
                   weights: Seq[(String, Double)] = SpamWords): String =
    if (weights.isEmpty) "0.0"
    else {
      val u = s"lower(COALESCE($colName, ''))"
      weights.map { case (w, wt) =>
        s"(CASE WHEN contains($u, '$w') THEN $wt ELSE 0.0 END)"
      }.mkString(" + ")
    }

  /** DuckDB mirror of [[canonicalize]] over a column named `colName` —
    * same regexes, same step order. The query CASE compares through
    * COALESCE because DuckDB's `array_to_string([])` is NULL where
    * Spark's `array_join` is ''. */
  def sqlCanonicalize(colName: String): String = {
    val u = s"regexp_replace(trim($colName), '#.*$$', '')"
    s"""CASE WHEN regexp_extract($u, '$SchemeRe', 1) = '' THEN $u ELSE
       |  lower(regexp_extract($u, '$SchemeRe', 1)) || '://' ||
       |  CASE lower(regexp_extract($u, '$SchemeRe', 1))
       |    WHEN 'http' THEN regexp_replace(lower(regexp_extract($u, '$AuthRe', 1)), ':80$$', '')
       |    WHEN 'https' THEN regexp_replace(lower(regexp_extract($u, '$AuthRe', 1)), ':443$$', '')
       |    ELSE lower(regexp_extract($u, '$AuthRe', 1)) END ||
       |  CASE WHEN rtrim(regexp_extract($u, '$PathRe', 1), '/') = '' THEN '/'
       |       ELSE rtrim(regexp_extract($u, '$PathRe', 1), '/') END ||
       |  CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
       |           string_split(regexp_extract($u, '\\?([^#]*)', 1), '&'),
       |           x -> x <> '' AND NOT regexp_matches(x, '$TrackingRe'))), '&'), '') = ''
       |       THEN ''
       |       ELSE '?' || array_to_string(list_sort(list_filter(
       |           string_split(regexp_extract($u, '\\?([^#]*)', 1), '&'),
       |           x -> x <> '' AND NOT regexp_matches(x, '$TrackingRe'))), '&') END
       |END""".stripMargin
  }
}
