package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Robots-rules URL exclusion (`robots_exclusion` query) — the
  * third leg of the release-compliance family beside content-hash
  * takedowns and eTLD+1 blocklists ([[graft.pipeline.Curation
  * .excludeByKey]]): a corpus derived from a crawl must be able to drop
  * documents whose PATHS a site's robots rules exclude — retroactively
  * too, because rules change after pages were fetched (the reference's
  * crawler, `crawl.py:69-80`, fetches without consulting robots at all;
  * at release scale the exclusion sweep is non-negotiable).
  *
  * Semantics: the original Robots Exclusion Protocol prefix rules with
  * Google's documented tie-break —
  *
  *  - a rules table `(host, rule ∈ {allow, disallow}, prefix)` holds the
  *    per-HOST (not per-domain: robots.txt is served per host) parsed
  *    rule lines for the releasing crawler's user-agent;
  *  - a URL matches a rule when its PATH matches the rule's pattern:
  *    plain patterns are byte prefixes; patterns carrying the RFC 9309
  *    wildcards match with `*` = any character sequence and a TRAILING
  *    `$` = end-of-path anchor (r10 — previously documented out of
  *    scope; an empty path reads as `/`); an EMPTY pattern never
  *    matches — REP's bare `Disallow:` line means "nothing disallowed",
  *    so parsers feeding this table may pass it through verbatim;
  *  - the most specific match decides, specificity = RAW pattern length
  *    (wildcard characters count — the Google-parser priority,
  *    robots.cc's `matching rule path length`; for plain rules this IS
  *    the matched prefix length, so the wildcard extension changes no
  *    wildcard-free decision); at equal length `allow` wins; a URL with
  *    no matching rule (or an unlisted host) is allowed.
  *
  * Shape: one equi-join keyed by host (no forced broadcast — robots
  * tables for a web-scale crawl are millions of hosts; AQE picks the
  * strategy, the [[graft.pipeline.Curation]] caps-tally lesson) carrying
  * ids + paths + prefixes only, then one id-keyed aggregate for the
  * longest-match election. Everything is ANSI-expressible —
  * [[sqlDecisions]] is the 1:1 DuckDB mirror.
  */
object Robots {

  /** Path of `url` as robots matching sees it: no query/fragment, empty
    * → `/`. The regex is [[Urls.PathRe]] — one URL-path definition for
    * the whole ingest package. */
  def path(url: Column): Column = {
    val p = regexp_extract(trim(url), Urls.PathRe, 1)
    when(p === "", "/").otherwise(p)
  }

  /** Regex-metacharacter escapes for [[patternRegex]], applied in order:
    * backslash FIRST (later steps insert backslashes), `*` LAST (escapes
    * never introduce one) — where it becomes the wildcard. Shared with
    * [[sqlPatternRegex]] so the two engines replay the identical chain
    * (the [[graft.text.Encoding]] table discipline). Single quotes need
    * no entry: they are not regex metacharacters, and the SQL printer
    * never interpolates rule DATA — the chain runs over the column. */
  private val EscapePairs: Seq[(String, String)] = Seq(
    "\\" -> "\\\\", "." -> "\\.", "+" -> "\\+", "?" -> "\\?",
    "(" -> "\\(", ")" -> "\\)", "[" -> "\\[", "]" -> "\\]",
    "{" -> "\\{", "}" -> "\\}", "|" -> "\\|", "^" -> "\\^",
    "$" -> "\\$", "*" -> ".*")

  /** A pattern needs the regex path iff it carries a wildcard. */
  private def hasWildcard(pattern: Column): Column =
    pattern.contains("*") || pattern.endsWith("$")

  /** RFC 9309 pattern → anchored regex (`^` + escaped body with `*` →
    * `.*`, trailing `$` → end anchor). Pure chained literal `replace`
    * over the pattern column — no per-engine regex-escape syntax, so
    * Java and RE2 compile the same string. */
  def patternRegex(pattern: Column): Column = {
    val anch = pattern.endsWith("$")
    val body = when(anch, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    val esc = EscapePairs.foldLeft(body) { case (c, (f, t)) =>
      replace(c, lit(f), lit(t))
    }
    concat(lit("^"), esc, when(anch, lit("$")).otherwise(lit("")))
  }

  /** Per-document robots decision: (idCol, host, allowed). `rules` must
    * expose (host, rule, prefix) with rule ∈ {allow, disallow}; the
    * prefix column may carry RFC 9309 wildcard patterns. */
  def decisions(docs: DataFrame, urlCol: String, rules: DataFrame,
                idCol: String = "doc_id"): DataFrame = {
    val withParts = docs.select(col(idCol),
      Urls.host(col(urlCol)).as("host"), path(col(urlCol)).as("__path"))
    // Longest-match election as a single aggregate: a matched rule
    // contributes its raw pattern length, unmatched contributes -1 (the
    // no-rules default), and allow wins ties — so allowed ⇔
    // max(allow_len) >= max(disallow_len).
    val joined = withParts.join(rules, Seq("host"), "left")
    // empty prefix never matches: REP's bare `Disallow:` means
    // "nothing disallowed" — startsWith('') would invert it into a
    // whole-host block (RobotsSpec pins the line as a no-op). Plain
    // patterns keep the cheap startsWith; wildcard patterns match via
    // the translated regex (runtime pattern — rules are data).
    val matched = when(hasWildcard(col("prefix")),
      regexp_like(col("__path"), patternRegex(col("prefix"))))
      .otherwise(col("__path").startsWith(col("prefix")))
    val matchLen = when(col("prefix").isNotNull && col("prefix") =!= "" &&
      matched, length(col("prefix")))
      .otherwise(lit(-1))
    joined
      .groupBy(col(idCol), col("host"))
      .agg(
        max(when(col("rule") === "allow", matchLen).otherwise(lit(-1)))
          .as("__a"),
        max(when(col("rule") === "disallow", matchLen).otherwise(lit(-1)))
          .as("__d"))
      .select(col(idCol), col("host"),
        (coalesce(col("__a"), lit(-1)) >= coalesce(col("__d"), lit(-1)))
          .as("allowed"))
  }

  /** The exclusion sweep: rows of `docs` whose URL the rules allow. */
  def allowed(docs: DataFrame, urlCol: String, rules: DataFrame,
              idCol: String = "doc_id"): DataFrame =
    docs.join(
      decisions(docs, urlCol, rules, idCol)
        .filter(col("allowed")).select(col(idCol)),
      Seq(idCol))

  /** DuckDB twin of [[patternRegex]] over a SQL expression — the same
    * replace chain, nested innermost-first. */
  def sqlPatternRegex(p: String): String = {
    val anch = s"ends_with($p, '$$')"
    val body = s"(CASE WHEN $anch THEN left($p, length($p) - 1) ELSE $p END)"
    val esc = EscapePairs.foldLeft(body) { case (acc, (f, t)) =>
      s"replace($acc, '$f', '$t')"
    }
    s"('^' || $esc || (CASE WHEN $anch THEN '$$' ELSE '' END))"
  }

  /** DuckDB mirror of [[decisions]] over relations `docsRel` (exposing
    * idCol + urlExpr) and `rulesRel` (host, rule, prefix). */
  def sqlDecisions(docsRel: String, urlExpr: String, rulesRel: String,
                   idCol: String = "doc_id"): String =
    s"""SELECT $idCol, host,
       |  (COALESCE(MAX(CASE WHEN rule = 'allow' AND mlen >= 0 THEN mlen END), -1) >=
       |   COALESCE(MAX(CASE WHEN rule = 'disallow' AND mlen >= 0 THEN mlen END), -1))
       |    AS allowed
       |FROM (
       |  SELECT d.$idCol, d.host, r.rule,
       |    CASE WHEN r.prefix IS NOT NULL AND r.prefix <> ''
       |              AND (CASE WHEN contains(r.prefix, '*') OR ends_with(r.prefix, '$$')
       |                   THEN regexp_matches(d.p, ${sqlPatternRegex("r.prefix")})
       |                   ELSE starts_with(d.p, r.prefix) END)
       |         THEN length(r.prefix) ELSE -1 END AS mlen
       |  FROM (SELECT $idCol, host, CASE WHEN p0 = '' THEN '/' ELSE p0 END AS p
       |        FROM (SELECT $idCol, ${Urls.sqlHost(urlExpr)} AS host,
       |                regexp_extract(trim($urlExpr), '${Urls.PathRe}', 1) AS p0
       |              FROM $docsRel)) d
       |  LEFT JOIN $rulesRel r ON r.host = d.host)
       |GROUP BY $idCol, host""".stripMargin
}
