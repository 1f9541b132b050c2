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

  // ------------------------------------------------------- REP parsing

  /** [EXT] robots.txt TEXT parsing (`robots_parse` query) — upstream of
    * [[decisions]]: turn raw robots.txt bodies into the (id, rule,
    * prefix) table the evaluator consumes, per RFC 9309:
    *
    *  - a line is `field: value`; field names case-insensitive,
    *    `#`-comments stripped, surrounding whitespace trimmed;
    *    non-field noise lines are ignored;
    *  - CONSECUTIVE `user-agent` lines form one group header (RFC 9309
    *    ignores blank/noise lines inside a header — only an
    *    allow/disallow line closes it); the rules that follow belong to
    *    every agent in the header; a later `user-agent` line starts a
    *    NEW group; rules before any group header belong to no group and
    *    drop;
    *  - group selection for our product token: groups naming the token
    *    EXACTLY (case-insensitive) win; only when no group names it do
    *    the `*` groups apply; all matching groups merge (their rules
    *    union — RFC 9309 §2.2.1);
    *  - `sitemap` is NOT group-scoped — [[sitemapPointers]] collects it
    *    globally, feeding [[graft.sources.Sitemap.frontier]].
    *
    * Shape: one line explode (bounded by robots-file size, never corpus
    * text), two windows per id (the group-start lag and the running
    * group counter — robots files are hundreds of lines, the window
    * partitions are tiny), one per-id group-election aggregate, one
    * semi join. Everything ANSI-expressible — [[sqlParse]] mirrors 1:1.
    */
  def parse(robots: DataFrame, agentToken: String,
            idCol: String = "host", txtCol: String = "robots_txt"): DataFrame =
    electedRules(robots, agentToken, idCol, txtCol,
      Seq("allow", "disallow"))
      .select(col(idCol), col("field").as("rule"), col("value").as("prefix"))
      .distinct()
      .orderBy(col(idCol), col("rule"), col("prefix"))

  /** The shared grouping + group-election core of [[parse]] and
    * [[crawlDelays]]: line split, field/value extraction, consecutive
    * user-agent header folding, agent election (exact token beats `*`,
    * all matching groups merge), then the elected groups' rule lines
    * for `ruleFields`. NOTE the header-closing set is `ruleFields`
    * itself: [[parse]] never sees crawl-delay lines, so a crawl-delay
    * between two user-agent lines does NOT close parse's header (RFC
    * 9309 reads unknown lines as noise), while [[crawlDelays]] — whose
    * rule set includes allow/disallow too, so its groups line up with
    * the de-facto parsers that support the directive — treats any rule
    * line as the header close. */
  private def electedRules(robots: DataFrame, agentToken: String,
                           idCol: String, txtCol: String,
                           ruleFields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agent = agentToken.toLowerCase
    val w = Window.partitionBy(col(idCol)).orderBy(col("__idx"))
    // CRLF is the wire format (RFC 9309 grammar): split on \r?\n so the
    // mirror can't diverge on Java's line-terminator-aware '$' vs RE2's
    // end-of-text '$'; trim space AND tab (RFC-legal separators — a
    // space-only trim would leave '\t/private' as a never-matching
    // prefix).
    val lines = robots
      .select(col(idCol), posexplode(split(coalesce(col(txtCol), lit("")),
        "\r?\n")).as(Seq("__idx", "__raw")))
      .select(col(idCol), col("__idx"),
        trim(regexp_replace(col("__raw"), "#.*$", ""), " \t").as("__line"))
      .select(col(idCol), col("__idx"),
        lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1), " \t"))
          .as("field"),
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1), " \t")
          .as("value"))
      .filter(col("field").isin("user-agent" +: ruleFields: _*))
    val grouped = lines
      .withColumn("__new", (col("field") === "user-agent" &&
        coalesce(lag(col("field"), 1).over(w) =!= "user-agent", lit(true)))
        .cast("int"))
      .withColumn("gid", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("field") === "user-agent")
      .select(col(idCol), col("gid"), lower(col("value")).as("agent"))
    val elect = agents.groupBy(col(idCol), col("gid"))
      .agg(max((col("agent") === agent).cast("int")).as("__e"),
        max((col("agent") === "*").cast("int")).as("__s"))
      .withColumn("__he", max(col("__e")).over(
        Window.partitionBy(col(idCol))))
      .filter(col("__e") === 1 || (col("__he") === 0 && col("__s") === 1))
      .select(col(idCol), col("gid"))
    grouped.filter(col("field").isin(ruleFields: _*) && col("gid") > 0)
      .join(elect, Seq(idCol, "gid"), "left_semi")
      .select(col(idCol), col("field"), col("value"))
  }

  /** [EXT] Elected `crawl-delay` per host (`crawl_delay_schedule`'s
    * robots half) — the de-facto politeness directive (not in RFC 9309;
    * Bing/Yandex honor it, Google ignores it — documented): seconds,
    * possibly fractional, group-scoped like allow/disallow. Election is
    * [[parse]]'s (exact token beats `*`, matching groups merge); among
    * elected values the MAX wins (the conservative read when a file
    * contradicts itself). Output (idCol, crawl_delay_ms BIGINT) — only
    * hosts that declare one; consumers default the rest
    * ([[Frontier.scheduleWithDelays]]). Non-numeric values are author
    * error and drop (the guarded-cast totality rule). */
  def crawlDelays(robots: DataFrame, agentToken: String,
                  idCol: String = "host",
                  txtCol: String = "robots_txt"): DataFrame =
    electedRules(robots, agentToken, idCol, txtCol,
      Seq("allow", "disallow", "crawl-delay"))
      .filter(col("field") === "crawl-delay" &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col(idCol),
        round(col("value").cast("double") * 1000.0).cast("long").as("ms"))
      .groupBy(col(idCol))
      .agg(max(col("ms")).as("crawl_delay_ms"))
      .orderBy(col(idCol))

  /** `Sitemap:` directives of the robots bodies — global per RFC 9309
    * (never group-scoped), URL case preserved. Feeds the sitemap reader
    * and [[graft.sources.Sitemap.frontier]]. */
  def sitemapPointers(robots: DataFrame, idCol: String = "host",
                      txtCol: String = "robots_txt"): DataFrame =
    robots
      .select(col(idCol), explode(split(coalesce(col(txtCol), lit("")),
        "\r?\n")).as("__raw"))
      .select(col(idCol),
        trim(regexp_replace(col("__raw"), "#.*$", ""), " \t").as("__line"))
      .filter(lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1), " \t"))
        === "sitemap")
      .select(col(idCol),
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1), " \t")
          .as("loc"))
      .filter(col("loc") =!= "")
      .distinct()
      .orderBy(col(idCol), col("loc"))

  /** [[parse]] as a DuckDB CTE chain + final SELECT over a relation
    * exposing (idCol, txtExpr); caller opens the WITH. */
  def sqlParse(from: String, agentToken: String, idCol: String,
               txtExpr: String): String =
    s"""${sqlElectedRules(from, agentToken, idCol, txtExpr,
          Seq("allow", "disallow"))}
       |SELECT DISTINCT $idCol, field AS rule, value AS prefix
       |FROM rp_x
       |ORDER BY $idCol, rule, prefix""".stripMargin

  /** [[crawlDelays]] as a DuckDB CTE chain + final SELECT. */
  def sqlCrawlDelays(from: String, agentToken: String, idCol: String,
                     txtExpr: String): String =
    s"""${sqlElectedRules(from, agentToken, idCol, txtExpr,
          Seq("allow", "disallow", "crawl-delay"))}
       |SELECT $idCol,
       |  CAST(MAX(CAST(round(CAST(value AS DOUBLE) * 1000.0) AS BIGINT))
       |    AS BIGINT) AS crawl_delay_ms
       |FROM rp_x
       |WHERE field = 'crawl-delay'
       |  AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$$')
       |GROUP BY $idCol
       |ORDER BY $idCol""".stripMargin

  /** Shared CTE core of [[sqlParse]]/[[sqlCrawlDelays]] — the
    * [[electedRules]] twin, ending in `rp_x(idCol, field, value)`. */
  private def sqlElectedRules(from: String, agentToken: String,
                              idCol: String, txtExpr: String,
                              fields: Seq[String]): String = {
    val agent = agentToken.toLowerCase.replace("'", "''")
    val fieldList = ("user-agent" +: fields).map(f => s"'$f'").mkString(", ")
    val ruleList = fields.map(f => s"'$f'").mkString(", ")
    s"""rp_raw AS (
       |  SELECT $idCol, UNNEST(list_zip(
       |    regexp_split_to_array(COALESCE($txtExpr, ''), '\\r?\\n'),
       |    range(1, len(regexp_split_to_array(COALESCE($txtExpr, ''),
       |      '\\r?\\n')) + 1)))
       |    AS z
       |  FROM $from),
       |rp_ln AS (
       |  SELECT $idCol, z[2] AS __idx,
       |    trim(regexp_replace(z[1], '#.*$$', ''), ' ' || chr(9)) AS __line
       |  FROM rp_raw),
       |rp_f AS (
       |  SELECT $idCol, __idx,
       |    lower(trim(regexp_extract(__line, '^([^:]+):', 1), ' ' || chr(9)))
       |      AS field,
       |    trim(regexp_extract(__line, '^[^:]+:(.*)$$', 1), ' ' || chr(9))
       |      AS value
       |  FROM rp_ln
       |  WHERE lower(trim(regexp_extract(__line, '^([^:]+):', 1), ' ' || chr(9)))
       |    IN ($fieldList)),
       |rp_g AS (
       |  SELECT *, SUM(__new) OVER (PARTITION BY $idCol ORDER BY __idx
       |    ROWS UNBOUNDED PRECEDING) AS gid
       |  FROM (
       |    SELECT *, CAST(field = 'user-agent' AND COALESCE(
       |      LAG(field) OVER (PARTITION BY $idCol ORDER BY __idx)
       |        <> 'user-agent', TRUE) AS INT) AS __new
       |    FROM rp_f)),
       |rp_e AS (
       |  SELECT $idCol, gid FROM (
       |    SELECT $idCol, gid,
       |      MAX(CAST(lower(value) = '$agent' AS INT)) AS __e,
       |      MAX(CAST(value = '*' AS INT)) AS __s,
       |      MAX(MAX(CAST(lower(value) = '$agent' AS INT)))
       |        OVER (PARTITION BY $idCol) AS __he
       |    FROM rp_g WHERE field = 'user-agent'
       |    GROUP BY $idCol, gid)
       |  WHERE __e = 1 OR (__he = 0 AND __s = 1)),
       |rp_x AS (
       |  SELECT $idCol, field, value
       |  FROM rp_g JOIN rp_e USING ($idCol, gid)
       |  WHERE field IN ($ruleList) AND gid > 0)""".stripMargin
  }

  /** [[sitemapPointers]] as a DuckDB CTE chain + final SELECT. */
  def sqlSitemapPointers(from: String, idCol: String,
                         txtExpr: String): String =
    s"""sp_ln AS (
       |  SELECT $idCol,
       |    trim(regexp_replace(UNNEST(regexp_split_to_array(
       |      COALESCE($txtExpr, ''), '\\r?\\n')), '#.*$$', ''), ' ' || chr(9))
       |      AS __line
       |  FROM $from)
       |SELECT DISTINCT $idCol,
       |  trim(regexp_extract(__line, '^[^:]+:(.*)$$', 1), ' ' || chr(9)) AS loc
       |FROM sp_ln
       |WHERE lower(trim(regexp_extract(__line, '^([^:]+):', 1), ' ' || chr(9)))
       |    = 'sitemap'
       |  AND trim(regexp_extract(__line, '^[^:]+:(.*)$$', 1), ' ' || chr(9))
       |    <> ''
       |ORDER BY $idCol, loc""".stripMargin

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
