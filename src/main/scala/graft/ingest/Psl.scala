package graft.ingest

/** The Public Suffix List (publicsuffix.org) and its eTLD+1 lookup — the
  * data behind [[Urls.registeredDomain]]'s domain collapse (the per-domain
  * cap key of RefinedWeb-style curation; reference-scale analog of the
  * host grouping `crawl.py:73`'s URL store implies).
  *
  * The list ships as a vendored resource (`graft/public_suffix_list.dat`,
  * Mozilla Public Suffix List, MPL 2.0 — public data) and is parsed once
  * per JVM at class load: executors initialize it from the application
  * jar, so there is no broadcast and no driver round-trip — the lookup is
  * a per-row pure function, safe inside codegen'd expressions.
  *
  * Rule semantics (the published PSL algorithm, totalized):
  *  - a normal rule `foo.bar` marks that exact suffix public;
  *  - a wildcard rule `*.bar` marks `<anything>.bar` public;
  *  - an exception rule `!baz.bar` overrides a wildcard: the public
  *    suffix under it is `bar` (the rule minus its leftmost label), and
  *    exceptions prevail over every other match;
  *  - the implicit default rule `*` makes every bare TLD public;
  *  - the prevailing non-exception rule is the LONGEST match.
  *
  * Totalization choices (documented; both engines and the DuckDB mirror
  * share them byte-for-byte):
  *  - a host that IS a public suffix maps to itself (never null) — for
  *    cap/blocklist keys a total function beats the spec's "no
  *    registrable domain" null;
  *  - IPv4-looking hosts (`^[0-9.]+$`) pass through;
  *  - matching is literal byte equality on the lowercased host — IDN
  *    rules match their Unicode form only (no IDNA/punycode bridging;
  *    hosts arrive lowercased from [[Urls.host]]).
  */
object Psl {

  /** (exact bases, wildcard bases, exception bases) parsed from the
    * vendored list. Wildcard/exception bases are stored WITHOUT their
    * `*.` / `!` marker. */
  private lazy val rules: (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val exact = Set.newBuilder[String]
      val wild = Set.newBuilder[String]
      val exc = Set.newBuilder[String]
      for (line0 <- src.getLines()) {
        val line = line0.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          // a rule is the token up to the first whitespace
          val rule = line.takeWhile(!_.isWhitespace)
          if (rule.startsWith("!")) exc += rule.substring(1)
          else if (rule.startsWith("*.")) wild += rule.substring(2)
          else if (rule != "*") exact += rule
        }
      }
      (exact.result(), wild.result(), exc.result())
    } finally src.close()
  }

  private lazy val exactRules: Set[String] = rules._1
  private lazy val wildcardRules: Set[String] = rules._2
  private lazy val exceptionRules: Set[String] = rules._3

  /** Longest label count among all rule bases — the candidate-suffix
    * bound: no rule can match a label suffix longer than this. */
  lazy val maxRuleLabels: Int =
    (exactRules.iterator ++ wildcardRules.iterator ++ exceptionRules.iterator)
      .map(labelCount).max

  private def labelCount(s: String): Int = {
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == '.') n += 1; i += 1 }
    n
  }

  /** `^[0-9.]+$` — the IPv4-literal pass-through guard (byte-identical
    * to the DuckDB mirror's regexp_matches). */
  private def isIpv4ish(h: String): Boolean = {
    if (h.isEmpty) return false
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if ((c < '0' || c > '9') && c != '.') return false
      i += 1
    }
    true
  }

  /** Public-suffix label count of a lowercased host given its labels
    * (split on '.', trailing empties KEPT — Spark/DuckDB split
    * semantics). Exceptions prevail (minimum if several), else the
    * longest exact/wildcard match, else the default rule (1). */
  private[ingest] def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    val kMax = math.min(n, maxRuleLabels)
    var excLen = -1
    var best = 1
    var cand: String = null
    var k = 1
    while (k <= kMax) {
      cand = if (k == 1) labels(n - 1) else labels(n - k) + "." + cand
      if (exceptionRules.contains(cand)) {
        val e = k - 1
        if (excLen < 0 || e < excLen) excLen = e
      }
      if (exactRules.contains(cand) && k > best) best = k
      if (wildcardRules.contains(cand) && n > k && k + 1 > best) best = k + 1
      k += 1
    }
    if (excLen >= 0) excLen else best
  }

  /** Registered domain (eTLD+1) of a lowercased host; total — see the
    * object doc for the edge conventions. Null-in/null-out is handled by
    * the calling expression. */
  def registeredDomainOf(host: String): String = {
    if (host.isEmpty || isIpv4ish(host)) return host
    val labels = host.split("\\.", -1)
    val keep = math.min(labels.length, publicSuffixLabels(labels) + 1)
    if (keep == labels.length) host
    else {
      val sb = new java.lang.StringBuilder(host.length)
      var i = labels.length - keep
      while (i < labels.length) {
        if (i > labels.length - keep) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }

  // ------------------------------------------------------------------
  // DuckDB mirror (printed-constant channel): the SAME parsed rule table
  // rendered as a VALUES CTE, and the SAME match as a candidate-suffix
  // equi-join — hash-joinable (the key is the candidate string alone),
  // never a rules × hosts scan.
  // ------------------------------------------------------------------

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The rule table as a `psl(base, nlab, typ)` VALUES CTE body —
    * typ ∈ {x: exact, w: wildcard, e: exception}. ~9.5k rows printed
    * once per query (the FittedOracle printed-constant discipline). */
  lazy val sqlPslCte: String = {
    val rows = new StringBuilder
    def add(set: Set[String], typ: String): Unit =
      // sorted for deterministic SQL output across JVM runs
      set.toSeq.sorted.foreach { b =>
        if (rows.nonEmpty) rows.append(",\n    ")
        rows.append(s"(${sqlQuote(b)}, ${labelCount(b)}, '$typ')")
      }
    add(rules._1, "x"); add(rules._2, "w"); add(rules._3, "e")
    s"psl(base, nlab, typ) AS (FROM (VALUES\n    $rows))"
  }

  /** CTE chain computing `domain` = [[registeredDomainOf]] for every row
    * of `src` (which must expose unique `idCol`, the `urlCol`, and
    * `carryCols`). Emits CTEs `<out>_l`, `<out>_c`, `<out>_m`, `<out>`;
    * requires [[sqlPslCte]] earlier in the same WITH. The final `<out>`
    * relation is (idCol, carryCols..., domain). */
  def sqlDomainCtes(src: String, idCol: String, carryCols: Seq[String],
                    urlCol: String, out: String): String = {
    val carry = carryCols.map(c => s"$c, ").mkString
    val k = maxRuleLabels
    s"""${out}_l AS (
       |  SELECT $idCol, $carry
       |    ${Urls.sqlHost(urlCol)} AS __h,
       |    string_split(${Urls.sqlHost(urlCol)}, '.') AS __labs,
       |    len(string_split(${Urls.sqlHost(urlCol)}, '.')) AS __n
       |  FROM $src),
       |${out}_c AS (
       |  SELECT $idCol, __n,
       |    UNNEST(list_transform(range(1, least(__n, $k) + 1),
       |      q -> array_to_string(__labs[-CAST(q AS INT):], '.'))) AS __cand
       |  FROM ${out}_l),
       |${out}_m AS (
       |  SELECT $idCol,
       |    MIN(CASE WHEN p.typ = 'e' THEN p.nlab - 1 END) AS __exc,
       |    MAX(CASE WHEN p.typ = 'x' THEN p.nlab
       |             WHEN p.typ = 'w' AND __n > p.nlab THEN p.nlab + 1 END) AS __best
       |  FROM ${out}_c JOIN psl p ON p.base = __cand
       |  GROUP BY $idCol),
       |$out AS (
       |  SELECT l.$idCol, $carry
       |    CASE WHEN l.__h IS NULL THEN NULL
       |         WHEN regexp_matches(l.__h, '^[0-9.]+$$') THEN l.__h
       |         ELSE array_to_string(l.__labs[
       |           -CAST(least(l.__n, COALESCE(m.__exc,
       |              GREATEST(COALESCE(m.__best, 1), 1)) + 1) AS INT):], '.')
       |    END AS domain
       |  FROM ${out}_l l LEFT JOIN ${out}_m m USING ($idCol))""".stripMargin
  }
}
