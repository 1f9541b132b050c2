package graft

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{RecentArticles, SourceDistribution, Timeline, Totals}
import graft.dedup.Dedup
import graft.ingest.{Dates, Ingest}
import graft.multimodal.Multimodal
import graft.relational.Relational
import graft.similarity.{FittedOracle, Ivf, Pq, Similarity}
import graft.streaming.EventWindows
import graft.text.{Stopwords, TextAnalysis, WordFrequencies}

/** Shared fixture builders and oracle-SQL helpers for the entry
  * slices (r14 split; moved verbatim from SparkEntry's private members
  * — the object is `private[graft]`, so visibility is unchanged in
  * practice). */
private[graft] object EntryFixtures {

  /** Exact-decontamination oracle — shared verbatim by `decontaminate` and
    * `decontaminate_bloom`: the Bloom pass is a prefilter with no false
    * negatives followed by the exact verify, so both queries must produce
    * row-identical output. */
  val DecontaminateSql =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
      |sh AS (
      |  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
      |  FROM tok),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |o AS (
      |  SELECT d.doc_id, COUNT(*) AS n_overlap
      |  FROM sh d JOIN bench USING (sh) GROUP BY 1)
      |SELECT t.doc_id AS doc_id,
      |  COALESCE(o.n_overlap, 0) AS n_overlap,
      |  CAST(COALESCE(o.n_overlap, 0) >= 5 AS INT) AS contaminated
      |FROM tok t LEFT JOIN o ON t.doc_id = o.doc_id
      |ORDER BY doc_id""".stripMargin

  /** The `corpus_pipeline` WITH-chain, parameterized by the optional
    * Gopher-gate predicate (stage 3b): `corpus_pipeline` passes None,
    * `corpus_pipeline_gated` passes
    * [[graft.text.GopherRules.sqlPassExpr]] over the span-deduped text
    * — ONE predicate difference, so the two oracles can never drift. */
  def corpusPipelineSql(
      gopherPred: Option[String],
      repetitionTh: Option[graft.text.GopherRepetition.Thresholds] = None)
      : String = {
    import graft.pipeline.Pii
    val gate = gopherPred.map(p => s" AND $p").getOrElse("") +
      repetitionTh.map { th =>
        // The repetition gate over the span-deduped text, as a semi-join
        // against the relational signal subquery (Spark applies the same
        // conjunction as a per-row fold expression).
        val sig = graft.text.GopherRepetition.sqlSignals(
          "(SELECT doc_id, red AS text FROM sd) rsrc", th)
        s" AND doc_id IN (SELECT doc_id FROM ($sig) rs WHERE rs.pass)"
      }.getOrElse("")
    s"""WITH scrub AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '${Pii.EmailRe}', '<EMAIL>', 'g'),
       |      '${Pii.Ipv4Re}', '<IP>', 'g'),
       |      '${Pii.PhoneRe}', '<PHONE>', 'g') AS red
       |  FROM documents),
       |tok0 AS (
       |  SELECT doc_id, regexp_extract_all(lower(red), '[^ \\t\\n\\x0B\\f\\r]+') AS toks FROM scrub),
       |benchsh AS (
       |  SELECT DISTINCT UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
       |  FROM tok0 WHERE doc_id % 97 = 0 AND doc_id < 5000),
       |su AS (
       |  SELECT doc_id, CAST((s - 1) // 20 AS BIGINT) AS idx,
       |    array_to_string(list_slice(stoks, s, least(s + 19, len(stoks))), ' ') AS raw
       |  FROM (SELECT doc_id, stoks, UNNEST(range(1, len(stoks) + 1, 20)) AS s
       |        FROM (SELECT doc_id, regexp_extract_all(red, '[^ \\t\\n\\x0B\\f\\r]+') AS stoks FROM scrub)
       |        WHERE len(stoks) > 0)),
       |sm AS (
       |  SELECT doc_id, idx, raw,
       |    ROW_NUMBER() OVER (PARTITION BY lower(raw) ORDER BY doc_id, idx) AS rn,
       |    COUNT(*) OVER (PARTITION BY lower(raw)) AS n_occ
       |  FROM su),
       |sd AS (
       |  SELECT doc_id, string_agg(raw, ' ' ORDER BY idx) AS red
       |  FROM sm WHERE rn = 1 OR n_occ < 3 GROUP BY 1),
       |tok AS (
       |  SELECT doc_id, red, regexp_extract_all(lower(red), '[^ \\t\\n\\x0B\\f\\r]+') AS toks FROM sd),
       |quality AS (SELECT * FROM tok WHERE len(toks) >= 20$gate),
       |keep AS (
       |  SELECT doc_id, red, toks FROM (
       |    SELECT doc_id, red, toks, MIN(doc_id) OVER (PARTITION BY red) AS keeper
       |    FROM quality)
       |  WHERE doc_id = keeper),
       |docsh AS (
       |  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
       |  FROM keep),
       |ovl AS (
       |  SELECT d.doc_id, COUNT(*) AS n FROM docsh d JOIN benchsh USING (sh) GROUP BY 1),
       |clean AS (
       |  SELECT k.doc_id, k.red, len(k.toks)::BIGINT AS n_tokens
       |  FROM keep k LEFT JOIN ovl o ON k.doc_id = o.doc_id
       |  WHERE COALESCE(o.n, 0) < 5),
       |sampled AS (
       |  SELECT doc_id, n_tokens FROM clean
       |  WHERE ('0x' || substring(md5(red), 1, 8))::UBIGINT % 10000 < 8000),
       |o2 AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS off
       |  FROM sampled)
       |SELECT doc_id, n_tokens,
       |  CAST(FLOOR(off / 512.0) AS BIGINT) AS chunk_id,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE CAST(FLOOR((off + n_tokens - 1) / 512.0) AS BIGINT)
       |            - CAST(FLOOR(off / 512.0) AS BIGINT) + 1 END AS n_chunks
       |FROM o2 ORDER BY doc_id""".stripMargin
  }

  /** Shared paragraph-dedup oracle prefix: fixture VALUES -> split on
    * blank lines -> 0-based idx -> normalize (collapse ws + trim + lower,
    * the [[graft.dedup.ParagraphDedup.normalize]] contract) -> keep-first
    * window. `paragraph_dedup`, `paragraph_dedup_df`, and
    * `paragraph_dedup_audit` all build on it. */
  def paragraphCte: String = {
    val values = ParagraphFixture.docs
      .map { case (id, t) =>
        s"($id, e'${t.replace("'", "''").replace("\n", "\\n")}')" }
      .mkString(",\n        ")
    s"""WITH d AS (SELECT * FROM (VALUES
       |        $values) t(doc_id, text)),
       |u AS (
       |  SELECT doc_id, CAST(w.i - 1 AS BIGINT) AS idx, w.raw AS raw,
       |    lower(trim(regexp_replace(w.raw, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS norm
       |  FROM (
       |    SELECT doc_id, UNNEST(list_transform(range(1, len(parts) + 1),
       |      i -> {'i': i, 'raw': parts[i]})) AS w
       |    FROM (SELECT doc_id, regexp_split_to_array(text, '\\n{2,}') AS parts FROM d))),
       |uu AS (SELECT * FROM u WHERE norm <> ''),
       |m AS (
       |  SELECT doc_id, idx, raw, norm,
       |    ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, idx) AS rn,
       |    COUNT(*) OVER (PARTITION BY norm) AS n_occ
       |  FROM uu)""".stripMargin
  }

  /** Cleaned-documents tail of the paragraph oracle, parameterized by the
    * df threshold (minOcc = 2 -> plain keep-first). */
  def paragraphCleanSql(minOcc: Long): String =
    s"""$paragraphCte,
       |k AS (SELECT * FROM m WHERE rn = 1 OR n_occ < $minOcc),
       |agg AS (
       |  SELECT doc_id, string_agg(raw, e'\\n\\n' ORDER BY idx) AS text_clean,
       |    CAST(COUNT(*) AS BIGINT) AS n_kept
       |  FROM k GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units FROM uu GROUP BY 1)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  COALESCE(agg.text_clean, '') AS text_clean,
       |  COALESCE(agg.n_kept, 0) AS n_kept,
       |  COALESCE(tot.n_units, 0) - COALESCE(agg.n_kept, 0) AS n_removed
       |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |       LEFT JOIN tot ON d.doc_id = tot.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Shared substring-dedup oracle prefix (mirrors
    * [[graft.dedup.SubstringDedup.windows]] at width=20, stride=5 over
    * `documents`): explicit whitespace class `[ \t\x0B\f\r\n]` (the
    * SplitWhitespace byte set — RE2's `\S` EXCLUDES \x0B, so the class is
    * pinned rather than inherited), overlapping starts with the tail
    * window, md5-keyed keep-first marking. */
  def substringCte: String = substringCteFor(
    "list_distinct(list_append(range(1, len(toks) - 18, 5), len(toks) - 19))")

  /** Content-anchored start rule (SubstringDedup `anchored = true`):
    * starts where the md5 first-8-hex bucket of the lowercased token is
    * 0 mod 5 — DuckDB's `range` upper bound is exclusive, so
    * `len - 18` covers inclusive starts 1 … len−19. */
  def substringAnchoredCte: String = substringCteFor(
    """list_filter(range(1, len(toks) - 18),
      |            s -> ('0x' || substring(md5(lower(toks[s])), 1, 8))::UBIGINT % 5 = 0)""".stripMargin)

  def substringCteFor(startsList: String): String =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+') AS toks
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, CAST(s AS BIGINT) AS start,
      |    lower(array_to_string(list_slice(toks, s, s + 19), ' ')) AS norm
      |  FROM (SELECT doc_id, toks,
      |          UNNEST($startsList) AS s
      |        FROM t WHERE len(toks) >= 20)),
      |m AS (
      |  SELECT doc_id, start, norm, md5(norm) AS h,
      |    ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id, start) AS rn,
      |    COUNT(*) OVER (PARTITION BY md5(norm)) AS n_occ
      |  FROM w)""".stripMargin

  /** Full substring-dedup oracle (interval merge + token rebuild) over
    * either start-rule CTE — one shared tail so the fixed-stride and
    * anchored variants cannot drift. */
  def substringDedupSql(cte: String): String =
    s"""$cte,
       |r AS (SELECT doc_id, start, start + 19 AS fin
       |      FROM m WHERE rn > 1 AND n_occ >= 2),
       |i AS (
       |  SELECT doc_id, start, fin,
       |    MAX(fin) OVER (PARTITION BY doc_id ORDER BY start
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_fin
       |  FROM r),
       |g AS (
       |  SELECT doc_id, start, fin,
       |    SUM(CASE WHEN prev_fin IS NULL OR start > prev_fin + 1
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY start) AS island
       |  FROM i),
       |mi AS (SELECT doc_id, MIN(start) AS rm_start, MAX(fin) AS rm_end
       |       FROM g GROUP BY doc_id, island),
       |tok AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS pos, toks[p] AS tok
       |  FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks) + 1)) AS p
       |        FROM t)),
       |kept AS (
       |  SELECT tok.* FROM tok
       |  WHERE NOT EXISTS (SELECT 1 FROM mi
       |    WHERE mi.doc_id = tok.doc_id
       |      AND tok.pos BETWEEN mi.rm_start AND mi.rm_end)),
       |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
       |        CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
       |SELECT d.doc_id AS doc_id, COALESCE(agg.text_clean, '') AS text_clean,
       |  COALESCE(tot.n_tokens, 0) AS n_tokens,
       |  COALESCE(tot.n_tokens, 0) - COALESCE(agg.n_kept, 0) AS n_removed
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |     LEFT JOIN tot ON d.doc_id = tot.doc_id
       |ORDER BY doc_id""".stripMargin

  /** VALUES CTE over [[UrlFixture]] for the canonicalization oracles. */
  def urlValuesCte: String = {
    val values = UrlFixture.urls
      .map { case (id, u) => s"($id, '${u.replace("'", "''")}')" }
      .mkString(",\n        ")
    s"""WITH d AS (SELECT * FROM (VALUES
       |        $values) t(id, url))""".stripMargin
  }


  /** Host mix for the `domain_caps` fixture URLs: deliberately
    * domain-skewed (6/10 hosts under one registered domain) plus a
    * two-label public-suffix case, so the cap is only correct if
    * subdomains collapse to eTLD+1 and `foo.co.uk` survives intact. */
  val DomainCapHosts = Seq(
    "news.example.com", "blog.example.com", "shop.example.com",
    "example.com", "cdn.example.com", "static.example.com",
    "mirror.openweb.org", "data.openweb.org",
    "docs.data.net", "archive.foo.co.uk")

  /** Non-latin samples planted by `script_mix` (index = doc_id mod 5,
    * 1-based into this list; mod 0 keeps the latin fixture text). */
  val ScriptSamples = Seq(
    "привет мир сегодня", "你好世界今天 𠀀😀", "γεια σου κόσμε", "مرحبا بالعالم")

  /** WARC archive blobs built from the documents table (one archive per
    * source, records ordered by doc_id) — the `warc_records` /
    * `warc_html_documents` fixture; the oracle constructs the identical
    * record bytes in SQL (e'\r\n' escapes), so the gate proves
    * [[graft.sources.Warc.parse]] inverts the construction exactly. */
  def warcBlobs(docs: DataFrame): DataFrame = {
    val uri = concat(lit("https://example.org/"), col("source"), lit("/"),
      col("doc_id"))
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body>"),
      col("text"), lit("</body></html>"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    docs.groupBy(col("source"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), rec.as("rec")))),
        s => s.getField("rec")), "").as("blob"))
      .select(col("source").as("path"), col("blob").cast("binary").as("content"))
  }

  /** The per-doc WARC construction as DuckDB CTEs `wr` (source, doc_id,
    * uri, payload, clen, rec) — the oracle twin of [[warcBlobs]]. */
  val sqlWarcCtes: String =
    // NOTE: built WITHOUT stripMargin-style leading pipes and with no
    // line starting in `||` — this fragment embeds into outer strings
    // whose own .stripMargin would otherwise eat the first pipe of a
    // leading concat operator.
    "wr0 AS (\n" +
      "  SELECT source, doc_id, text,\n" +
      "    'https://example.org/' || source || '/' || doc_id AS uri,\n" +
      "    e'HTTP/1.1 200 OK\\r\\nContent-Type: text/html\\r\\n\\r\\n<html><body>' ||\n" +
      "      text || '</body></html>' AS payload\n" +
      "  FROM documents),\n" +
      "wr AS (\n" +
      "  SELECT source, doc_id, uri, payload,\n" +
      "    CAST(strlen(payload) AS BIGINT) AS clen,\n" +
      "    e'WARC/1.0\\r\\nWARC-Type: response\\r\\nWARC-Target-URI: ' || uri ||\n" +
      "    e'\\r\\nWARC-Date: 2026-01-01T00:00:00Z\\r\\nContent-Length: ' ||\n" +
      "    strlen(payload) || e'\\r\\n\\r\\n' || payload || e'\\r\\n\\r\\n' AS rec\n" +
      "  FROM wr0)"

  /** Samples planted by `lang_script_consistency` (index = doc_id mod 5,
    * 1-based; mod 0 keeps the fixture text): a pinyin transliteration
    * (zh prediction over latin script — inconsistent), a mislabel (en
    * markers drowned in cyrillic mass — inconsistent), a consistent
    * German doc, and an abstaining pure-CJK doc (no marker hits → und →
    * vacuously consistent). */
  val LangScriptSamples = Seq(
    "shi bu wo ni zai hen ma ba",
    "the and of занимает большое количество текста здесь",
    "der und das ist nicht ein mit",
    "這是一個測試文本沒有標記詞")

  /** Deterministic per-doc URLs over the skewed host mix — shared by the
    * `domain_caps` / `domain_blocklist` queries and their oracles. */
  def withFixtureUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(lit("https://"),
      element_at(array(DomainCapHosts.map(lit(_)): _*),
        (col("doc_id") % 10 + 1).cast("int")),
      lit("/"), col("source"), lit("/"), col("doc_id")))

  /** The fixture-URL construction as DuckDB SQL (the oracle twin of
    * [[withFixtureUrls]]). */
  def sqlFixtureUrl: String =
    s"'https://' || [${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1] || '/' || source || '/' || CAST(doc_id AS VARCHAR)"

  /** Fixture HTML with a full anchor zoo (r10, `host_link_graph` /
    * `anchor_texts` / `web_trustrank`): an absolute cross-host link, a
    * root-relative and a path-relative same-host link (self-loops at
    * domain granularity), a scheme-relative cross-host link, plus the
    * drop cases — fragment-only, mailto:, and an anchor with no href.
    * Both engines construct identical bytes ([[sqlLinkHtml]]); the
    * extraction + resolution mirror is what the oracles check. */
  def withLinkHtml(docs: DataFrame): DataFrame = {
    val hosts = array(DomainCapHosts.map(lit(_)): _*)
    withFixtureUrls(docs).withColumn("html", concat(
      lit("<html><body><h1>Doc "), col("doc_id"), lit("</h1>"),
      lit("<a href=\"https://"),
      element_at(hosts, ((col("doc_id") + 3) % 10 + 1).cast("int")),
      lit("/ref/"), col("doc_id"), lit("\">Read <b>more</b> here</a>"),
      lit("<a href='/local/sec"), col("doc_id") % 7,
      lit("'>Local section</a>"),
      lit("<a href=\"notes/"), col("doc_id") % 5,
      lit(".html\">Related notes</a>"),
      lit("<a href=\"//"),
      element_at(hosts, ((col("doc_id") + 5) % 10 + 1).cast("int")),
      lit("/mirror\">Mirror copy</a>"),
      lit("<a href=\"#top\">Back to top</a>"),
      lit("<a href=\"mailto:info@example.com\">Mail us</a>"),
      lit("<a name=\"x\">Not a link</a>"),
      lit("</body></html>")))
  }

  /** DuckDB twin of [[withLinkHtml]]'s html expression. */
  def sqlLinkHtml: String = {
    val hosts = s"[${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]"
    s"""'<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
       |'<a href="https://' || $hosts[CAST((doc_id + 3) % 10 AS INT) + 1] ||
       |'/ref/' || CAST(doc_id AS VARCHAR) || '">Read <b>more</b> here</a>' ||
       |'<a href=''/local/sec' || CAST(doc_id % 7 AS VARCHAR) ||
       |'''>Local section</a>' ||
       |'<a href="notes/' || CAST(doc_id % 5 AS VARCHAR) ||
       |'.html">Related notes</a>' ||
       |'<a href="//' || $hosts[CAST((doc_id + 5) % 10 AS INT) + 1] ||
       |'/mirror">Mirror copy</a>' ||
       |'<a href="#top">Back to top</a>' ||
       |'<a href="mailto:info@example.com">Mail us</a>' ||
       |'<a name="x">Not a link</a></body></html>'""".stripMargin
  }

  /** Fixture HTML heads for `canonical_link_dedup` (r11): per doc_id%4 —
    * no canonical declaration (self cluster), an absolute SELF-canonical
    * with a tracking param canonicalize must strip, and a (4k+2, 4k+3)
    * variant pair declaring the same syndication target — absolute
    * single-quoted href-first vs scheme-relative double-quoted
    * rel-first, so attribute order, quote style, and the resolver's
    * scheme attachment are all on the gate. A rel="alternate" link sits
    * in every head as the filter decoy. */
  def withCanonicalHtml(docs: DataFrame): DataFrame =
    withFixtureUrls(docs).withColumn("html", concat(
      lit("<html><head><link rel=\"alternate\" href=\"/feed.xml\">"),
      when(col("doc_id") % 4 === 1,
        concat(lit("<link rel=\"canonical\" href=\""), col("url"),
          lit("?utm_campaign=x\">")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("<link href='https://dup.example.org/page/"),
            expr("doc_id div 4"), lit("' rel='canonical'>")))
        .when(col("doc_id") % 4 === 3,
          concat(lit("<link rel=\"canonical\" href=\"//dup.example.org/page/"),
            expr("doc_id div 4"), lit("\">")))
        .otherwise(lit("")),
      lit("</head><body><p>Doc "), col("doc_id"), lit("</p></body></html>")))

  /** DuckDB twin of [[withCanonicalHtml]]'s html expression (expects a
    * `url` column in scope). */
  def sqlCanonicalHtml: String =
    s"""'<html><head><link rel="alternate" href="/feed.xml">' ||
       |CASE CAST(doc_id % 4 AS INT)
       |  WHEN 1 THEN '<link rel="canonical" href="' || url || '?utm_campaign=x">'
       |  WHEN 2 THEN '<link href=''https://dup.example.org/page/' ||
       |    CAST(doc_id // 4 AS VARCHAR) || ''' rel=''canonical''>'
       |  WHEN 3 THEN '<link rel="canonical" href="//dup.example.org/page/' ||
       |    CAST(doc_id // 4 AS VARCHAR) || '">'
       |  ELSE '' END ||
       |'</head><body><p>Doc ' || CAST(doc_id AS VARCHAR) || '</p></body></html>'""".stripMargin

  /** Fixture sitemap XML (r10, `sitemap_entries`): every 10th doc is a
    * sitemap INDEX (two child sitemaps, one with lastmod), the rest are
    * urlsets with a fully-tagged entry, an entity-escaped loc
    * (`&amp;` in a query string), and a loc-less block that must drop.
    * Both engines construct identical bytes ([[sqlSitemapXml]]). */
  def withSitemapXml(docs: DataFrame): DataFrame = {
    val hosts = array(DomainCapHosts.map(lit(_)): _*)
    val host = element_at(hosts, (col("doc_id") % 10 + 1).cast("int"))
    val dt = concat(lit("2024-"),
      lpad((col("doc_id") % 12 + 1).cast("string"), 2, "0"), lit("-"),
      lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))
    val cf = element_at(array(lit("daily"), lit("weekly"), lit("monthly")),
      (col("doc_id") % 3 + 1).cast("int"))
    val pr = concat(lit("0."), (col("doc_id") % 9 + 1).cast("string"))
    val urlset = concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      lit("<url><loc>https://"), host, lit("/page/"), col("doc_id"),
      lit("</loc><lastmod>"), dt, lit("</lastmod><changefreq>"), cf,
      lit("</changefreq><priority>"), pr, lit("</priority></url>"),
      lit("<url><loc>https://"), host,
      lit("/search?q=a&amp;page=2</loc></url>"),
      lit("<url><changefreq>weekly</changefreq></url>"),
      lit("</urlset>"))
    val index = concat(
      lit("<?xml version=\"1.0\"?><sitemapindex>"),
      lit("<sitemap><loc>https://"), host,
      lit("/sitemap-a.xml</loc><lastmod>"), dt, lit("</lastmod></sitemap>"),
      lit("<sitemap><loc>https://"), host,
      lit("/sitemap-b.xml</loc></sitemap>"),
      lit("</sitemapindex>"))
    docs.withColumn("xml",
      when(col("doc_id") % 10 === 0, index).otherwise(urlset))
  }

  /** DuckDB twin of [[withSitemapXml]]'s xml expression. */
  def sqlSitemapXml: String = {
    val host = s"[${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1]"
    val dt = "'2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || " +
      "'-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')"
    val cf = "['daily', 'weekly', 'monthly'][CAST(doc_id % 3 AS INT) + 1]"
    val pr = "'0.' || CAST(doc_id % 9 + 1 AS VARCHAR)"
    s"""CASE WHEN doc_id % 10 = 0 THEN
       |  '<?xml version="1.0"?><sitemapindex>' ||
       |  '<sitemap><loc>https://' || $host ||
       |  '/sitemap-a.xml</loc><lastmod>' || $dt || '</lastmod></sitemap>' ||
       |  '<sitemap><loc>https://' || $host || '/sitemap-b.xml</loc></sitemap>' ||
       |  '</sitemapindex>'
       |ELSE
       |  '<?xml version="1.0"?><urlset>' ||
       |  '<url><loc>https://' || $host || '/page/' || CAST(doc_id AS VARCHAR) ||
       |  '</loc><lastmod>' || $dt || '</lastmod><changefreq>' || $cf ||
       |  '</changefreq><priority>' || $pr || '</priority></url>' ||
       |  '<url><loc>https://' || $host || '/search?q=a&amp;page=2</loc></url>' ||
       |  '<url><changefreq>weekly</changefreq></url>' ||
       |  '</urlset>'
       |END""".stripMargin
  }

  /** Fixture robots.txt bodies (r10, `robots_parse` / `robots_sitemaps`),
    * one variant per doc_id mod 4, each exercising a parser branch:
    * pre-group stray rules + exact-beats-star election + a Sitemap line
    * inside a group (0); star-only group with a bare `Disallow:` and a
    * wildcard (1); a two-agent shared header with mixed-case field
    * names (2); no matching agent at all — zero rules, sitemap still
    * global (3). `{host}` interpolates the fixture host; ONE line-
    * template list generates both engines' construction. */
  val RobotsTxtVariants: Seq[Seq[String]] = Seq(
    Seq("# corpus crawler policy", "Disallow: /pre-group-stray",
      "User-agent: graftbot", "Disallow: /private", "Allow: /private/ok",
      "Sitemap: https://{host}/sitemap.xml", "User-agent: *", "Disallow: /"),
    Seq("User-agent: *", "Disallow:", "Allow: /docs", "Disallow: /tmp*/"),
    Seq("User-Agent: GraftBot", "user-agent: otherbot", "ALLOW: /shared",
      "Disallow: /shared/no"),
    Seq("User-agent: otherbot", "Disallow: /",
      "Sitemap: https://{host}/other-sitemap.xml"))

  /** Host-keyed robots bodies for `crawl_delay_schedule` (r11): per
    * host (by index % 4) — a graftbot group WITH a Crawl-delay (an
    * invalid value dropping beside it, a slower `*` group that must
    * lose the election), a `*` group with TWO delays (max wins), an
    * elected graftbot group WITHOUT a delay (the `*` group's 9s must
    * NOT leak in — default applies), and no delay anywhere. Plain
    * Scala strings so the Spark rows and the oracle VALUES are the
    * same bytes by construction. */
  val HostRobotsRows: Seq[(String, String)] = {
    val variants: Seq[Seq[String]] = Seq(
      Seq("User-agent: graftbot", "Disallow: /private", "Crawl-delay: 2",
        "Crawl-delay: fast", "User-agent: *", "Crawl-delay: 10"),
      Seq("User-agent: *", "Crawl-delay: 0.5", "Allow: /docs",
        "Crawl-delay: 1.5"),
      Seq("User-agent: graftbot", "Disallow: /tmp",
        "User-agent: *", "Crawl-delay: 9"),
      Seq("User-agent: *", "Disallow: /drafts"))
    DomainCapHosts.zipWithIndex.map { case (h, i) =>
      (h, variants(i % variants.size).map(_.replace("{host}", h))
        .mkString("\n"))
    }
  }

  def withRobotsTxt(docs: DataFrame): DataFrame = {
    val host = element_at(array(DomainCapHosts.map(lit(_)): _*),
      (col("doc_id") % 10 + 1).cast("int"))
    def lineCol(line: String): org.apache.spark.sql.Column = {
      val parts = line.split("\\{host\\}", -1)
      parts.map(p => lit(p)).reduceLeft((a, b) => concat(a, host, b))
    }
    val variants = RobotsTxtVariants.map(v =>
      v.map(lineCol).reduceLeft((a, b) => concat(a, lit("\n"), b)))
    docs.withColumn("robots_txt",
      element_at(array(variants: _*), (col("doc_id") % 4 + 1).cast("int")))
  }

  /** DuckDB twin of [[withRobotsTxt]]'s text expression. */
  def sqlRobotsTxt: String = {
    val host = s"[${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1]"
    def lineSql(line: String): String =
      line.split("\\{host\\}", -1).map(p => s"'$p'").mkString(s" || $host || ")
    val variants = RobotsTxtVariants.map(_.map(lineSql).mkString(" || chr(10) || "))
    variants.zipWithIndex.map { case (v, i) =>
      s"WHEN doc_id % 4 = $i THEN $v"
    }.mkString("CASE ", "\n  ", " END")
  }

  /** Spam-path suffixes planted by doc id for `url_spam_scores`: a
    * blocking word (1.0), two additive soft words (0.5 + 0.5 = 1.0), one
    * soft word alone (0.5, below threshold), and clean paths. */
  val SpamPathSuffixes = Seq(
    "", "/casino-bonus", "/free-download/poker-night", "/betting-tips", "/about")

  /** Fixture URLs with the spam-path suffixes appended (doc_id mod 5). */
  def withSpamUrls(docs: DataFrame): DataFrame =
    withFixtureUrls(docs).withColumn("url", concat(col("url"),
      element_at(array(SpamPathSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withSpamUrls]]'s url expression. */
  def sqlSpamUrl: String =
    s"($sqlFixtureUrl || [${SpamPathSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Fixture URLs with deterministic SECTION paths (`/sec<id mod 7>/
    * page/<id>`) so robots prefix rules can target known sections. */
  def withRobotsUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(lit("https://"),
      element_at(array(DomainCapHosts.map(lit(_)): _*),
        (col("doc_id") % 10 + 1).cast("int")),
      lit("/sec"), col("doc_id") % 7, lit("/page/"), col("doc_id")))

  /** DuckDB twin of [[withRobotsUrls]]'s url expression. */
  def sqlRobotsUrl: String =
    s"('https://' || [${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1] || '/sec' || CAST(doc_id % 7 AS VARCHAR)" +
      " || '/page/' || CAST(doc_id AS VARCHAR))"

  /** Card-number suffixes planted by doc id for `pii_credit_cards`: a
    * Luhn-valid Visa test number, its checksum-failing twin, a valid
    * Mastercard beside a Luhn-failing 13-digit serial (two candidates,
    * one valid — the conditional redaction masks BOTH), and a digit run
    * too short to be a candidate at all. */
  val CcTextSuffixes = Seq(
    "",
    " pay 4111 1111 1111 1111 today",
    " ref 4111-1111-1111-1112 case",
    " order 5500 0000 0000 0004 shipped serial 1234567890123 x",
    " invoice 99 1234567 internal")

  def withCcTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(CcTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withCcTexts]]'s text expression. */
  def sqlCcText: String =
    s"(text || [${CcTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Mojibake suffixes planted by doc id for `mojibake_repair` — BUILT
    * from the repair table ([[graft.text.Encoding.moj]]) so fixture and
    * table cannot drift: accented-letter corruption, punctuation
    * corruption, and symbol corruption. */
  val MojTextSuffixes: Seq[String] = {
    import graft.text.Encoding.moj
    Seq(
      "",
      s" Caf${moj("é")} d${moj("é")}j${moj("à")} vu",
      s" don${moj("’")}t ${moj("“")}quote${moj("‘")} me ${moj("–")} ok",
      s" 25${moj("°")}C ${moj("€")}50 ${moj("™")}")
  }

  def withMojTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(MojTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 4 + 1).cast("int"))))

  /** DuckDB twin of [[withMojTexts]]'s text expression. */
  def sqlMojText: String =
    s"(text || [${MojTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 4 AS INT) + 1])"

  /** The corpus-wide MinHash→band→verify near-dup chain shared by the
    * `dedup_near_minhash` and `split_leakage` oracles: md5-quad signature
    * components (64 hashes, 16 bands of 4), banded candidates, exact
    * Jaccard verify in `jp`. Pre-stripped (no margin bars) so it
    * interpolates into stripMargin templates untouched. */
  def sqlNearDupPairCtes: String =
    """tk AS (
      |  SELECT doc_id,
      |    list_sort(list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))) AS toks
      |  FROM documents),
      |t AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
      |comp AS (
      |  SELECT tt.doc_id, kk.k AS k,
      |    MIN(CAST(('0x' || substring(md5(tt.tok || ':' || CAST(kk.k // 4 AS VARCHAR)),
      |                        CAST(1 + 8 * (kk.k % 4) AS INTEGER), 8))::UBIGINT AS BIGINT)) AS s
      |  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM t) tt
      |  CROSS JOIN (SELECT UNNEST(range(0, 64)) AS k) kk
      |  GROUP BY 1, 2),
      |sig AS (SELECT doc_id, list(s ORDER BY k) AS sg FROM comp GROUP BY 1),
      |band AS (
      |  SELECT doc_id, bb.b AS band,
      |    CAST(sg[bb.b*4+1] AS VARCHAR) || ',' || CAST(sg[bb.b*4+2] AS VARCHAR) || ',' ||
      |    CAST(sg[bb.b*4+3] AS VARCHAR) || ',' || CAST(sg[bb.b*4+4] AS VARCHAR) AS bkey
      |  FROM sig CROSS JOIN (SELECT UNNEST(range(0, 16)) AS b) bb),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      |  FROM band a JOIN band c ON a.band = c.band AND a.bkey = c.bkey
      |    AND a.doc_id < c.doc_id),
      |jp AS (
      |  SELECT cand.id_a, cand.id_b,
      |    round(len(list_filter(x.toks, e -> list_contains(y.toks, e)))::DOUBLE /
      |          nullif(len(list_distinct(x.toks || y.toks)), 0)::DOUBLE, 4) AS jaccard
      |  FROM cand JOIN t x ON cand.id_a = x.doc_id JOIN t y ON cand.id_b = y.doc_id)""".stripMargin

  /** Bad-word suffixes planted by doc id for `c4_badwords`: one listed
    * word, two substring TRAPS (listed words inside larger tokens —
    * must not match), a two-hit page, and a clean tail. */
  val BadWordTextSuffixes: Seq[String] = Seq(
    "",
    " buy viagra online today",
    " the sextonbury parish xxxl archive",
    " live xxx casino stream tonight",
    " plain family picnic notes")

  def withBadWordTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(BadWordTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withBadWordTexts]]'s text expression. */
  def sqlBadWordText: String =
    s"(text || [${BadWordTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Damage suffixes planted by doc id for `encoding_hygiene`:
    * replacement characters, stray C0 controls, mojibake markers (from
    * the repair table), and a clean ASCII tail. */
  val HygieneTextSuffixes: Seq[String] = Seq(
    "",
    " bad �� bytes",
    " ctl\u0001\u0002\u0007x",
    s" marker ${graft.text.Encoding.moj("é")}${graft.text.Encoding.moj("è")} twice",
    " plain ascii tail")

  def withHygieneTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(HygieneTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withHygieneTexts]]'s text expression. */
  def sqlHygieneText: String =
    s"(text || [${HygieneTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Funnel thresholds tuned to the synthetic corpus: the word-count
    * floor discriminates (doc lengths straddle 40) while the stop-hits
    * rule is relaxed to 1 ('the' is the only required word the word-soup
    * generator emits). */
  val FunnelThresholds =
    graft.text.GopherRules.Thresholds(minWords = 40L, minStopHits = 1L)

  /** Repetition cuts tuned to the synthetic corpus (Gopher's published
    * cuts drop nothing that survives the rule gate here — small-vocab
    * word soup repeats bigrams mildly, never line/paragraph-wise): the
    * tightened top-2-gram and dup-5-gram fractions make stage 3c a REAL
    * filter at sf0.01, so the `corpus_pipeline_full` hash-match checks
    * discrimination, not just wiring. */
  val RepetitionThresholds =
    graft.text.GopherRepetition.Thresholds(maxTop2Frac = 0.12,
      maxDup5Frac = 0.10)

  /** Gopher rule cuts for the FineWeb fixture pages (short multi-line
    * prose): the word floor drops to 20 so a 3-line page can pass while
    * doc 6's 15-word page still fails, and one stop hit suffices. */
  val FineWebRuleThresholds =
    graft.text.GopherRules.Thresholds(minWords = 20L, minStopHits = 1L)

  /** Render an inline fixture as a DuckDB VALUES relation aliased
    * t(doc_id, text). Newlines become `chr(10)` concats so the emitted
    * SQL stays single-escaped through the JSON dump. */
  def valuesRel(docs: Seq[(Long, String)]): String = {
    val rows = docs.map { case (id, t) =>
      s"($id, '${t.replace("'", "''").replace("\n", "' || chr(10) || '")}')"
    }.mkString(",\n          ")
    s"(VALUES\n          $rows) t(doc_id, text)"
  }
}
