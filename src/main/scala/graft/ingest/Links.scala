package graft.ingest

import graft.Mat.Pinnable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Hyperlink extraction and the host-level web graph
  * (`host_link_graph` / `anchor_texts` / `web_trustrank` queries) — the
  * reference follows ONE link per article block (crawl.py:67-73,
  * `block.find('a')['href']` + `urljoin`); at corpus scale the links are
  * themselves a first-class dataset: the web graph feeds crawl
  * prioritization ([[Frontier]]), spam detection (TrustRank over real
  * edges instead of a fixture graph), and anchor text is the classic
  * off-page relevance signal (the terms OTHER sites use to describe a
  * page).
  *
  * Everything here is pure scan-stage column expressions —
  * `regexp_extract_all` + HOF `transform` over the matches, then the
  * shared RFC-3986-subset resolver — so extraction runs where the HTML
  * bytes are, mirrors 1:1 into the DuckDB oracle, and never leaves
  * whole-stage-friendly territory (no UDF, no parser object).
  *
  * Extraction contract: only well-formed `<a …>…</a>` pairs count (an
  * unclosed anchor is dropped — the regex needs the closing tag), the
  * href is read from the OPENING tag only (an `href="…"` inside the
  * anchor text cannot shadow it), and double- then single-quoted
  * attribute forms are recognized. Unquoted hrefs are out of contract
  * (documented; real-world HTML carries them at the ~1% level and a
  * production deployment widens the regex, not the operator shape).
  *
  * Resolution contract ([[resolve]] — the subset a link GRAPH needs):
  * absolute http(s) passes through; other schemes (`javascript:`,
  * `mailto:`, `tel:` …) drop; scheme-relative `//host/x` takes the
  * base's scheme; root-relative `/x` takes the base's origin;
  * path-relative `x` resolves against the base path's directory.
  * Fragment-only, query-only, and empty hrefs drop — at host
  * granularity they are self-loops, which the graph drops anyway.
  * Root- and path-relative resolution removes dot segments with
  * CPython-urljoin semantics (r11, [[removeDotSegments]]), so dst_url
  * is safe to consume at URL granularity (frontier seeds, recrawl
  * keys) — the same target never surfaces under `/dir/../x` spellings.
  */
object Links {

  /** Well-formed anchor elements, lazily matched to the FIRST closing
    * tag (nested `<a>` cannot occur in valid HTML). */
  private[graft] val AnchorRe = "(?is)<a\\b[^>]*>.*?</a>"
  private[graft] val OpenTagRe = "(?is)^(<a\\b[^>]*>)"
  // The attribute name needs a LEFT boundary (whitespace or a quote —
  // never regex lookbehind, which RE2 lacks): without it `data-href`,
  // `ng-href`, and `xlink:href` would fabricate links for anchors that
  // carry no real href.
  private[graft] val HrefDqRe = "(?is)[\\s\"']href\\s*=\\s*\"([^\"]*)\""
  private[graft] val HrefSqRe = "(?is)[\\s\"']href\\s*=\\s*'([^']*)'"
  private[graft] val InnerRe = "(?is)^<a\\b[^>]*>(.*)</a>$"
  private[graft] val SchemeAnyRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:"
  private[graft] val HttpAbsRe = "(?i)^https?://"
  private[graft] val OriginRe = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
  private[graft] val BaseSchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** All anchors of `html` in document order, as an array of
    * (href, atext) structs. href = the opening tag's attribute
    * (double-quoted form wins when both somehow appear); atext = inner
    * HTML with tags stripped, trimmed. Anchors without an href (or with
    * an empty one — indistinguishable from absent through the regex, and
    * equally useless to a graph) keep a '' href here and drop at
    * resolution. */
  def anchors(html: Column): Column =
    transform(regexp_extract_all(html, lit(AnchorRe), lit(0)), { m =>
      val open = regexp_extract(m, OpenTagRe, 1)
      val dq = regexp_extract(open, HrefDqRe, 1)
      val sq = regexp_extract(open, HrefSqRe, 1)
      val href = when(dq =!= "", dq).otherwise(sq)
      val atext = trim(regexp_replace(
        regexp_extract(m, InnerRe, 1), "<[^>]*>", ""))
      struct(href.as("href"), atext.as("atext"))
    })

  /** Dot-segment removal over a path expression, byte-matched to
    * CPython's `urljoin` fold (the reference's resolver — probed on
    * 3.11, urllib/parse.py): segments fold left-to-right with `.`
    * skipped and `..` popping the previous segment (pops past the root
    * are silently ignored — excess `..` never survives, unlike
    * `java.net.URI`); a trailing `.`/`..` leaves a trailing slash.
    * The accumulator is the joined-path STRING (pop = drop the last
    * `/segment`), which collapses urljoin's `[]` vs `['']` states —
    * they differ only in a missing leading slash that urlunparse
    * re-adds, so the string form is observationally identical. */
  private[graft] def removeDotSegments(path: Column): Column = {
    val padded = when(path.rlike("/\\.\\.?$"), concat(path, lit("/")))
      .otherwise(path)
    val segs = split(padded, "/", -1)
    // skip segs(0): paths here always start with '/', so the first
    // element is the empty root marker the accumulator's "" encodes.
    val folded = aggregate(
      slice(segs, lit(2), greatest(size(segs) - 1, lit(0))), lit(""),
      (acc, seg) =>
        when(seg === ".", acc)
          .when(seg === "..", regexp_replace(acc, "(^|/)[^/]*$", ""))
          .otherwise(concat(acc, lit("/"), seg)))
    when(folded === "", lit("/")).otherwise(folded)
  }

  /** RFC-3986-subset resolution of `href` against `base` (see the object
    * doc for the contract). Null where the link has no place in a graph:
    * non-http(s) schemes, fragment/query-only, empty, or a base without
    * an origin to resolve against.
    *
    * Dot segments (r10 advice): root- and path-relative hrefs get
    * [[removeDotSegments]] over the merged path, so `../x` against
    * `http://h/dir/page` resolves to `http://h/x`-style canonical forms
    * instead of surfacing `/dir/../x` spellings — matching the
    * reference's urljoin, including its quirks: absolute and
    * protocol-relative hrefs pass through UNnormalized, and the
    * path-relative merge (only) collapses inner empty segments
    * (`/a//b/` + `../c` → `/a/c`). The query/fragment tail rides along
    * untouched (a `/` inside `?q=/a/../b` is data, not a path). */
  def resolve(base: Column, href: Column): Column = {
    val h = trim(href)
    val origin = regexp_extract(base, OriginRe, 1)
    val scheme = lower(regexp_extract(base, BaseSchemeRe, 1))
    val dir0 = regexp_replace(regexp_extract(base, Urls.PathRe, 1), "[^/]*$", "")
    val dir = when(dir0 === "", "/").otherwise(dir0)
    val hpath = regexp_extract(h, "^[^?#]*", 0)
    val hsuffix = h.substr(length(hpath) + 1, length(h))
    val merged = regexp_replace(concat(dir, hpath), "/{2,}", "/")
    when(h.rlike(HttpAbsRe), h)
      .when(h.rlike(SchemeAnyRe), lit(null).cast("string"))
      .when(origin === "", lit(null).cast("string"))
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"),
        concat(origin, removeDotSegments(hpath), hsuffix))
      .when(h === "" || h.startsWith("#") || h.startsWith("?"),
        lit(null).cast("string"))
      .otherwise(concat(origin, removeDotSegments(merged), hsuffix))
  }

  /** One row per resolvable link: (idCol, src_url, dst_url, atext).
    * Multi-links are kept (multiplicity is graph signal); order within a
    * page follows document order. */
  def resolvedLinks(docs: DataFrame, idCol: String = "doc_id",
                    urlCol: String = "url",
                    htmlCol: String = "html"): DataFrame =
    docs
      .select(col(idCol), col(urlCol).as("src_url"),
        explode(anchors(col(htmlCol))).as("a"))
      .select(col(idCol), col("src_url"),
        resolve(col("src_url"), col("a.href")).as("dst_url"),
        col("a.atext").as("atext"))
      .filter(col("dst_url").isNotNull)

  /** The host-level web graph: (src_domain, dst_domain, n_links) with
    * both endpoints collapsed to their registered domain ([[Psl]]-backed
    * eTLD+1 — the granularity crawl policy and TrustRank operate at),
    * self-loops dropped (intra-site navigation is noise to an
    * inter-site graph). Shape: scan-stage extraction + ONE aggregate on
    * the (src_domain, dst_domain) key — the explode multiplies rows by
    * links-per-page (bounded by page size), never by corpus size. */
  def hostGraph(docs: DataFrame, idCol: String = "doc_id",
                urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    val links = resolvedLinks(graft.Par.widen(docs), idCol, urlCol, htmlCol)
      .select(Urls.registeredDomain(col("src_url")).as("src_domain"),
        Urls.registeredDomain(col("dst_url")).as("dst_domain"))
      .filter(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
    links.groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
      .orderBy(col("src_domain"), col("dst_domain"))
  }

  /** Anchor-term profile per TARGET domain: the top-`k` tokens other
    * pages use in links pointing at each registered domain — the
    * off-page description signal (search ranking, site categorization,
    * spam-anchor detection). Cross-domain links only (a site's own
    * navigation describes its structure, not its reputation). One
    * aggregate on (domain, token) + one top-k window per domain. */
  def anchorTerms(docs: DataFrame, idCol: String = "doc_id",
                  urlCol: String = "url", htmlCol: String = "html",
                  k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = resolvedLinks(graft.Par.widen(docs), idCol, urlCol, htmlCol)
      .select(Urls.registeredDomain(col("src_url")).as("src_domain"),
        Urls.registeredDomain(col("dst_url")).as("dst_domain"),
        col("atext"))
      .filter(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
      .select(col("dst_domain").as("domain"),
        explode(graft.text.TextAnalysis.tokens(lower(col("atext")))).as("token"))
    terms.groupBy(col("domain"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("domain"))
        .orderBy(col("n").desc, col("token").asc)))
      .filter(col("rk") <= k)
      .orderBy(col("domain"), col("rk"))
  }

  // ------------------------------------------------- canonical links

  private[graft] val LinkTagRe = "(?is)<link\\b[^>]*>"
  private[graft] val RelDqRe = "(?is)[\\s\"']rel\\s*=\\s*\"([^\"]*)\""
  private[graft] val RelSqRe = "(?is)[\\s\"']rel\\s*=\\s*'([^']*)'"

  /** The page's `<link rel="canonical">` href, or null when the head
    * declares none. Attribute order-free (rel before or after href),
    * both quote styles, FIRST canonical tag wins (the de-facto rule —
    * one canonical per page; extra declarations are author error and
    * search engines read the first). `rel` is an HTML TOKEN LIST:
    * the value splits on whitespace and `canonical` matches as a token
    * (r12 widening — `rel="canonical alternate"` qualifies; the exact
    * match that preceded it missed list-valued rels). */
  def canonicalHref(html: Column): Column = {
    val tags = regexp_extract_all(html, lit(LinkTagRe), lit(0))
    def hasTok(rel: Column): Column =
      array_contains(split(lower(rel), "\\s+"), "canonical")
    val canon = filter(tags, t =>
      hasTok(regexp_extract(t, RelDqRe, 1)) ||
        hasTok(regexp_extract(t, RelSqRe, 1)))
    val tag = get(canon, lit(0))
    val dq = regexp_extract(tag, HrefDqRe, 1)
    val sq = regexp_extract(tag, HrefSqRe, 1)
    nullif(when(dq =!= "", dq).otherwise(sq), lit(""))
  }

  /** [EXT] Canonical-link deduplication (`canonical_link_dedup` query) —
    * the crawl-side URL-level dedup channel the reference's single-page
    * fetches never face but any corpus crawl does: the SAME article is
    * reachable as `?utm_campaign=…` variants, mobile mirrors, and
    * syndication copies, and the page itself declares its canonical URL
    * in the head. Pages cluster by their declared canonical target
    * (resolved against the page URL — [[resolve]]'s dot-segment/
    * relative machinery at URL granularity, which is why r11's
    * normalization matters here — then [[Urls.canonicalize]]d so two
    * spellings of the target are one cluster); a page without a
    * canonical declaration is its own cluster under its own
    * canonicalized URL. Keeper election per cluster: the page whose own
    * canonicalized URL IS the target (the self-canonical original) wins,
    * else lowest doc id — `COALESCE(MIN(CASE self…), MIN(id))`, one
    * aggregate, engine-portable.
    *
    * Output (doc_id, url, canonical_url, keeper_doc_id, is_keeper) —
    * the [[Urls]] `canonical_url_dedup` shape lifted from URL-string
    * dedup to DECLARED-canonical dedup. Scale: scan-stage extraction +
    * one exchange on the canonical key + a broadcast-sized keeper
    * join (clusters are variant families, keeper table ≈ |clusters|). */
  def canonicalDedup(docs: DataFrame, idCol: String = "doc_id",
                     urlCol: String = "url",
                     htmlCol: String = "html"): DataFrame = {
    // pinned: base feeds BOTH the keeper election and the labeling
    // join — unpinned, CollapseProject re-expands the resolver (the
    // dot-segment fold + three canonicalize trees, all interpreted
    // HOF territory) into every branch (the warc_refinedweb diamond;
    // measured 55 s → ~2 s at sf0.1 with the pin)
    val base = canonicalBase(docs, idCol, urlCol, htmlCol).pinned
    base.join(electKeepers(base), Seq("canonical_url"))
      .select(col("doc_id"), col("url"), col("canonical_url"),
        col("keeper_doc_id"),
        (col("doc_id") === col("keeper_doc_id")).cast("int").as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, url, canonical_url, __is_self) — the shared extraction/
    * resolution/canonicalization half of the one-shot and incremental
    * faces. */
  private def canonicalBase(docs: DataFrame, idCol: String,
                            urlCol: String, htmlCol: String): DataFrame =
    // STAGED selects, one heavy tree per stage: the resolver and the
    // canonicalize trees are interpreted-HOF territory (no codegen, no
    // subexpression elimination), so building everything in one select
    // evaluates the canonicalize(url) tree twice per row and re-inlines
    // the resolver into every consumer. Staging leaves each stage's
    // output as a plain attribute — CollapseProject keeps multi-use
    // non-cheap aliases staged, so each value computes ONCE per row.
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"), col(urlCol).as("url"),
        canonicalHref(col(htmlCol)).as("__href"))
      .select(col("doc_id"), col("url"),
        resolve(col("url"), col("__href")).as("__resolved"))
      .select(col("doc_id"), col("url"),
        Urls.canonicalize(col("__resolved")).as("__cr"),
        Urls.canonicalize(col("url")).as("__self"))
      // null-key guard (r12): a row whose own URL is null/uncanonicalizable
      // would otherwise carry a NULL cluster key and silently vanish in the
      // keeper equi-join — out-of-contract rows surface as their own
      // single-doc clusters under a per-doc sentinel instead.
      .select(col("doc_id"), col("url"),
        coalesce(col("__cr"), col("__self"),
          concat(lit("urn:graft:null-url:"), col("doc_id"))).as("canonical_url"),
        col("__self"))
      .withColumn("__is_self",
        coalesce((col("__self") === col("canonical_url")).cast("int"), lit(0)))

  private def electKeepers(base: DataFrame): DataFrame =
    base.groupBy(col("canonical_url"))
      .agg(coalesce(
        min(when(col("__is_self") === 1, col("doc_id"))),
        min(col("doc_id"))).as("keeper_doc_id"))

  /** Per-batch keeper STATE for the incremental face:
    * (canonical_url, inv_self, keeper_doc_id) where (inv_self,
    * keeper_doc_id) is the cluster's election argmin — kept as columns
    * so merging is another MIN over the same struct, which makes the
    * state MERGEABLE: `mergeCanonicalState(state(A) ∪ state(B)) ==
    * state(A ∪ B)` (min associativity; spec-pinned), the property any
    * batch-keyed streaming face needs. */
  def canonicalKeeperState(docs: DataFrame, idCol: String = "doc_id",
                           urlCol: String = "url",
                           htmlCol: String = "html"): DataFrame =
    canonicalBase(docs, idCol, urlCol, htmlCol)
      .groupBy(col("canonical_url"))
      .agg(min(struct((lit(1) - col("__is_self")).as("inv_self"),
        col("doc_id").as("keeper_doc_id"))).as("k"))
      .select(col("canonical_url"), col("k.inv_self").as("inv_self"),
        col("k.keeper_doc_id").as("keeper_doc_id"))

  /** Merge per-batch keeper states (one MIN-struct aggregate). */
  def mergeCanonicalState(parts: DataFrame): DataFrame =
    parts.groupBy(col("canonical_url"))
      .agg(min(struct(col("inv_self"), col("keeper_doc_id"))).as("k"))
      .select(col("canonical_url"), col("k.inv_self").as("inv_self"),
        col("k.keeper_doc_id").as("keeper_doc_id"))

  /** [EXT] Incremental canonical dedup
    * (`canonical_link_dedup_incremental` query) — the index discipline
    * every incremental dedup face in this repo follows: HISTORY KEEPERS
    * ARE IMMUTABLE. A batch page whose cluster already has a keeper in
    * `state` labels against it — even a late-arriving self-canonical
    * original does NOT re-point the cluster (re-electing would rewrite
    * shipped history; the one-shot face is the reconciliation tool).
    * Clusters new to the batch elect within it (the one-shot rule).
    * Shape: the batch's base scan + one batch-keyed election + a
    * state join — O(batch), never history². */
  def canonicalDedupIncremental(batch: DataFrame, state: DataFrame,
                                idCol: String = "doc_id",
                                urlCol: String = "url",
                                htmlCol: String = "html"): DataFrame = {
    val base = canonicalBase(batch, idCol, urlCol, htmlCol).pinned
    val hist = state.select(col("canonical_url"),
      col("keeper_doc_id").as("__hist_keeper"))
    base.join(electKeepers(base)
        .withColumnRenamed("keeper_doc_id", "__batch_keeper"),
        Seq("canonical_url"))
      .join(hist, Seq("canonical_url"), "left")
      .withColumn("keeper_doc_id",
        coalesce(col("__hist_keeper"), col("__batch_keeper")))
      .select(col("doc_id"), col("url"), col("canonical_url"),
        col("keeper_doc_id"),
        (col("doc_id") === col("keeper_doc_id")).cast("int").as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** The extraction→resolution→canonicalization half of
    * [[sqlCanonicalDedup]] as a CTE chain ending in
    * `<out>(doc_id, url, canonical_url, is_self)` — composable by the
    * one-shot and incremental oracles (the [[Sitemap.sqlEntriesCtes]]
    * discipline: produce the chain, never splice strings). */
  def sqlCanonicalCtes(from: String, out: String): String = {
    val dq = HrefDqRe.replace("'", "''")
    val sq = HrefSqRe.replace("'", "''")
    val relDq = RelDqRe.replace("'", "''")
    val relSq = RelSqRe.replace("'", "''")
    s"""${out}_l AS (
       |  SELECT doc_id, url,
       |    list_filter(regexp_extract_all(html, '$LinkTagRe'),
       |      t -> list_contains(string_split_regex(
       |             lower(regexp_extract(t, '$relDq', 1)), '\\s+'), 'canonical')
       |        OR list_contains(string_split_regex(
       |             lower(regexp_extract(t, '$relSq', 1)), '\\s+'), 'canonical')) AS tags
       |  FROM $from),
       |${out}_h AS (
       |  SELECT doc_id, url,
       |    NULLIF(CASE WHEN len(tags) >= 1 THEN
       |      CASE WHEN regexp_extract(tags[1], '$dq', 1) <> ''
       |           THEN regexp_extract(tags[1], '$dq', 1)
       |           ELSE regexp_extract(tags[1], '$sq', 1) END END, '') AS href
       |  FROM ${out}_l),
       |${out}_q AS (
       |  SELECT doc_id, url, trim(href) AS h,
       |    regexp_extract(trim(href), '^[^?#]*') AS hpath,
       |    substring(trim(href), length(regexp_extract(trim(href), '^[^?#]*')) + 1) AS hsuffix,
       |    regexp_extract(url, '$OriginRe', 1) AS origin,
       |    lower(regexp_extract(url, '$BaseSchemeRe', 1)) AS bscheme,
       |    CASE WHEN regexp_replace(regexp_extract(url, '${Urls.PathRe}', 1),
       |                             '[^/]*$$', '') = '' THEN '/'
       |         ELSE regexp_replace(regexp_extract(url, '${Urls.PathRe}', 1),
       |                             '[^/]*$$', '') END AS dir
       |  FROM ${out}_h),
       |${out}_r AS (
       |  SELECT doc_id, url,
       |    ${sqlResolveExpr("h", "hpath", "hsuffix",
                             "origin", "bscheme", "dir")} AS resolved
       |  FROM ${out}_q),
       |$out AS (
       |  SELECT doc_id, url,
       |    COALESCE(${Urls.sqlCanonicalize("resolved")},
       |             ${Urls.sqlCanonicalize("url")},
       |             'urn:graft:null-url:' || doc_id) AS canonical_url,
       |    CASE WHEN ${Urls.sqlCanonicalize("url")} =
       |      COALESCE(${Urls.sqlCanonicalize("resolved")},
       |               ${Urls.sqlCanonicalize("url")},
       |               'urn:graft:null-url:' || doc_id) THEN 1 ELSE 0 END AS is_self
       |  FROM ${out}_r)""".stripMargin
  }

  /** [[canonicalDedup]] as a DuckDB CTE chain + final SELECT over a
    * relation exposing (doc_id, url, html). */
  def sqlCanonicalDedup(from: String): String =
    s"""${sqlCanonicalCtes(from, "cd_c")},
       |cd_k AS (
       |  SELECT canonical_url,
       |    COALESCE(MIN(CASE WHEN is_self = 1 THEN doc_id END),
       |             MIN(doc_id)) AS keeper_doc_id
       |  FROM cd_c GROUP BY canonical_url)
       |SELECT c.doc_id, c.url, c.canonical_url, k.keeper_doc_id,
       |  CAST(c.doc_id = k.keeper_doc_id AS INT) AS is_keeper
       |FROM cd_c c JOIN cd_k k USING (canonical_url)
       |ORDER BY c.doc_id""".stripMargin

  /** [[canonicalDedupIncremental]] as one DuckDB query: the shared
    * chain runs once over history (state election only) and once over
    * the batch; the final labeling coalesces history keepers first —
    * the immutability rule, stated relationally. */
  def sqlCanonicalDedupIncremental(histFrom: String,
                                   batchFrom: String): String =
    s"""${sqlCanonicalCtes(histFrom, "ci_h")},
       |${sqlCanonicalCtes(batchFrom, "ci_b")},
       |ci_hk AS (
       |  SELECT canonical_url,
       |    COALESCE(MIN(CASE WHEN is_self = 1 THEN doc_id END),
       |             MIN(doc_id)) AS hist_keeper
       |  FROM ci_h GROUP BY canonical_url),
       |ci_bk AS (
       |  SELECT canonical_url,
       |    COALESCE(MIN(CASE WHEN is_self = 1 THEN doc_id END),
       |             MIN(doc_id)) AS batch_keeper
       |  FROM ci_b GROUP BY canonical_url)
       |SELECT b.doc_id, b.url, b.canonical_url,
       |  COALESCE(h.hist_keeper, k.batch_keeper) AS keeper_doc_id,
       |  CAST(b.doc_id = COALESCE(h.hist_keeper, k.batch_keeper) AS INT)
       |    AS is_keeper
       |FROM ci_b b
       |LEFT JOIN ci_hk h USING (canonical_url)
       |JOIN ci_bk k USING (canonical_url)
       |ORDER BY b.doc_id""".stripMargin

  /** Merge per-batch [[hostGraph]] partials into the corpus graph: edge
    * counts are ADDITIVE, so the merged graph of any partition of the
    * corpus equals the one-shot graph — the property the streaming face
    * ([[graft.streaming.StreamingIngest.linkGraphViaBatchParts]]) and
    * any incremental ingest rely on. One (src, dst)-keyed aggregate
    * over edge rows (never documents). */
  def mergeEdges(parts: DataFrame): DataFrame =
    parts.groupBy(col("src_domain"), col("dst_domain"))
      .agg(sum(col("n_links")).as("n_links"))
      .orderBy(col("src_domain"), col("dst_domain"))

  /** Stable 60-bit domain id for the integer rank core (md5-prefix —
    * order-free, engine-reproducible, collision odds ~n²∕2⁶¹). */
  private def domId(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Shared graph lift for the TrustRank faces: the extracted host
    * graph's (edges in id space, id↔domain map). Multi-edges collapse
    * inside the core's adjacency build; the edge WEIGHTS are
    * [[hostGraph]]'s to publish, not the rank's to consume (classic
    * TrustRank is unweighted). */
  private def trustGraph(docs: DataFrame, idCol: String, urlCol: String,
                         htmlCol: String): (DataFrame, DataFrame) =
    trustGraphFromHost(hostGraph(docs, idCol, urlCol, htmlCol))

  /** The same graph lift over an ALREADY-EXTRACTED host graph — the
    * seam the incremental faces enter through: a maintained
    * `(src_domain, dst_domain, n_links)` state ([[mergeEdges]] over
    * per-batch [[hostGraph]] partials) is a valid input wherever a
    * fresh extraction is, because edge counts are additive and the rank
    * cores consume the UNWEIGHTED edge set. */
  private def trustGraphFromHost(g0: DataFrame): (DataFrame, DataFrame) = {
    val g = g0.pinned
    val ids = g.select(col("src_domain").as("domain"))
      .union(g.select(col("dst_domain")))
      .distinct()
      .select(col("domain"), domId(col("domain")).as("node"))
    val edges = g.select(domId(col("src_domain")).as("src"),
      domId(col("dst_domain")).as("dst"))
    (edges, ids)
  }

  /** TrustRank over the EXTRACTED host graph — the composition the
    * fixture-graph operator ([[graft.analytics.PageRank.seededRanks]])
    * exists for: trust seeded at curated domains flows along real
    * hyperlinks; domains unreachable from any seed rank 0 (the spam
    * side of the ledger).
    *
    * PRODUCTION DEFAULT (r14, the r13 verdict's #2): tolerance-stopped —
    * the seeded chain iterates until its L1 residual Σ|r_k − r_{k−1}|
    * drops below `tolFp`, then ships; `maxIterations` is a safety rail,
    * not the expected round count. The defaults come from the measured
    * convergence curves (F130/F135-F137): 10⁶ fp units = one millionth
    * of the total trust mass, the family-wide tolerance every earlystop
    * oracle pins; seeded chains concentrate fast, so the data-dependent
    * stop saves whole |E|-shuffle rounds wherever the graph dwarfs the
    * node-vector bookkeeping. Output (domain, trust_fp, stop_round) —
    * the vector is BIT-identical to [[webTrustRankFixed]] at
    * `iterations = stop_round` (the shared-round-body contract,
    * LinksSpec-pinned). Fixed-round twin for oracle chains:
    * [[webTrustRankFixed]]. */
  def webTrustRankUntil(docs: DataFrame, seeds: Seq[String],
                   idCol: String = "doc_id", urlCol: String = "url",
                   htmlCol: String = "html", tolFp: Long = 1000000L,
                   maxIterations: Int = 50,
                   dampingPct: Int = 85): DataFrame = {
    require(seeds.nonEmpty, "TrustRank needs a trusted seed set")
    val spark = docs.sparkSession
    import spark.implicits._
    val (edges, ids) = trustGraph(docs, idCol, urlCol, htmlCol)
    val (ranks, stop) = graft.analytics.PageRank.seededRanksUntil(
      edges, "src", "dst",
      seeds.toDF("domain").select(domId(col("domain")).as("seed")),
      "seed", tolFp, maxIterations, dampingPct)
    ranks.join(ids, Seq("node"))
      .select(col("domain"), col("rank_fp").as("trust_fp"),
        lit(stop.toLong).as("stop_round"))
      .orderBy(col("domain"))
  }

  /** [EXT] Web spam mass (r14): the Gyöngyi et al. 2006 anti-spam
    * triple on the EXTRACTED host graph — open PageRank vs seeded
    * TrustRank vs spam-mass ppm, with BOTH chains tolerance-stopped on
    * their own residual curves
    * ([[graft.analytics.PageRank.spamMassUntil]], the production
    * default face) and domains lifted back through the id map. This is
    * the composition the fixture-graph `trust_propagation` queries
    * rehearse, on real extracted hyperlink edges: a domain whose
    * PageRank is unaccounted for by trust flowing from the curated
    * seeds is the spam signal. Output (domain, pr_fp, tr_fp,
    * spam_mass_ppm, pr_stop, tr_stop), ordered by domain. Oracle:
    * [[sqlWebSpamMassEarlyStop]] with the SAME (tolFp, maxIterations)
    * pinned on both sides. */
  def webSpamMass(docs: DataFrame, seeds: Seq[String],
                  idCol: String = "doc_id", urlCol: String = "url",
                  htmlCol: String = "html", tolFp: Long = 1000000L,
                  maxIterations: Int = 50,
                  dampingPct: Int = 85): DataFrame =
    webSpamMassFromHostGraph(hostGraph(docs, idCol, urlCol, htmlCol),
      seeds, tolFp, maxIterations, dampingPct)

  /** [EXT] The INCREMENTAL spam-mass face (r15, the r14 verdict's #7):
    * the same Gyöngyi triple over a MAINTAINED host-graph state instead
    * of a fresh per-run extraction. At 100 TB the extraction (HTML
    * regex + URL resolution + PSL collapse over every page) dwarfs the
    * rank iterations; F106 already maintains the graph incrementally
    * ([[mergeEdges]] over per-batch [[hostGraph]] partials, edge counts
    * additive), so the anti-spam pipeline should read that state, not
    * re-crawl the corpus. Because the rank cores consume the unweighted
    * edge SET and merged counts never invent or drop an edge,
    * spam mass over the maintained state is BIT-equal to the full
    * recompute — the incremental == batch discipline, and exactly what
    * the `web_spam_mass_incremental` oracle (the one-shot
    * [[sqlWebSpamMassEarlyStop]]) checks. */
  def webSpamMassFromHostGraph(hostGraph: DataFrame, seeds: Seq[String],
                               tolFp: Long = 1000000L,
                               maxIterations: Int = 50,
                               dampingPct: Int = 85): DataFrame = {
    require(seeds.nonEmpty, "spam mass needs a trusted seed set")
    val spark = hostGraph.sparkSession
    import spark.implicits._
    val (edges, ids) = trustGraphFromHost(hostGraph)
    graft.analytics.PageRank.spamMassUntil(edges, "src", "dst",
        seeds.toDF("domain").select(domId(col("domain")).as("seed")),
        "seed", tolFp, maxIterations, dampingPct)
      .join(ids, Seq("node"))
      .select(col("domain"), col("pr_fp"), col("tr_fp"),
        col("spam_mass_ppm"), col("pr_stop"), col("tr_stop"))
      .orderBy(col("domain"))
  }

  /** [EXT] Host communities (r14): label propagation over the
    * extracted host graph — the [[webTrustRankUntil]] composition for the
    * LABEL family, closing the production-default story across both
    * web-scale graph faces. The directed link graph is SYMMETRIZED
    * first (a link either way is co-membership evidence for community
    * detection; LPA on the raw directed graph would leave link-sink
    * domains voteless), then [[graft.analytics.Lpa.labelPropagationUntil]]
    * runs with LPA's natural stop (churn = 0) under a round rail —
    * the production default, like [[webTrustRankUntil]]'s tolerance stop.
    * Labels lift back through the id map (every label IS some node's
    * id — labels start as own-id and elections only ever pick existing
    * labels), so the output names each domain's community by its
    * representative DOMAIN: (domain, community_domain, stop_round),
    * ordered by domain. Oracle: [[sqlHostCommunitiesEarlyStop]] with
    * the SAME (maxChurn, maxRounds) pinned on both sides. */
  def hostCommunities(docs: DataFrame, idCol: String = "doc_id",
                      urlCol: String = "url", htmlCol: String = "html",
                      maxChurn: Long = 0L,
                      maxRounds: Int = 50): DataFrame =
    hostCommunitiesFromHostGraph(hostGraph(docs, idCol, urlCol, htmlCol),
      maxChurn, maxRounds)

  /** [EXT] The INCREMENTAL communities face (r15): LPA over a
    * MAINTAINED host-graph state — the [[webSpamMassFromHostGraph]]
    * seam for the label family. Same argument: at 100 TB the per-page
    * extraction dwarfs the vote rounds, and F106's merged edge state is
    * a lossless stand-in for a fresh extraction because the vote core
    * consumes the (symmetrized) edge SET. Oracle: the one-shot chain
    * (`host_communities_incremental` == `host_communities_earlystop`
    * recomputed from raw HTML). */
  def hostCommunitiesFromHostGraph(hostGraph: DataFrame,
                                   maxChurn: Long = 0L,
                                   maxRounds: Int = 50): DataFrame = {
    val (edges, ids) = trustGraphFromHost(hostGraph)
    val sym = edges.union(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val (labels, stop) = graft.analytics.Lpa.labelPropagationUntil(
      sym, "src", "dst", maxChurn, maxRounds)
    labels
      .join(ids, Seq("node"))
      .join(ids.select(col("node").as("community"),
        col("domain").as("community_domain")), Seq("community"))
      .select(col("domain"), col("community_domain"),
        lit(stop.toLong).as("stop_round"))
      .orderBy(col("domain"))
  }

  /** Fixed-round twin of [[webTrustRankUntil]] — the cross-engine oracle
    * face (an unrolled SQL chain needs a static round count) and the
    * deterministic-cost choice where a scheduler must know the round
    * budget up front. Same graph lift, same rank core, no stop column. */
  def webTrustRankFixed(docs: DataFrame, seeds: Seq[String],
                        idCol: String = "doc_id", urlCol: String = "url",
                        htmlCol: String = "html", iterations: Int = 5,
                        dampingPct: Int = 85): DataFrame = {
    require(seeds.nonEmpty, "TrustRank needs a trusted seed set")
    val spark = docs.sparkSession
    import spark.implicits._
    val (edges, ids) = trustGraph(docs, idCol, urlCol, htmlCol)
    val ranks = graft.analytics.PageRank.seededRanks(
      edges, "src", "dst",
      seeds.toDF("domain").select(domId(col("domain")).as("seed")),
      "seed", iterations, dampingPct)
    ranks.join(ids, Seq("node"))
      .select(col("domain"), col("rank_fp").as("trust_fp"))
      .orderBy(col("domain"))
  }

  // ---------------------------------------------------------------- SQL

  /** [[removeDotSegments]] as a DuckDB expression over a path-valued
    * SQL expression `p` (same string-accumulator fold, list_prepend
    * seeding the empty accumulator — list_reduce errors on empty
    * lists). */
  def sqlRemoveDotSegments(p: String): String = {
    val padded =
      s"(CASE WHEN regexp_matches($p, '/\\.\\.?$$') THEN $p || '/' ELSE $p END)"
    val fold =
      s"""list_reduce(list_prepend('', (string_split($padded, '/'))[2:]),
         |    (acc, seg) -> CASE WHEN seg = '.' THEN acc
         |      WHEN seg = '..' THEN regexp_replace(acc, '(^|/)[^/]*$$', '')
         |      ELSE acc || '/' || seg END)""".stripMargin
    s"COALESCE(NULLIF($fold, ''), '/')"
  }

  /** The resolution CASE chain over SQL expressions — byte-for-byte the
    * [[resolve]] contract. The caller provides `h` (the TRIMMED href),
    * `hpath`/`hsuffix` (its path / query-fragment split), and the
    * base-derived `origin`/`bscheme`/`dir` as plain column references
    * (see [[sqlLinkCtes]]'s staging) — inlining them all here would
    * repeat the regexp subtrees dozens of times. */
  def sqlResolveExpr(h: String, hpath: String, hsuffix: String,
                     origin: String, bscheme: String,
                     dir: String): String = {
    val merged =
      s"regexp_replace($dir || $hpath, '/{2,}', '/', 'g')"
    s"""CASE
       |  WHEN regexp_matches($h, '$HttpAbsRe') THEN $h
       |  WHEN regexp_matches($h, '$SchemeAnyRe') THEN NULL
       |  WHEN $origin = '' THEN NULL
       |  WHEN starts_with($h, '//') THEN $bscheme || ':' || $h
       |  WHEN starts_with($h, '/')
       |    THEN $origin || ${sqlRemoveDotSegments(hpath)} || $hsuffix
       |  WHEN $h = '' OR starts_with($h, '#') OR starts_with($h, '?') THEN NULL
       |  ELSE $origin || ${sqlRemoveDotSegments(merged)} || $hsuffix
       |END""".stripMargin
  }

  /** CTE chain `<out>`: resolved links (idCol, src_url, dst_url, atext)
    * from a relation exposing (idCol, url, html) — the [[resolvedLinks]]
    * mirror (UNNEST over the same anchor matches, the same nested
    * group extraction, the same resolution CASE). */
  def sqlLinkCtes(from: String, idCol: String, out: String): String = {
    // both patterns carry single quotes (the attribute-boundary class
    // and the quoted-value form) — escape them inside the SQL literals
    val dq = HrefDqRe.replace("'", "''")
    val sq = HrefSqRe.replace("'", "''")
    s"""${out}_m AS (
       |  SELECT $idCol, url AS src_url,
       |    UNNEST(regexp_extract_all(html, '$AnchorRe')) AS m
       |  FROM $from),
       |${out}_h AS (
       |  SELECT $idCol, src_url, m,
       |    regexp_extract(m, '$OpenTagRe', 1) AS opentag
       |  FROM ${out}_m),
       |${out}_p AS (
       |  SELECT $idCol, src_url,
       |    CASE WHEN regexp_extract(opentag, '$dq', 1) <> ''
       |         THEN regexp_extract(opentag, '$dq', 1)
       |         ELSE regexp_extract(opentag, '$sq', 1) END AS href,
       |    trim(regexp_replace(regexp_extract(m, '$InnerRe', 1),
       |      '<[^>]*>', '', 'g')) AS atext
       |  FROM ${out}_h),
       |${out}_t AS (
       |  SELECT $idCol, src_url, trim(href) AS h, atext FROM ${out}_p),
       |${out}_q AS (
       |  SELECT $idCol, src_url, h, atext,
       |    regexp_extract(h, '^[^?#]*') AS hpath,
       |    substring(h, length(regexp_extract(h, '^[^?#]*')) + 1) AS hsuffix,
       |    regexp_extract(src_url, '$OriginRe', 1) AS origin,
       |    lower(regexp_extract(src_url, '$BaseSchemeRe', 1)) AS bscheme,
       |    CASE WHEN regexp_replace(regexp_extract(src_url, '${Urls.PathRe}', 1),
       |                             '[^/]*$$', '') = '' THEN '/'
       |         ELSE regexp_replace(regexp_extract(src_url, '${Urls.PathRe}', 1),
       |                             '[^/]*$$', '') END AS dir
       |  FROM ${out}_t),
       |${out}_r AS (
       |  SELECT $idCol, src_url,
       |    ${sqlResolveExpr("h", "hpath", "hsuffix",
                             "origin", "bscheme", "dir")} AS dst_url, atext
       |  FROM ${out}_q),
       |$out AS (
       |  SELECT $idCol, src_url, dst_url, atext
       |  FROM ${out}_r WHERE dst_url IS NOT NULL)""".stripMargin
  }

  /** [[hostGraph]] as one DuckDB query over a relation exposing
    * (idCol, url, html). Prepend `WITH RECURSIVE ${Psl.sqlPslCte},`. */
  def sqlHostGraph(from: String, idCol: String): String =
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |pairs AS (
       |  SELECT s.domain AS src_domain, d.domain AS dst_domain
       |  FROM sdom s JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain)
       |SELECT src_domain, dst_domain, COUNT(*) AS n_links
       |FROM pairs GROUP BY 1, 2 ORDER BY src_domain, dst_domain""".stripMargin

  /** [[anchorTerms]] as one DuckDB query (same prelude contract as
    * [[sqlHostGraph]]). */
  def sqlAnchorTerms(from: String, idCol: String, k: Int): String =
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url, atext FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |terms AS (
       |  SELECT d.domain AS domain,
       |    UNNEST(regexp_extract_all(lower(l.atext), '[^ \\t\\n\\x0B\\f\\r]+'))
       |      AS token
       |  FROM lks l JOIN sdom s USING (lid) JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain),
       |counted AS (
       |  SELECT domain, token, COUNT(*) AS n FROM terms GROUP BY 1, 2),
       |ranked AS (
       |  SELECT domain, token, n,
       |    ROW_NUMBER() OVER (PARTITION BY domain
       |                       ORDER BY n DESC, token ASC) AS rk
       |  FROM counted)
       |SELECT domain, token, n, rk FROM ranked WHERE rk <= $k
       |ORDER BY domain, rk""".stripMargin

  /** [[webTrustRankUntil]] as one DuckDB query (same prelude contract): the
    * host graph rebuilt relationally, domains lifted to the same
    * md5-prefix ids, then the rank core's unrolled seeded chain with
    * nodes = src ∪ dst (dangling domains keep teleport-only mass — the
    * engine's leak semantics, replayed). */
  def sqlWebTrustRank(from: String, idCol: String, seeds: Seq[String],
                      iterations: Int = 5, dampingPct: Int = 85): String = {
    val scale = graft.analytics.PageRank.Scale
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    val iters = (1 to iterations).map { kk =>
      s"""t$kk AS (
         |  SELECT n.v AS v,
         |    CAST((CASE WHEN s.v IS NOT NULL THEN stp.t ELSE 0 END)
         |         + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM gnodes n CROSS JOIN stp LEFT JOIN gseeds s ON n.v = s.v
         |  LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM ge e JOIN t${kk - 1} r ON e.src = r.v
         |    JOIN gdeg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |gpairs AS (
       |  SELECT DISTINCT s.domain AS src_domain, d.domain AS dst_domain
       |  FROM sdom s JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain),
       |gmap AS (
       |  SELECT domain,
       |    CAST(('0x' || substring(md5(domain), 1, 15))::UBIGINT AS BIGINT) AS v
       |  FROM (SELECT src_domain AS domain FROM gpairs
       |        UNION SELECT dst_domain FROM gpairs)),
       |ge AS (
       |  SELECT sm.v AS src, dm.v AS dst
       |  FROM gpairs JOIN gmap sm ON sm.domain = src_domain
       |  JOIN gmap dm ON dm.domain = dst_domain),
       |gdeg AS (SELECT src, COUNT(*) AS d FROM ge GROUP BY 1),
       |gnodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM ge
       |                                   UNION SELECT dst FROM ge)),
       |gseeds AS (
       |  SELECT v FROM gmap WHERE domain IN ($seedList)),
       |gns AS (SELECT COUNT(*) AS n FROM gseeds),
       |stp AS (SELECT CAST($scale * ${100 - dampingPct} // 100 // n AS BIGINT)
       |          AS t FROM gns),
       |t0 AS (
       |  SELECT n.v,
       |    CAST(CASE WHEN s.v IS NOT NULL THEN $scale // gns.n ELSE 0 END
       |      AS BIGINT) AS r
       |  FROM gnodes n CROSS JOIN gns LEFT JOIN gseeds s ON n.v = s.v),
       |$iters
       |SELECT m.domain, t.r AS trust_fp
       |FROM t$iterations t JOIN gmap m ON m.v = t.v
       |ORDER BY m.domain""".stripMargin
  }

  /** [[webTrustRankUntil]] (the tolerance production face) as one DuckDB
    * query: the [[sqlWebTrustRank]] graph lift, the chain MATERIALIZED
    * (each round frame now has three readers — curve twice, final join
    * once), one residual-curve row per round, the stop round derived by
    * the SAME `l1 < tolFp` rule the Scala loop applies, and the
    * CASE-selected stop-round vector — the
    * [[graft.analytics.PageRank.sqlCopurchaseEarlyStop]] recipe on the
    * extracted host graph.
    *
    * `tolFp` and `maxIterations` carry NO defaults deliberately (r14
    * review): the Scala face's production defaults (1 ppm, rail 50)
    * cannot be mirrored by an unrolled chain of practical length, so a
    * defaulted pair here would silently diverge from a defaulted
    * [[webTrustRankUntil]] call. The caller must pin the SAME two values on
    * both sides (the registered query pins (10¹¹, 10)). */
  def sqlWebTrustRankEarlyStop(from: String, idCol: String,
                               seeds: Seq[String], tolFp: Long,
                               maxIterations: Int,
                               dampingPct: Int = 85): String = {
    val scale = graft.analytics.PageRank.Scale
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    val iters = (1 to maxIterations).map { kk =>
      s"""t$kk AS MATERIALIZED (
         |  SELECT n.v AS v,
         |    CAST((CASE WHEN s.v IS NOT NULL THEN stp.t ELSE 0 END)
         |         + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM gnodes n CROSS JOIN stp LEFT JOIN gseeds s ON n.v = s.v
         |  LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM ge e JOIN t${kk - 1} r ON e.src = r.v
         |    JOIN gdeg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")
    val curve = (1 to maxIterations).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1
         |FROM t$k a JOIN t${k - 1} b ON a.v = b.v""".stripMargin
    }.mkString("\nUNION ALL\n")
    val cases = (1 to maxIterations).map(k => s"WHEN $k THEN x$k.r").mkString(" ")
    val joins = (1 to maxIterations)
      .map(k => s"JOIN t$k x$k ON n.v = x$k.v").mkString("\n|")
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |gpairs AS (
       |  SELECT DISTINCT s.domain AS src_domain, d.domain AS dst_domain
       |  FROM sdom s JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain),
       |gmap AS (
       |  SELECT domain,
       |    CAST(('0x' || substring(md5(domain), 1, 15))::UBIGINT AS BIGINT) AS v
       |  FROM (SELECT src_domain AS domain FROM gpairs
       |        UNION SELECT dst_domain FROM gpairs)),
       |ge AS MATERIALIZED (
       |  SELECT sm.v AS src, dm.v AS dst
       |  FROM gpairs JOIN gmap sm ON sm.domain = src_domain
       |  JOIN gmap dm ON dm.domain = dst_domain),
       |gdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM ge GROUP BY 1),
       |gnodes AS MATERIALIZED (
       |  SELECT DISTINCT v FROM (SELECT src AS v FROM ge
       |                          UNION SELECT dst FROM ge)),
       |gseeds AS (
       |  SELECT v FROM gmap WHERE domain IN ($seedList)),
       |gns AS (SELECT COUNT(*) AS n FROM gseeds),
       |stp AS (SELECT CAST($scale * ${100 - dampingPct} // 100 // n AS BIGINT)
       |          AS t FROM gns),
       |t0 AS MATERIALIZED (
       |  SELECT n.v,
       |    CAST(CASE WHEN s.v IS NOT NULL THEN $scale // gns.n ELSE 0 END
       |      AS BIGINT) AS r
       |  FROM gnodes n CROSS JOIN gns LEFT JOIN gseeds s ON n.v = s.v),
       |$iters,
       |curve AS ($curve),
       |stopr AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM curve WHERE l1 < $tolFp)
       |SELECT m.domain,
       |  CAST(CASE stopr.k $cases END AS BIGINT) AS trust_fp,
       |  stopr.k AS stop_round
       |FROM gnodes n CROSS JOIN stopr
       |$joins
       |JOIN gmap m ON m.v = n.v
       |ORDER BY m.domain""".stripMargin
  }

  /** [[webSpamMass]] as one DuckDB query: the [[sqlWebTrustRank]] graph
    * lift, then BOTH rank chains MATERIALIZED (open PageRank seeded
    * uniformly over gnodes; TrustRank seeded over gseeds), one residual
    * curve and stop round PER chain (each stops on its OWN curve — the
    * [[graft.analytics.PageRank.sqlCopurchaseSpamMassEarlyStop]]
    * recipe), CASE-selected vectors, and the same truncating ppm
    * division the engine runs. No defaults on (tolFp, maxIterations) —
    * pin the SAME pair on both engine sides. */
  def sqlWebSpamMassEarlyStop(from: String, idCol: String,
                              seeds: Seq[String], tolFp: Long,
                              maxIterations: Int,
                              dampingPct: Int = 85): String = {
    val scale = graft.analytics.PageRank.Scale
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    def chain(pfx: String, teleExpr: String): String =
      (1 to maxIterations).map { k =>
        s"""$pfx$k AS MATERIALIZED (
           |  SELECT n.v AS v, CAST($teleExpr + COALESCE(c.s, 0) AS BIGINT) AS r
           |  FROM gnodes n CROSS JOIN ptp CROSS JOIN stp
           |  LEFT JOIN gseeds s ON n.v = s.v
           |  LEFT JOIN (
           |    SELECT e.dst AS v,
           |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
           |    FROM ge e JOIN $pfx${k - 1} r ON e.src = r.v
           |    JOIN gdeg dg ON dg.src = e.src
           |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
      }.mkString(",\n")
    def curve(pfx: String): String =
      (1 to maxIterations).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS round,
           |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1
           |FROM $pfx$k a JOIN $pfx${k - 1} b ON a.v = b.v""".stripMargin
      }.mkString("\nUNION ALL\n")
    def cases(pfx: String, stop: String): String =
      s"CASE $stop.k " +
        (1 to maxIterations).map(k => s"WHEN $k THEN x$pfx$k.r").mkString(" ") +
        " END"
    def joins(pfx: String): String =
      (1 to maxIterations)
        .map(k => s"JOIN $pfx$k x$pfx$k ON n.v = x$pfx$k.v").mkString("\n|")
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |gpairs AS (
       |  SELECT DISTINCT s.domain AS src_domain, d.domain AS dst_domain
       |  FROM sdom s JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain),
       |gmap AS (
       |  SELECT domain,
       |    CAST(('0x' || substring(md5(domain), 1, 15))::UBIGINT AS BIGINT) AS v
       |  FROM (SELECT src_domain AS domain FROM gpairs
       |        UNION SELECT dst_domain FROM gpairs)),
       |ge AS MATERIALIZED (
       |  SELECT sm.v AS src, dm.v AS dst
       |  FROM gpairs JOIN gmap sm ON sm.domain = src_domain
       |  JOIN gmap dm ON dm.domain = dst_domain),
       |gdeg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM ge GROUP BY 1),
       |gnodes AS MATERIALIZED (
       |  SELECT DISTINCT v FROM (SELECT src AS v FROM ge
       |                          UNION SELECT dst FROM ge)),
       |gnn AS (SELECT COUNT(*) AS n FROM gnodes),
       |ptp AS (SELECT CAST($scale * ${100 - dampingPct} // 100 // n AS BIGINT)
       |          AS t FROM gnn),
       |gseeds AS (
       |  SELECT v FROM gmap WHERE domain IN ($seedList)),
       |gns AS (SELECT COUNT(*) AS n FROM gseeds),
       |stp AS (SELECT CAST($scale * ${100 - dampingPct} // 100 // n AS BIGINT)
       |          AS t FROM gns),
       |p0 AS MATERIALIZED (
       |  SELECT v, CAST($scale // n AS BIGINT) AS r
       |  FROM gnodes CROSS JOIN gnn),
       |t0 AS MATERIALIZED (
       |  SELECT n.v,
       |    CAST(CASE WHEN s.v IS NOT NULL THEN $scale // gns.n ELSE 0 END
       |      AS BIGINT) AS r
       |  FROM gnodes n CROSS JOIN gns LEFT JOIN gseeds s ON n.v = s.v),
       |${chain("p", "ptp.t")},
       |${chain("t", "CASE WHEN s.v IS NOT NULL THEN stp.t ELSE 0 END")},
       |pcurve AS (${curve("p")}),
       |tcurve AS (${curve("t")}),
       |pstop AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM pcurve WHERE l1 < $tolFp),
       |tstop AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM tcurve WHERE l1 < $tolFp),
       |sel AS (
       |  SELECT n.v,
       |    CAST(${cases("p", "pstop")} AS BIGINT) AS pr_fp,
       |    CAST(${cases("t", "tstop")} AS BIGINT) AS tr_fp,
       |    pstop.k AS pr_stop, tstop.k AS tr_stop
       |  FROM gnodes n CROSS JOIN pstop CROSS JOIN tstop
       |  ${joins("p")}
       |  ${joins("t")})
       |SELECT m.domain, s.pr_fp, s.tr_fp,
       |  CAST(CASE WHEN s.pr_fp > 0
       |    THEN GREATEST(s.pr_fp - s.tr_fp, 0) * 1000000 // s.pr_fp
       |    ELSE 0 END AS BIGINT) AS spam_mass_ppm,
       |  s.pr_stop, s.tr_stop
       |FROM sel s JOIN gmap m ON m.v = s.v
       |ORDER BY m.domain""".stripMargin
  }

  /** [[hostCommunities]] as one DuckDB query: the [[sqlWebTrustRank]]
    * graph lift, edges symmetrized, then the
    * [[graft.analytics.Lpa.sqlPartCommunitiesEarlyStop]] vote chain
    * (count in-neighbor labels → elect max-count lowest-label →
    * carry forward, MATERIALIZED throughout), per-round churn, the stop
    * as `MIN(round) WHERE churn <= maxChurn` with the round-rail
    * fallback, and the stop-round labels lifted back to domains.
    * No defaults on (maxChurn, maxRounds) — the [[sqlWebTrustRankEarlyStop]]
    * rule: pin the SAME pair on both engine sides. */
  def sqlHostCommunitiesEarlyStop(from: String, idCol: String,
                                  maxChurn: Long, maxRounds: Int): String = {
    val iters = (1 to maxRounds).map { k =>
      s"""cnt$k AS MATERIALIZED (
         |  SELECT e.dst AS v, l.lab, COUNT(*) AS c
         |  FROM gse e JOIN l${k - 1} l ON e.src = l.v GROUP BY 1, 2),
         |el$k AS MATERIALIZED (
         |  SELECT v, lab FROM (
         |    SELECT v, lab,
         |      row_number() OVER (PARTITION BY v
         |                         ORDER BY c DESC, lab ASC) AS rn
         |    FROM cnt$k) WHERE rn = 1),
         |l$k AS MATERIALIZED (
         |  SELECT l.v, COALESCE(el.lab, l.lab) AS lab
         |  FROM l${k - 1} l LEFT JOIN el$k el ON l.v = el.v)""".stripMargin
    }.mkString(",\n")
    val curve = (1 to maxRounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  CAST(SUM(CASE WHEN a.lab <> b.lab THEN 1 ELSE 0 END) AS BIGINT)
         |    AS churn
         |FROM l$k a JOIN l${k - 1} b ON a.v = b.v""".stripMargin
    }.mkString("\nUNION ALL\n")
    val cases = (1 to maxRounds).map(k => s"WHEN $k THEN x$k.lab").mkString(" ")
    val joins = (1 to maxRounds)
      .map(k => s"JOIN l$k x$k ON n.v = x$k.v").mkString("\n|")
    s"""${sqlLinkCtes(from, idCol, "lk")},
       |lks AS (SELECT ROW_NUMBER() OVER (ORDER BY $idCol, dst_url) AS lid,
       |               src_url, dst_url FROM lk),
       |${Psl.sqlDomainCtes("(SELECT lid, src_url AS url FROM lks)", "lid", Seq.empty, "url", "sdom")},
       |${Psl.sqlDomainCtes("(SELECT lid, dst_url AS url FROM lks)", "lid", Seq.empty, "url", "ddom")},
       |gpairs AS (
       |  SELECT DISTINCT s.domain AS src_domain, d.domain AS dst_domain
       |  FROM sdom s JOIN ddom d USING (lid)
       |  WHERE s.domain IS NOT NULL AND d.domain IS NOT NULL
       |    AND s.domain <> d.domain),
       |gmap AS (
       |  SELECT domain,
       |    CAST(('0x' || substring(md5(domain), 1, 15))::UBIGINT AS BIGINT) AS v
       |  FROM (SELECT src_domain AS domain FROM gpairs
       |        UNION SELECT dst_domain FROM gpairs)),
       |ge AS (
       |  SELECT sm.v AS src, dm.v AS dst
       |  FROM gpairs JOIN gmap sm ON sm.domain = src_domain
       |  JOIN gmap dm ON dm.domain = dst_domain),
       |gse AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM ge UNION ALL SELECT dst, src FROM ge)),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT src AS v FROM gse),
       |l0 AS MATERIALIZED (SELECT v, v AS lab FROM nodes),
       |$iters,
       |curve AS ($curve),
       |stopr AS (SELECT CAST(COALESCE(MIN(round), $maxRounds) AS BIGINT) AS k
       |          FROM curve WHERE churn <= $maxChurn)
       |SELECT m.domain,
       |  cm.domain AS community_domain,
       |  stopr.k AS stop_round
       |FROM nodes n CROSS JOIN stopr
       |$joins
       |JOIN gmap m ON m.v = n.v
       |JOIN gmap cm ON cm.v = CASE stopr.k $cases END
       |ORDER BY m.domain""".stripMargin
  }
}
