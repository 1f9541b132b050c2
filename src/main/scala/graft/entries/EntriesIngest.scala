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

import graft.EntryFixtures._

/** ingest, URL/link/host-graph, robots/sitemaps, compliance, sampling and caps — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesIngest {

  /** The maintained host-graph STATE both incremental graph consumers
    * read (r15): per-batch `Links.hostGraph` partials merged by sum —
    * the F106 discipline — with the same 250 batch boundary as
    * `host_link_graph_incremental`. Pinned because in production it is
    * a persisted index read back from storage, never a live
    * recomputation fused into the consumer's plan. */
  private def mergedHostState(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.ingest.Links.mergeEdges(
      graft.ingest.Links.hostGraph(docs.filter(col("doc_id") < 250))
        .unionByName(
          graft.ingest.Links.hostGraph(docs.filter(col("doc_id") >= 250))))
      .pinned

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ingest path (reference crawl.py E1) ----
    "ingest_articles" -> ((s, _) => {
      import s.implicits._
      val listings = IngestFixture.listings.toDF("source", "html")
      val pages = IngestFixture.pages.toDF("sources", "html")
      Ingest.run(listings, pages, Seq.empty[String].toDF("sources"))
        .select("title", "sources", "content", "source", "published_at")
        .orderBy("sources")
    }),
    "ingest_dedup_antijoin" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.select(col("doc_id"), col("text"))
        .join(docs.filter(col("doc_id") % 3 === 0).select(col("text")),
          Seq("text"), "left_anti")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    // URL canonicalization: the scale form of the crawler's link-dedup
    // key (byte-equal URLs re-crawl the same page under case/port/
    // tracking-param/fragment noise). Pure string expressions, mirrored
    // 1:1 in the oracle — the hash-check IS the cross-engine parity pin.
    "canonical_urls" -> ((s, _) => {
      import s.implicits._
      val u = UrlFixture.urls.toDF("id", "url")
      u.select(col("id"), col("url"),
          graft.ingest.Urls.canonicalize(col("url")).as("canon"))
        .orderBy(col("id"))
    }),
    // Dedup by canonical form: keeper = min id per canon (1/8 and 3/4
    // collide only after canonicalization).
    "canonical_url_dedup" -> ((s, _) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val u = UrlFixture.urls.toDF("id", "url")
        .select(col("id"), graft.ingest.Urls.canonicalize(col("url")).as("canon"))
      u.withColumn("keeper_id",
          min(col("id")).over(Window.partitionBy(col("canon"))))
        .select(col("id"), col("canon"), col("keeper_id"),
          (col("id") === col("keeper_id")).cast("int").as("is_keeper"))
        .orderBy(col("id"))
    }),
    "parse_published" -> ((s, _) => {
      import s.implicits._
      IngestFixture.rawDates.toDF("raw")
        .select(col("raw"),
          date_format(Dates.parsePublished(col("raw")), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy(col("raw"))
    }),
    // F127: the dateutil free-text tail — ordinal days, dotted/Sept
    // months, comma-less month-name forms — through the SAME cascade,
    // so the pre-normalization chain is cross-engine hash-checked.
    "parse_published_freetext" -> ((s, _) => {
      import s.implicits._
      IngestFixture.rawDatesFree.toDF("raw")
        .select(col("raw"),
          date_format(Dates.parsePublished(col("raw")), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy(col("raw"))
    }),
    // ---- [EXT] event-time windows + JSON (streaming-capable shapes) ----
    "events_hourly" -> ((s, dir) => EventWindows.tumblingHourly(Tables.events(s, dir))),
    "events_sliding" -> ((s, dir) => EventWindows.slidingHourly(Tables.events(s, dir))),
    "events_sessions" -> ((s, dir) => EventWindows.userSessions(Tables.events(s, dir))),
    "events_props_json" -> ((s, dir) => EventWindows.propsStats(Tables.events(s, dir))),
    "approx_distinct_users" -> ((s, dir) => EventWindows.distinctUsers(Tables.events(s, dir))),
    // Engine-reproducible HLL (vs Spark's internal HLL++ above): 60-bit
    // md5-prefix hash, integer rho chain, exact dyadic 2^-M terms folded
    // in bucket order — the sketch ESTIMATE itself hash-matches DuckDB.
    "hll_distinct_users" -> ((s, dir) =>
      graft.relational.Hll.distinctWithExact(Tables.events(s, dir),
        "user_id", "event_type")),
    // Engine-reproducible Count-Min sketch: point-frequency estimates for
    // the exact top-30 tokens — md5-prefix cell hashes, integer counters,
    // min across D rows; estimates hash-match the DuckDB replay.
    "cms_word_counts" -> ((s, dir) =>
      graft.relational.CountMin.wordCountsWithExact(
        Tables.documents(s, dir), "text", 30)),
    // Stream-stream-capable interval join run batch: purchases pick up
    // ALL clicks of the same user in the prior 30 min (AsOf keeps one).
    // Same function streams with watermarked state; parity pinned in
    // StreamJoinSpec.
    "events_interval_join" -> ((s, dir) =>
      graft.streaming.StreamJoin.purchasesWithPriorClicks(Tables.events(s, dir))),
    // As-of join: each purchase event picks up the user's most recent
    // prior-or-equal click (point-in-time lookup; union-and-sweep form,
    // one shuffle). DuckDB ASOF LEFT JOIN is the oracle.
    "events_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.relational.AsOf.asofJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "click"),
        "user_id", "ts", "ts",
        Seq("event_id" -> "click_event_id", "value" -> "click_value"),
        tieBreak = Some("event_id"))
        .orderBy(col("event_id"))
    }),
    // ---- [EXT] corpus curation ----
    "sample_deterministic" -> ((s, dir) =>
      graft.pipeline.Curation.sampleDeterministic(Tables.documents(s, dir), "text", 1000)
        .select(col("doc_id"), col("source"),
          graft.pipeline.Curation.sampleBucket(col("text")).as("bucket"))
        .orderBy(col("doc_id"))),
    // Class-balanced eval-set sampling: exactly min(k, |label|) vectors
    // per label in content-keyed md5 order.
    "balanced_sample" -> ((s, dir) =>
      graft.pipeline.Curation.balancedSample(
        Tables.embeddings(s, dir), "label", "vec_id", 20)),
    "curation_quota" -> ((s, dir) =>
      graft.pipeline.Curation.quotaPerGroup(Tables.documents(s, dir), "source", 20,
        Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk"))
        .orderBy(col("source"), col("rk"))),
    // Per-registered-domain caps (RefinedWeb's domain-skew gate): URLs
    // derived deterministically from doc ids with a deliberately skewed
    // host mix — 6 of 10 hosts are subdomains of one domain, plus a
    // two-label-suffix case — so the cap must collapse subdomains onto
    // the eTLD+1 to be right. Full oracle: the registered-domain
    // expression mirrors 1:1 into DuckDB.
    "domain_caps" -> ((s, dir) => {
      graft.pipeline.Curation.domainCaps(
          withFixtureUrls(Tables.documents(s, dir)), "url", 50,
          Seq(col("n_chars").desc, col("doc_id").asc))
        .select(col("doc_id"), col("domain"), col("n_chars"), col("rk"))
        .orderBy(col("domain"), col("rk"))
    }),
    // The incremental face under the gate (r9): two chained batches
    // against the persisted per-domain tally must equal one first-come
    // pass over the union — the union-equivalence oracle (arrival order
    // = doc_id, so the one-shot SQL replays it exactly).
    "domain_caps_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val docs = withFixtureUrls(Tables.documents(s, dir))
      val empty = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("domain", StringType),
          StructField("n_kept", LongType))))
      val (k1, s1) = graft.pipeline.Curation.domainCapsIncremental(
        docs.filter(col("doc_id") < 250), empty, "url", 50, Seq(col("doc_id").asc))
      val (k2, _) = graft.pipeline.Curation.domainCapsIncremental(
        docs.filter(col("doc_id") >= 250), s1.pinned,
        "url", 50, Seq(col("doc_id").asc))
      k1.unionByName(k2)
        .select(col("doc_id"), col("domain"))
        .orderBy(col("doc_id"))
    }),
    // URL blocklist at eTLD+1: every subdomain of a blocked registered
    // domain drops (6 of the 10 fixture hosts fall under example.com —
    // the gate only works if it keys on the registered domain).
    "domain_blocklist" -> ((s, dir) => {
      import s.implicits._
      val docs = withFixtureUrls(Tables.documents(s, dir))
      val blocked = Seq("example.com", "foo.co.uk").toDF("domain")
      graft.pipeline.Curation.excludeByKey(docs,
          graft.ingest.Urls.registeredDomain(col("url")), blocked)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // Per-registered-domain corpus profile (r10): the skew report a
    // crawl team reads BEFORE setting caps — docs and distinct hosts
    // per eTLD+1 plus pct-of-corpus. One domain-keyed aggregate
    // (scan-stage PSL key); the pct window runs over <= |domains|
    // aggregate rows (global-window allowlist).
    "domain_distribution" -> ((s, dir) => {
      val d = withFixtureUrls(Tables.documents(s, dir))
        .withColumn("host", graft.ingest.Urls.host(col("url")))
        .withColumn("domain", graft.ingest.Urls.registeredDomain(col("url")))
      d.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"))
        .withColumn("pct", round(col("n_docs") * 100.0 /
          sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()), 4))
        .orderBy(col("n_docs").desc, col("domain"))
    }),
    // ---- [EXT] hyperlink extraction -> the host-level web graph (r10)
    // Anchors parsed by pure regexp expressions (href from the OPENING
    // tag only, double- then single-quoted), resolved by the
    // RFC-3986-subset chain (absolute http(s) / scheme-relative /
    // root-relative / path-relative; javascript:/mailto:/fragment
    // drop), endpoints collapsed to the PSL registered domain,
    // self-loops dropped. One explode + one aggregate.
    "host_link_graph" -> ((s, dir) =>
      graft.ingest.Links.hostGraph(withLinkHtml(Tables.documents(s, dir)))),
    // Canonical-link dedup (r11): pages cluster by their declared
    // <link rel="canonical"> target (resolved against the page URL,
    // then canonicalized); self-canonical pages keep, variant clusters
    // elect the self-canonical original else the lowest doc id. The
    // r11 dot-segment resolver is what makes dst URLs safe as keys.
    "canonical_link_dedup" -> ((s, dir) =>
      graft.ingest.Links.canonicalDedup(
        withCanonicalHtml(Tables.documents(s, dir)))),
    // The incremental face (r11): docs < 251 are history (only their
    // keeper STATE is consulted — history pages never re-read), the
    // rest arrive as a batch. The 251 split deliberately cuts the
    // (250, 251) variant pair so one cluster spans the boundary: the
    // batch page labels under the IMMUTABLE history keeper.
    "canonical_link_dedup_incremental" -> ((s, dir) => {
      val all = withCanonicalHtml(Tables.documents(s, dir))
      // The state MUST be pinned (r14): in production it is a persisted
      // index read back from storage, never a live recomputation fused
      // into the batch plan. Unpinned, Catalyst splices the whole
      // history-side extraction tree into the batch query and the
      // doubled interpreted-HOF expression tree dominates every task's
      // closure DEserialization — measured 32 s/dump vs 2 s pinned at
      // sf0.01 (jstack: all 16 workers inside ObjectInputStream), the
      // gate-telemetry mystery the r13 verdict misattributed to JIT
      // warmup.
      graft.ingest.Links.canonicalDedupIncremental(
        all.filter(col("doc_id") >= 251),
        graft.ingest.Links.canonicalKeeperState(
          all.filter(col("doc_id") < 251)).pinned)
    }),
    // The incremental face under the gate: per-batch edge partials
    // merged by sum must equal the one-shot graph (edge counts are
    // additive) — the oracle IS the one-shot query's, which is exactly
    // the union-equivalence claim.
    "host_link_graph_incremental" -> ((s, dir) => {
      val docs = withLinkHtml(Tables.documents(s, dir))
      val p1 = graft.ingest.Links.hostGraph(docs.filter(col("doc_id") < 250))
      val p2 = graft.ingest.Links.hostGraph(docs.filter(col("doc_id") >= 250))
      graft.ingest.Links.mergeEdges(p1.unionByName(p2))
    }),
    // Anchor-term profile per TARGET domain: the off-page description
    // signal — top-5 tokens of cross-domain anchor texts (inner HTML
    // stripped of tags), counted per destination registered domain.
    "anchor_texts" -> ((s, dir) =>
      graft.ingest.Links.anchorTerms(withLinkHtml(Tables.documents(s, dir)))),
    // TrustRank over the EXTRACTED graph — the composition the fixture
    // rank core exists for: trust seeded at curated registered domains
    // flows along real hyperlinks (domains lift to md5-prefix ids for
    // the integer fixed-point core, then map back). Full oracle: the
    // whole line — extraction, resolution, PSL collapse, id lift, and
    // the unrolled seeded iteration chain — replays in DuckDB.
    "web_trustrank" -> ((s, dir) =>
      graft.ingest.Links.webTrustRankFixed(
        withLinkHtml(Tables.documents(s, dir)),
        Seq("openweb.org", "data.net"))),
    // The PRODUCTION TrustRank face (r14, the r13 verdict's #2):
    // tolerance-stopped on the seeded chain's own residual curve —
    // the data-dependent stop round and the early-stopped vector are
    // both hash-checked (the oracle derives the stop from the same
    // l1 < tol rule over its materialized chain). Tolerance is
    // curve-derived for THIS fixture (BASELINE.md r14): the 4-domain
    // host cycle decays geometrically (~0.67/round, never reaching the
    // API's 1-ppm default in any practical chain), and 10% of trust
    // mass (1e11 fp) is crossed at round 7 — past the last observed
    // rank inversion (round 4→5) with the survivor gap already 2× the
    // subsequent per-round drift.
    "web_trustrank_earlystop" -> ((s, dir) =>
      graft.ingest.Links.webTrustRankUntil(withLinkHtml(Tables.documents(s, dir)),
        Seq("openweb.org", "data.net"), tolFp = 100000000000L,
        maxIterations = 10)),
    // Web spam mass (r14): the Gyöngyi anti-spam triple on the REAL
    // extracted host graph — open PageRank vs seeded TrustRank vs
    // spam-mass ppm, BOTH chains tolerance-stopped on their own
    // residual curves (the spamMassUntil production default face).
    // Same curve-derived tolerance as web_trustrank_earlystop; the
    // oracle derives both stop rounds independently from its two
    // materialized chains.
    "web_spam_mass_earlystop" -> ((s, dir) =>
      graft.ingest.Links.webSpamMass(withLinkHtml(Tables.documents(s, dir)),
        Seq("openweb.org", "data.net"), tolFp = 100000000000L,
        maxIterations = 10)),
    // The INCREMENTAL spam-mass face (r15): the triple reads the
    // MAINTAINED host-graph state (per-batch hostGraph partials merged
    // by sum — the F106 discipline; the 250 split matches
    // host_link_graph_incremental) instead of re-extracting the corpus.
    // Edge counts are additive and the rank cores consume the edge SET,
    // so the maintained-state run is bit-equal to the full recompute —
    // which is exactly what the oracle replays (the one-shot chain over
    // ALL documents). State pinned: in production it is a persisted
    // index read back, never a live recomputation fused into the plan.
    "web_spam_mass_incremental" -> ((s, dir) =>
      graft.ingest.Links.webSpamMassFromHostGraph(
        mergedHostState(withLinkHtml(Tables.documents(s, dir))),
        Seq("openweb.org", "data.net"), tolFp = 100000000000L,
        maxIterations = 10)),
    // Host communities (r14): LPA over the extracted + symmetrized host
    // graph — the webTrustRankUntil composition for the LABEL family, churn-
    // stopped at LPA's natural rule (churn = 0) under an 8-round rail.
    // Vector, community-representative DOMAIN names, and the data-
    // dependent stop round all hash-checked against the unrolled vote
    // chain.
    "host_communities_earlystop" -> ((s, dir) =>
      graft.ingest.Links.hostCommunities(
        withLinkHtml(Tables.documents(s, dir)), maxChurn = 0L,
        maxRounds = 8)),
    // The INCREMENTAL communities face (r15): LPA reads the maintained
    // edge state (same merged partials as web_spam_mass_incremental) —
    // the label-family twin of the spam-mass composition; the oracle is
    // the one-shot chain over all documents (incremental == batch).
    "host_communities_incremental" -> ((s, dir) =>
      graft.ingest.Links.hostCommunitiesFromHostGraph(
        mergedHostState(withLinkHtml(Tables.documents(s, dir))),
        maxChurn = 0L, maxRounds = 8)),
    // XML sitemap parsing (r10) — the protocol seed channel: urlset
    // entries with freshness metadata (lastmod/changefreq/priority) and
    // sitemapindex child pointers as typed rows; entity-escaped locs
    // decode, loc-less blocks drop. Pure regexp scan-stage extraction.
    "sitemap_entries" -> ((s, dir) =>
      graft.sources.Sitemap.entries(
        withSitemapXml(Tables.documents(s, dir)), idCol = "doc_id")),
    // Sitemap-driven discovery frontier (r10): page entries only,
    // locs canonicalized and deduplicated across sitemaps (mention
    // count, freshest lastmod, strongest priority as integer
    // per-mille), robots-gated, then ranked per host for fetch order.
    "sitemap_frontier" -> ((s, dir) => {
      import s.implicits._
      val rules = RobotsRulesFixture.rules.toDF("host", "rule", "prefix")
      graft.sources.Sitemap.frontier(
        withSitemapXml(Tables.documents(s, dir)), rules, idCol = "doc_id")
    }),
    // robots.txt TEXT parsing (r10) — upstream of the rules evaluator:
    // RFC 9309 group structure (consecutive ua lines share a header),
    // exact-token-beats-star election, case-insensitive fields, comment
    // strip, pre-group strays dropped, bare Disallow passed through.
    "robots_parse" -> ((s, dir) =>
      graft.ingest.Robots.parse(
        withRobotsTxt(Tables.documents(s, dir)), "graftbot",
        idCol = "doc_id")),
    // Sitemap: directives are global (never group-scoped) — the robots
    // side of the discovery loop, feeding Sitemap.frontier.
    "robots_sitemaps" -> ((s, dir) =>
      graft.ingest.Robots.sitemapPointers(
        withRobotsTxt(Tables.documents(s, dir)), idCol = "doc_id")),
    // Crawl-delay-aware politeness (r11): elected robots Crawl-delay
    // per host (de-facto directive — max wins on contradiction,
    // fractional seconds to integer ms, invalid values drop), joined
    // into the frontier schedule so each host's FIFO interval is ITS
    // declared courtesy, defaulting where undeclared.
    "crawl_delay_schedule" -> ((s, dir) => {
      import s.implicits._
      val delays = graft.ingest.Robots.crawlDelays(
        HostRobotsRows.toDF("host", "robots_txt"), "graftbot")
      graft.ingest.Frontier.scheduleWithDelays(
        withFixtureUrls(Tables.documents(s, dir))
          .select(col("doc_id"), col("url")),
        "url", "doc_id", delays)
    }),
    // Redirect-chain resolution (r11): bounded-hop Location walk —
    // planted single hops, 2-chains, and a 2-cycle that must report
    // unterminated at the cap (the fetcher's too-many-redirects).
    "redirect_chains" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"))
      def u(id: org.apache.spark.sql.Column) =
        concat(lit("https://r.example/p/"), id)
      val urls = d.select(u(col("doc_id")).as("url"))
      val red = d.filter(col("doc_id") % 5 =!= 0)
        .select(u(col("doc_id")).as("src_url"),
          u(when(col("doc_id") % 5 === 3, col("doc_id") + 1)
            .otherwise(col("doc_id") - 1)).as("dst_url"))
      graft.ingest.Redirects.chains(urls, red)
    }),
    // Soft URL word-score gate (r10) — RefinedWeb's OTHER URL filter:
    // spam announces itself in the URL string before any fetch, so the
    // score is a pure scan-stage expression over the url column. Paths
    // planted by doc id exercise blocking (1.0), additive soft hits
    // (0.5+0.5), and clean URLs.
    "url_spam_scores" -> ((s, dir) => {
      val docs = withSpamUrls(Tables.documents(s, dir))
      docs.select(col("doc_id"),
          round(graft.ingest.Urls.spamScore(col("url")), 4).as("spam_score"))
        .withColumn("blocked", col("spam_score") >= 1.0)
        .orderBy(col("doc_id"))
    }),
    // Robots-rules URL exclusion (r10) — the compliance trio's third
    // leg: longest-prefix-match allow/disallow per HOST, allow wins
    // ties, unlisted hosts allowed. The planted rules exercise every
    // branch (whole-host block, longer-allow override, exact tie,
    // allow-only host, unlisted host).
    "robots_exclusion" -> ((s, dir) => {
      import s.implicits._
      val docs = withRobotsUrls(Tables.documents(s, dir))
      val rules = RobotsRulesFixture.rules.toDF("host", "rule", "prefix")
      graft.ingest.Robots.decisions(docs, "url", rules)
        .orderBy(col("doc_id"))
    }),
    // The compliance trio as ONE sweep (r10): content-hash takedowns ->
    // eTLD+1 blocklist -> robots rules (wildcards included), one
    // text-bearing scan with broadcast marks + the host-keyed robots
    // election over an (id, url) projection.
    "compliance_sweep" -> ((s, dir) => {
      import s.implicits._
      val docs = withRobotsUrls(Tables.documents(s, dir))
      val takedowns = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h"))
      graft.pipeline.Compliance.sweep(docs, "doc_id", "url", "text",
          takedowns, Seq("example.com").toDF("domain"),
          RobotsRulesFixture.rules.toDF("host", "rule", "prefix"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // The END-TO-END release: compliance sweep -> exact dedup -> domain
    // caps -> shard manifest, one call, one composed WITH-chain oracle.
    "release_run" -> ((s, dir) => {
      import s.implicits._
      val docs = withRobotsUrls(Tables.documents(s, dir))
      val takedowns = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h"))
      graft.pipeline.Release.run(docs, takedowns,
        Seq("example.com").toDF("domain"),
        RobotsRulesFixture.rules.toDF("host", "rule", "prefix"))
    }),
    // Attrition per compliance leg, cumulative in sweep order — ONE
    // aggregate over the flags frame (the funnel discipline: never a
    // count per stage).
    "compliance_funnel" -> ((s, dir) => {
      import s.implicits._
      val docs = withRobotsUrls(Tables.documents(s, dir))
      val takedowns = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h"))
      graft.pipeline.Compliance.funnel(docs, "doc_id", "url", "text",
        takedowns, Seq("example.com").toDF("domain"),
        RobotsRulesFixture.rules.toDF("host", "rule", "prefix"))
    }),
    // Takedown/opt-out requests keyed by CONTENT HASH: the request list
    // (docs ≡ 0 mod 97 stand in for requested items) removes every copy
    // of the content — exact duplicates of a requested doc drop too.
    "takedown_requests" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val requests = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h"))
      graft.pipeline.Curation.excludeByKey(docs, md5(col("text")), requests)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // Luhn-gated credit-card scrub (r10) — the PII class regexes can't
    // carry alone: card numbers are indistinguishable from invoice ids
    // by shape, so validity is ARITHMETIC (the Luhn checksum, as a
    // codegen'd native expression inside the filter lambda). Planted
    // suffixes exercise a valid Visa, a Luhn-failing twin, a valid
    // MC beside a Luhn-failing 13-digit serial, and a too-short run.
    "pii_credit_cards" -> ((s, dir) =>
      graft.pipeline.Pii.creditCards(
        withCcTexts(Tables.documents(s, dir)), "doc_id", "text")),
    // Mojibake repair (r10) — table-driven UTF-8-as-cp1252 un-corruption
    // (ftfy's dominant case); both engines replay the same printed pairs
    // as chained literal replaces. Planted suffixes are BUILT from the
    // repair table (Encoding.moj), so fixture and table can't drift.
    "mojibake_repair" -> ((s, dir) =>
      graft.text.Encoding.repair(
        withMojTexts(Tables.documents(s, dir)), "doc_id", "text")),
    // Encoding-damage profile (r10): replacement chars, stray C0
    // controls, mojibake markers, non-ASCII mass -> the damaged flag a
    // pipeline gates on before any text filter runs.
    "encoding_hygiene" -> ((s, dir) =>
      graft.text.Encoding.hygiene(
        withHygieneTexts(Tables.documents(s, dir)), "doc_id", "text")),
    // Politeness frontier (r10): per-host FIFO slots at one fetch per
    // second per host, hosts pinned to 4 workers by host rank. The
    // worker window runs over DISTINCT hosts (global-window allowlist);
    // the slot rank is the one host-keyed exchange.
    "crawl_frontier" -> ((s, dir) =>
      graft.ingest.Frontier.schedule(
        withFixtureUrls(Tables.documents(s, dir)), "url", "doc_id",
        delayMs = 1000L, nWorkers = 4)),
    // Recrawl priority (r10): events as a fetch log over 35 synthetic
    // pages (event_type x user bucket); mean inter-observation interval
    // -> next-due time + hot/warm/cold tier (thresholds chosen inside
    // the sf0.01 interval spread so all three tiers appear).
    "recrawl_priority" -> ((s, dir) =>
      graft.ingest.Frontier.recrawl(
        Tables.events(s, dir).withColumn("page",
          concat(col("event_type"), lit("/"), (col("user_id") % 7).cast("string"))),
        "page", "ts", hotMs = 8600000L, warmMs = 9600000L)),
    // Domain-level quality flags (r10): mean per-doc quality by eTLD+1
    // with a min-docs evidence floor -> blocklist candidates. At sf0.01
    // the floor (0.644) splits the fixture domains: openweb.org flags,
    // example.com clears, the 50-doc domains sit under minDocs.
    "domain_quality" -> ((s, dir) =>
      graft.pipeline.Curation.domainQuality(
        withFixtureUrls(Tables.documents(s, dir)), "url", "text",
        minDocs = 60L, floor = 0.644)),
    // The signal made actionable (r10): same flags, composed with the
    // broadcast anti-join cut — at sf0.01 openweb.org's 100 docs drop.
    "domain_quality_exclusion" -> ((s, dir) =>
      graft.pipeline.Curation.excludeFlaggedDomains(
          withFixtureUrls(Tables.documents(s, dir)), "url", "text",
          minDocs = 60L, floor = 0.644)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),
  )

  def oracleSql: Map[String, String] = Map(
    "canonical_urls" ->
      s"""$urlValuesCte
         |SELECT CAST(id AS BIGINT) AS id, url,
         |  ${graft.ingest.Urls.sqlCanonicalize("url")} AS canon
         |FROM d ORDER BY id""".stripMargin,
    "canonical_url_dedup" ->
      s"""$urlValuesCte,
         |c AS (SELECT CAST(id AS BIGINT) AS id,
         |        ${graft.ingest.Urls.sqlCanonicalize("url")} AS canon
         |      FROM d)
         |SELECT id, canon, MIN(id) OVER (PARTITION BY canon) AS keeper_id,
         |  CAST(id = MIN(id) OVER (PARTITION BY canon) AS INT) AS is_keeper
         |FROM c ORDER BY id""".stripMargin,
    "ingest_articles" ->
      """SELECT * FROM (VALUES
        |  ('Title One', 'https://ex.com/a/1', 'Body 1.',
        |   'https://ex.com/list', '2024-01-01'),
        |  ('Title Two', 'https://ex.com/a/2', E'Body 2a.\nBody 2b.',
        |   'https://ex.com/list', CAST(NULL AS VARCHAR))
        |) t(title, sources, content, source, published_at)
        |ORDER BY sources""".stripMargin,
    "ingest_dedup_antijoin" ->
      """SELECT doc_id FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents e
        |                  WHERE e.doc_id % 3 = 0 AND e.text = d.text)
        |ORDER BY doc_id""".stripMargin,
    "parse_published" -> {
      val values = graft.IngestFixture.rawDates
        .map(r => s"('${r.replace("'", "''")}')").mkString(", ")
      s"""SELECT raw, strftime(${Dates.duckDbParse("raw")}, '%Y-%m-%d %H:%M:%S') AS ts_str
         |FROM (VALUES $values) t(raw)
         |ORDER BY raw""".stripMargin
    },
    "parse_published_freetext" -> {
      val values = graft.IngestFixture.rawDatesFree
        .map(r => s"('${r.replace("'", "''")}')").mkString(", ")
      s"""SELECT raw, strftime(${Dates.duckDbParse("raw")}, '%Y-%m-%d %H:%M:%S') AS ts_str
         |FROM (VALUES $values) t(raw)
         |ORDER BY raw""".stripMargin
    },
    "events_hourly" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "events_sliding" ->
      """SELECT ws, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - (k.k * INTERVAL '15 MINUTE') AS ws
        |  FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
        |  WHERE ts IS NOT NULL)
        |GROUP BY ws ORDER BY ws""".stripMargin,
    "events_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "events_props_json" ->
      """SELECT event_type, COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // approx_distinct_users: HLL++ is engine-specific — no oracle; the
    // rsd error bound vs exact counts is asserted in StreamingSpec.
    // hll_distinct_users: the graft HLL is engine-REPRODUCIBLE, so its
    // estimate carries a full oracle.
    "hll_distinct_users" ->
      graft.relational.Hll.sqlDistinctWithExact("events", "user_id", "event_type"),
    // cms_word_counts: Count-Min cells are md5-prefix hashes and the
    // counters pure integers — the estimates replay exactly.
    "cms_word_counts" ->
      graft.relational.CountMin.sqlWordCounts("documents", 30),
    "events_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
        |       c.event_id AS click_id, c.ts AS click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND p.ts IS NOT NULL AND c.ts IS NOT NULL
        |ORDER BY purchase_id, click_id""".stripMargin,
    "events_asof_join" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
        |       c.event_id AS click_event_id, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY event_id""".stripMargin,
    "sample_deterministic" ->
      """SELECT doc_id, source,
        |  CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS BIGINT) AS bucket
        |FROM documents
        |WHERE ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,
    "balanced_sample" ->
      """SELECT label, vec_id FROM (
        |  SELECT label, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM embeddings)
        |WHERE rn <= 20 ORDER BY label, vec_id""".stripMargin,
    "curation_quota" ->
      """SELECT doc_id, source, n_chars, rk FROM (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY source, rk""".stripMargin,
    "domain_caps" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, n_chars, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("n_chars"), "url", "d")},
         |r AS (
         |  SELECT doc_id, domain, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY domain
         |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
         |  FROM d)
         |SELECT doc_id, domain, n_chars, rk FROM r WHERE rk <= 50
         |ORDER BY domain, rk""".stripMargin,
    "domain_caps_incremental" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq.empty, "url", "d")},
         |r AS (
         |  SELECT doc_id, domain,
         |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id ASC) AS rk
         |  FROM d)
         |SELECT doc_id, domain FROM r WHERE rk <= 50
         |ORDER BY doc_id""".stripMargin,
    "domain_blocklist" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, source, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("source"), "url", "d")}
         |SELECT doc_id, source FROM d
         |WHERE domain NOT IN ('example.com', 'foo.co.uk')
         |ORDER BY doc_id""".stripMargin,
    "domain_distribution" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("url"), "url", "d")},
         |h AS (SELECT doc_id, domain, ${graft.ingest.Urls.sqlHost("url")} AS host FROM d),
         |g AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
         |      FROM h GROUP BY domain)
         |SELECT domain, n_docs, n_hosts,
         |  round(n_docs * 100.0 / SUM(n_docs) OVER (), 4) AS pct
         |FROM g ORDER BY n_docs DESC, domain""".stripMargin,
    "host_link_graph" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlHostGraph("dh", "doc_id")}""".stripMargin,
    "host_link_graph_incremental" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlHostGraph("dh", "doc_id")}""".stripMargin,
    "anchor_texts" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlAnchorTerms("dh", "doc_id", 5)}""".stripMargin,
    "web_trustrank" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlWebTrustRank("dh", "doc_id",
              Seq("openweb.org", "data.net"))}""".stripMargin,
    "web_trustrank_earlystop" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlWebTrustRankEarlyStop("dh", "doc_id",
              Seq("openweb.org", "data.net"),
              tolFp = 100000000000L, maxIterations = 10)}""".stripMargin,
    "host_communities_earlystop" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlHostCommunitiesEarlyStop("dh", "doc_id",
              maxChurn = 0L, maxRounds = 8)}""".stripMargin,
    "web_spam_mass_earlystop" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlWebSpamMassEarlyStop("dh", "doc_id",
              Seq("openweb.org", "data.net"),
              tolFp = 100000000000L, maxIterations = 10)}""".stripMargin,
    // Incremental == batch: the oracle for the maintained-state run IS
    // the one-shot chain over all documents — merged per-batch edge
    // partials must reproduce it exactly.
    "web_spam_mass_incremental" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlWebSpamMassEarlyStop("dh", "doc_id",
              Seq("openweb.org", "data.net"),
              tolFp = 100000000000L, maxIterations = 10)}""".stripMargin,
    "host_communities_incremental" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |dh AS (
         |  SELECT doc_id, $sqlFixtureUrl AS url, $sqlLinkHtml AS html
         |  FROM documents),
         |${graft.ingest.Links.sqlHostCommunitiesEarlyStop("dh", "doc_id",
              maxChurn = 0L, maxRounds = 8)}""".stripMargin,
    "sitemap_entries" -> {
      s"""WITH sm AS (
         |  SELECT doc_id, $sqlSitemapXml AS xml
         |  FROM documents),
         |${graft.sources.Sitemap.sqlEntries("sm", "doc_id")}""".stripMargin
    },
    "sitemap_frontier" -> {
      val rulesRows = RobotsRulesFixture.rules
        .map { case (h, r, p) => s"('$h', '$r', '$p')" }.mkString(",\n    ")
      s"""WITH sm AS (
         |  SELECT doc_id, $sqlSitemapXml AS xml
         |  FROM documents),
         |rr(host, rule, prefix) AS (FROM (VALUES
         |    $rulesRows)),
         |${graft.sources.Sitemap.sqlFrontier("sm", "rr", "doc_id")}""".stripMargin
    },
    "robots_parse" ->
      s"""WITH rb AS (
         |  SELECT doc_id, $sqlRobotsTxt AS robots_txt
         |  FROM documents),
         |${graft.ingest.Robots.sqlParse("rb", "graftbot", "doc_id",
              "robots_txt")}""".stripMargin,
    "robots_sitemaps" ->
      s"""WITH rb AS (
         |  SELECT doc_id, $sqlRobotsTxt AS robots_txt
         |  FROM documents),
         |${graft.ingest.Robots.sqlSitemapPointers("rb", "doc_id",
              "robots_txt")}""".stripMargin,
    "url_spam_scores" ->
      s"""WITH u AS (
         |  SELECT doc_id, $sqlSpamUrl AS url
         |  FROM documents)
         |SELECT doc_id,
         |  round(${graft.ingest.Urls.sqlSpamScore("url")}, 4) AS spam_score,
         |  (round(${graft.ingest.Urls.sqlSpamScore("url")}, 4) >= 1.0) AS blocked
         |FROM u ORDER BY doc_id""".stripMargin,
    "canonical_link_dedup" ->
      s"""WITH cd_t AS (
         |  SELECT doc_id, url, $sqlCanonicalHtml AS html
         |  FROM (SELECT doc_id, source, $sqlFixtureUrl AS url FROM documents)),
         |${graft.ingest.Links.sqlCanonicalDedup("cd_t")}""".stripMargin,
    "canonical_link_dedup_incremental" ->
      s"""WITH cdi_t AS (
         |  SELECT doc_id, url, $sqlCanonicalHtml AS html
         |  FROM (SELECT doc_id, source, $sqlFixtureUrl AS url FROM documents)),
         |${graft.ingest.Links.sqlCanonicalDedupIncremental(
             "(SELECT * FROM cdi_t WHERE doc_id < 251)",
             "(SELECT * FROM cdi_t WHERE doc_id >= 251)")}""".stripMargin,
    "robots_exclusion" -> {
      val rulesRows = RobotsRulesFixture.rules
        .map { case (h, r, p) => s"('$h', '$r', '$p')" }.mkString(",\n    ")
      s"""WITH u AS (
         |  SELECT doc_id, $sqlRobotsUrl AS url
         |  FROM documents),
         |rr(host, rule, prefix) AS (FROM (VALUES
         |    $rulesRows))
         |${graft.ingest.Robots.sqlDecisions("u", "url", "rr")}
         |ORDER BY doc_id""".stripMargin
    },
    "release_run" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (SELECT doc_id, source, text, $sqlRobotsUrl AS url
         |      FROM documents),
         |rr(host, rule, prefix) AS (FROM (VALUES
         |    ${RobotsRulesFixture.rules
              .map { case (h, r, p) => s"('$h', '$r', '$p')" }
              .mkString(",\n    ")})),
         |${graft.pipeline.Release.sqlRun(
              "SELECT md5(text) AS h FROM documents WHERE doc_id % 97 = 0",
              Seq("example.com"), "rr", cap = 50, shardBudget = 2048L)}""".stripMargin,
    "compliance_sweep" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (SELECT doc_id, source, text, $sqlRobotsUrl AS url
         |      FROM documents),
         |rr(host, rule, prefix) AS (FROM (VALUES
         |    ${RobotsRulesFixture.rules
              .map { case (h, r, p) => s"('$h', '$r', '$p')" }
              .mkString(",\n    ")})),
         |${graft.pipeline.Compliance.sqlFlagsCtes(
              "SELECT md5(text) AS h FROM documents WHERE doc_id % 97 = 0",
              Seq("example.com"), "rr")}
         |SELECT doc_id, source FROM fl WHERE f1 AND f2 AND f3
         |ORDER BY doc_id""".stripMargin,
    "compliance_funnel" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (SELECT doc_id, source, text, $sqlRobotsUrl AS url
         |      FROM documents),
         |rr(host, rule, prefix) AS (FROM (VALUES
         |    ${RobotsRulesFixture.rules
              .map { case (h, r, p) => s"('$h', '$r', '$p')" }
              .mkString(",\n    ")})),
         |${graft.pipeline.Compliance.sqlFlagsCtes(
              "SELECT md5(text) AS h FROM documents WHERE doc_id % 97 = 0",
              Seq("example.com"), "rr")}
         |SELECT count(*) AS n_raw,
         |  CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_after_takedowns,
         |  CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_after_blocklist,
         |  CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_after_robots
         |FROM fl""".stripMargin,
    "takedown_requests" ->
      """SELECT doc_id, source FROM documents
        |WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 97 = 0)
        |ORDER BY doc_id""".stripMargin,
    "pii_credit_cards" ->
      graft.pipeline.Pii.sqlCreditCards("documents", "doc_id", sqlCcText),
    "mojibake_repair" ->
      graft.text.Encoding.sqlRepair("documents", "doc_id", sqlMojText),
    "encoding_hygiene" ->
      graft.text.Encoding.sqlHygiene("documents", "doc_id", sqlHygieneText),
    "crawl_frontier" ->
      graft.ingest.Frontier.sqlSchedule("documents", "doc_id", sqlFixtureUrl,
        delayMs = 1000L, nWorkers = 4),
    "redirect_chains" ->
      s"""WITH rdu AS (
         |  SELECT 'https://r.example/p/' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents),
         |rdm AS (
         |  SELECT 'https://r.example/p/' || CAST(doc_id AS VARCHAR) AS src_url,
         |    'https://r.example/p/' || CAST(CASE WHEN doc_id % 5 = 3
         |      THEN doc_id + 1 ELSE doc_id - 1 END AS VARCHAR) AS dst_url
         |  FROM documents WHERE doc_id % 5 <> 0),
         |${graft.ingest.Redirects.sqlChains("rdu", "rdm")}""".stripMargin,
    "crawl_delay_schedule" -> {
      val rows = HostRobotsRows
        .map { case (h, t) => s"('$h', '${t.replace("'", "''")}')" }
        .mkString(",\n    ")
      s"""WITH hr(host, robots_txt) AS (FROM (VALUES
         |    $rows)),
         |dl AS (
         |  WITH ${graft.ingest.Robots.sqlCrawlDelays(
                   "hr", "graftbot", "host", "robots_txt")}),
         |${graft.ingest.Frontier.sqlScheduleWithDelays(
             s"(SELECT doc_id, $sqlFixtureUrl AS url FROM documents)",
             "doc_id", "url", "dl")}""".stripMargin
    },
    "recrawl_priority" ->
      graft.ingest.Frontier.sqlRecrawl("events",
        "(event_type || '/' || CAST(user_id % 7 AS VARCHAR))", "ts",
        hotMs = 8600000L, warmMs = 9600000L),
    "domain_quality" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, text, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("text"), "url", "d")}
         |${graft.pipeline.Curation.sqlDomainQuality("d", "text",
             minDocs = 60L, floor = 0.644)}""".stripMargin,
    "domain_quality_exclusion" ->
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u AS (
         |  SELECT doc_id, source, text, $sqlFixtureUrl AS url
         |  FROM documents),
         |${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("source", "text"), "url", "d")},
         |q AS (
         |${graft.pipeline.Curation.sqlDomainQuality("d", "text",
             minDocs = 60L, floor = 0.644)})
         |SELECT doc_id, source FROM d
         |WHERE COALESCE(domain, '') NOT IN (SELECT domain FROM q WHERE flagged)
         |ORDER BY doc_id""".stripMargin,
  )
}
