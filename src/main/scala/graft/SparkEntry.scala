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

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is deterministic (total orderBy with
  * tie-breaks) and every numeric output is either exact (BIGINT counts,
  * integer-cents sums — see [[graft.relational.Money]]) or rounded
  * identically on both sides, so the driver's DuckDB hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Source distribution (reference `app.py:74-82`) — the reference's
    * simplest complete query: scan → hash agg → pct window → sort. */
  def entry(spark: SparkSession): DataFrame =
    SourceDistribution(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dashboard parity (reference app.py) ----
    "source_distribution" -> ((s, dir) =>
      SourceDistribution(Tables.documents(s, dir))),
    "word_frequencies" -> ((s, dir) =>
      WordFrequencies(Tables.documents(s, dir))),
    "timeline_daily" -> ((s, dir) =>
      Timeline(Tables.events(s, dir), "ts")),
    "recent_events" -> ((s, dir) =>
      RecentArticles(Tables.events(s, dir).select(col("event_id"), col("ts"), col("event_type"), col("user_id")),
        5, col("ts").desc, col("event_id").desc)),
    "totals" -> ((s, dir) => Totals.counts(s, dir)),
    // ---- relational coverage (TPC-H-ish) ----
    "q1_pricing_summary" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "revenue_per_region" -> ((s, dir) => Relational.revenuePerRegion(s, dir)),
    "top_orders_per_priority" -> ((s, dir) => Relational.topOrdersPerPriority(s, dir)),
    "distinct_counts" -> ((s, dir) => Relational.distinctCounts(s, dir)),
    "customers_without_big_orders" -> ((s, dir) => Relational.customersWithoutBigOrders(s, dir)),
    "set_ops" -> ((s, dir) => Relational.setOps(s, dir)),
    "daily_order_deltas" -> ((s, dir) => Relational.dailyOrderDeltas(s, dir)),
    "pricing_rollup" -> ((s, dir) => Relational.pricingRollup(s, dir)),
    "pricing_cube" -> ((s, dir) => Relational.pricingCube(s, dir)),
    "order_percentiles" -> ((s, dir) => Relational.orderPercentiles(s, dir)),
    // sketch-based percentiles: engine-specific values, rows-only check;
    // error vs the exact form bounded in RelationalSpec
    "order_percentiles_approx" -> ((s, dir) => Relational.orderPercentilesApprox(s, dir)),
    // Engine-reproducible quantile sketch (vs the t-digest above): an
    // integer cent-histogram whose ESTIMATE hash-matches DuckDB; width
    // $100 -> error < $100 absolute, spec-pinned against the exact form.
    "order_percentiles_sketch" -> ((s, dir) => {
      import graft.relational.QuantileSketch
      val w = 10000L
      val sk = QuantileSketch.sketch(Tables.orders(s, dir),
        QuantileSketch.cents(col("o_totalprice")), w, "o_orderpriority")
      QuantileSketch.quantiles(sk, w,
          Seq("p50c" -> 0.5, "p90c" -> 0.9, "p99c" -> 0.99), "o_orderpriority")
        .select(col("o_orderpriority"), col("n").as("n_orders"),
          round(col("p50c") / 100.0, 2).as("p50"),
          round(col("p90c") / 100.0, 2).as("p90"),
          round(col("p99c") / 100.0, 2).as("p99"))
    }),
    // Skew mitigation ops, oracle-proven value-identical to their direct
    // forms (the salt is an internal spreading detail).
    "salted_group_count" -> ((s, dir) => Relational.saltedGroupCount(s, dir)),
    "salted_join_agg" -> ((s, dir) => Relational.saltedJoinAgg(s, dir)),
    // Integer fixed-point PageRank over the part co-purchase graph:
    // iterative co-partitioned RDD rounds (one exchange per iteration),
    // long-division arithmetic -> bit-identical across engines, so an
    // ITERATIVE algorithm gets a full hash-checked oracle (the DuckDB
    // side unrolls the 10 rounds as a WITH-chain).
    "part_pagerank" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseParts(Tables.lineitem(s, dir))),
    // F130: the fixed-iteration contract, measured — per-round L1/L-inf
    // residuals + changed-node counts for the rank loop above, so "10
    // rounds converged" is a hash-checked decay curve, not an argument.
    "part_pagerank_convergence" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseConvergence(Tables.lineitem(s, dir))),
    // F137 (r13): the F130 curve put to WORK — tolerance-driven early
    // stop. The loop exits when the L1 residual crosses 1e-6 of total
    // mass (measured: round 7 of 10); both the early-stopped vector and
    // the data-dependent stop round are hash-checked (the oracle derives
    // the stop from the same rule over the unrolled chain).
    "part_pagerank_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseEarlyStop(Tables.lineitem(s, dir))),
    // TrustRank + spam mass: the host-graph anti-spam triple (seeded
    // trust propagation vs open PageRank) on the same graph fixture.
    "trust_propagation" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseSpamMass(Tables.lineitem(s, dir))),
    // F137 completed across the FOURTH iterative family (r13): the
    // spam-mass triple with both loops tolerance-stopped on their own
    // residual curves — two independent data-dependent stop rounds,
    // both derived by the oracle from the same rules.
    "trust_propagation_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseSpamMassEarlyStop(
        Tables.lineitem(s, dir))),
    // Label-propagation communities over the co-purchase graph: the
    // deterministic synchronous variant (smallest-label mode ties) —
    // the link-farm-cluster / per-community-cap signal.
    // 3 rounds: labels flood 3 hops — the dense co-purchase graph's
    // communities stabilize within that; each round is a full
    // |E|-vote shuffle.
    "part_communities" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunities(Tables.lineitem(s, dir), 3)),
    // F135: the convergence curve for the label family — per-round
    // churn + community count, so the fixed 3-round choice above is a
    // hash-checked "no/low churn by round 3", not an argument.
    "part_communities_convergence" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunitiesConvergence(Tables.lineitem(s, dir), 3)),
    // F137 (r13): churn-driven early stop for the label family — stop
    // when ≤1200 nodes changed label (measured: round 3 of a 5-round
    // budget; this dense graph never reaches zero churn in budget,
    // exactly what a positive threshold is for).
    "part_communities_earlystop" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunitiesEarlyStop(Tables.lineitem(s, dir))),
    // HITS hubs/authorities on the DIRECTED bipartite order->part graph
    // (orders = pure hubs, parts = pure authorities) — L1-normalized
    // integer half-steps, full unrolled-CTE oracle like the rank family.
    // 5 rounds: HITS is power iteration on A^T·A and has visibly
    // converged here; each extra round costs 2 L1-total actions.
    "order_part_hits" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHits(Tables.lineitem(s, dir), 5)),
    // F136: the half-step residual curve — "visibly converged" above
    // becomes per-round hub/auth L1 deltas, hash-checked. Completes the
    // measured fixed-iteration contract across all three iterative
    // families (rank F130, labels F135, HITS here).
    "order_part_hits_convergence" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHitsConvergence(
        Tables.lineitem(s, dir), 5)),
    // F137 (r13): combined hub+auth residual early stop for HITS —
    // tolerance 3e9 fp (~0.3% of the two normalized masses), measured
    // crossing at round 5 of an 8-round budget.
    "order_part_hits_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHitsEarlyStop(Tables.lineitem(s, dir))),
    // ---- [EXT] text analysis ----
    "text_stats" -> ((s, dir) => TextAnalysis.stats(Tables.documents(s, dir))),
    // Flesch reading ease in exact integer micro-points — the classic
    // edu-quality feature; single-regex counts, truncating long DIVs.
    "readability_scores" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir))),
    // Unicode NFC canonicalization (r9) — the stage ahead of dedup keys
    // and tokenization: NFD suffixes are planted on odd doc ids (composed
    // NFC on even), and norm_md5 proves both engines collapse them to the
    // same canonical bytes while raw_md5 pins that they differed. Full
    // oracle via DuckDB's nfc_normalize; NormalizeSpec pins the dedup
    // catch (an NFD/NFC duplicate pair exact dedup misses raw and finds
    // post-normalization).
    "normalize_text" -> ((s, dir) => {
      val suffix = when(col("doc_id") % 2 === 0,
        lit(" café Ångström"))     // NFC: composed é, Å, ö
        .otherwise(lit(" café Ångström")) // NFD: combining marks
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(concat(col("text"), suffix)).as("raw_md5"),
          md5(org.apache.spark.sql.graft.ArrayFunctions.nfcNormalize(
            concat(col("text"), suffix))).as("norm_md5"))
        .orderBy(col("doc_id"))
    }),
    "lang_distribution" -> ((s, dir) => TextAnalysis.langDistribution(Tables.documents(s, dir))),
    // Writing-system profile over a planted multi-script corpus (the
    // ASCII fixture text stands in for latin docs; ids ≢ 0 mod 5 swap in
    // a non-latin sample so counts AND the dominant script vary).
    "script_mix" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(ScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.scriptMix(planted)
    }),
    // Character-diversity quality tagger (r10): unigram codepoint
    // entropy in integer micro-nats (per-term ⌊ln·1e6⌋ lift — the
    // LmScore discipline, so the transcendental never meets a float
    // sum). Fixture reuses the script samples so supplementary-plane
    // codepoints (𠀀, 😀) exercise the codepoint-vs-UTF-16 trap.
    "char_entropy" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(ScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.charEntropy(planted)
    }),
    "doc_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    // Language-vs-script disagreement audit over a planted mix of
    // transliterated, mislabeled, consistent, and abstaining docs.
    // n-gram language ID over fitted per-language trigram profiles —
    // the Cavnar-Trenkle heuristic with the printed-constant oracle.
    "langid_ngram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val prof = TextAnalysis.fitLangProfiles(docs)
      FittedOracle.langIdProfiles = Some(prof)
      TextAnalysis.langIdNgram(docs, prof)
    }),
    "langid_confusion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val prof = TextAnalysis.fitLangProfiles(docs)
      FittedOracle.langConfusionProfiles = Some(prof)
      TextAnalysis.langIdConfusion(docs, prof)
    }),
    "lang_script_consistency" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(LangScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.langScriptConsistency(planted)
    }),
    // ---- [EXT] dedup ----
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir), "text", "doc_id")),
    // Soft dedup: every copy kept, weighted 1/n_copies in integer micro-
    // units — the data-constrained-training alternative to dropping.
    "dedup_weights" -> ((s, dir) =>
      Dedup.duplicationWeights(Tables.documents(s, dir), "doc_id", "text")),
    // Incremental exact dedup: docs < 250 are history (only their
    // content-hash index is consulted), the rest arrive as a batch —
    // O(batch) per batch at any history size. Full oracle.
    "dedup_exact_incremental" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      Dedup.exactIncremental(all.filter(col("doc_id") >= 250), "doc_id", "text",
        Dedup.exactIndex(all.filter(col("doc_id") < 250), "doc_id", "text"))
    }),
    "jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", "source", 0.9)),
    // Blockless EXACT threshold pairs via prefix filtering — the oracle
    // is brute force over ALL pairs, proving the pruning lossless.
    "similarity_join_exact" -> ((s, dir) =>
      graft.dedup.SetSimJoin.jaccardJoin(Tables.documents(s, dir), "doc_id", "text", 0.9)),
    // Incremental face: batch (doc_id >= 250) pairs against the frozen
    // history prefix index + within-batch — never history vs history.
    // Oracle: the full brute force restricted to pairs whose larger id
    // is in the batch (append-only id contract).
    "similarity_join_incremental" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      graft.dedup.SetSimJoin.incremental(
        all.filter(col("doc_id") >= 250), "doc_id", "text", 0.9,
        graft.dedup.SetSimJoin.index(
          all.filter(col("doc_id") < 250), "doc_id", "text", 0.9))
    }),
    "dedup_near_minhash" -> ((s, dir) =>
      Dedup.nearDupMinHash(Tables.documents(s, dir), "doc_id", "text", 0.9)),
    "simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", 3)),
    "ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text", "source", 3, 0.8)),
    "dedup_keepers" -> ((s, dir) =>
      Dedup.nearDupKeepers(Tables.documents(s, dir), "doc_id", "text", "source", 0.9)),
    // Same clusters, best-quality representative: production dedup keeps
    // the cleanest copy, not the lowest id.
    "dedup_keepers_quality" -> ((s, dir) =>
      Dedup.nearDupKeepersByQuality(
        Tables.documents(s, dir), "doc_id", "text", "source", 0.9)),
    // End-to-end corpus cleaning: quality floor -> language gate ->
    // near-dup keepers. One oracle pins the whole composition.
    "corpus_clean" -> ((s, dir) =>
      graft.pipeline.CorpusClean(Tables.documents(s, dir))),
    // Same composition with the corpus-wide MinHash->verify->CC dedup feed
    // (no blocking key) — the form you'd run at 100 TB. Oracle: corpus-wide
    // exact quadratic CC (LSH misses a J>=0.9 pair with prob ~4e-8).
    "corpus_clean_scaled" -> ((s, dir) =>
      graft.pipeline.CorpusClean.scaled(Tables.documents(s, dir))),
    // corpus_clean with the TRAINED classifier gate in front: the model's
    // rejects never reach the heuristic filters or the dedup pair feed.
    // The oracle replays classifier training AND the cleaning chain in
    // one WITH-chain — the full classifier-gated pipeline is hash-checked.
    "corpus_clean_classified" -> ((s, dir) =>
      graft.pipeline.CorpusClean.withClassifierGate(Tables.documents(s, dir))),
    // The 100 TB composition end-to-end: MinHash banding -> exact verify
    // -> connected components, corpus-wide (no blocking key). The oracle
    // runs the exact quadratic CC: LSH misses a J>=0.9 pair with prob
    // ~4e-8 per pair under pinned seeds, so the outputs hash-match.
    "dedup_keepers_scaled" -> ((s, dir) =>
      Dedup.nearDupKeepersScaled(Tables.documents(s, dir), "doc_id", "text", 0.9)),
    // F134: the production LSH safety valve — band buckets over the cap
    // are dropped from candidate generation, bounding the quadratic mass
    // of degenerate corpora. The cap (4096) NEVER binds at any driver
    // fixture scale (spec-pinned equal to the uncapped form), so the
    // exact-CC oracle stays fully valid; it binds only in the m100-class
    // regimes the true-scale audit documented.
    "dedup_keepers_capped" -> ((s, dir) =>
      Dedup.nearDupKeepersScaled(Tables.documents(s, dir), "doc_id", "text",
        0.9, maxBucket = 4096)),
    // Cluster-size histogram of the scaled dedup path — the audit
    // artifact, and another end-to-end oracle check of MinHash->CC.
    "dedup_cluster_sizes" -> ((s, dir) =>
      Dedup.clusterSizeHistogram(
        Dedup.nearDupKeepersScaled(Tables.documents(s, dir), "doc_id", "text", 0.9))),
    // Incremental snapshot dedup: the odd-id half arrives as a new batch
    // and dedups against the even-id history via its signature index
    // alone — no CC recompute over history. LSH internals -> rows-only;
    // union-equivalence to the full recompute pinned in DedupSpec.
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val index = Dedup.signatureTable(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Dedup.newKeepers(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", index, 0.9)
    }),
    // Winnowing partial-overlap pairs: containment detection whole-set
    // MinHash misses. md5-prefix fingerprints (r7) -> the sliding
    // window-min set replays relationally, FULL oracle; guarantees
    // pinned in WinnowSpec.
    "winnow_overlaps" -> ((s, dir) =>
      graft.dedup.Winnow.overlaps(Tables.documents(s, dir), "doc_id", "text")),
    // ---- [EXT] exact sub-document dedup (paragraph / token-span) ----
    // Keep-first paragraph dedup on a multi-paragraph fixture (the corpus
    // fixtures are single-line): repeated license/nav/footer paragraphs
    // are removed from every doc after their first occurrence; documents
    // rebuild from kept paragraphs in order. Plain window+groupBy -> full
    // DuckDB oracle.
    "paragraph_dedup" -> ((s, _) => {
      import s.implicits._
      graft.dedup.ParagraphDedup.dedupParagraphs(
        ParagraphFixture.docs.toDF("doc_id", "text"), "doc_id", "text")
    }),
    // RefinedWeb df-threshold policy: only paragraphs occurring >= 3
    // times corpus-wide are deduped; the 2-occurrence repeat survives in
    // both its docs (vs paragraph_dedup, which removes it).
    "paragraph_dedup_df" -> ((s, _) => {
      import s.implicits._
      graft.dedup.ParagraphDedup.dedupParagraphs(
        ParagraphFixture.docs.toDF("doc_id", "text"), "doc_id", "text",
        minOccurrences = 3L)
    }),
    // Incremental paragraph dedup: docs 1-4 are history (only their
    // norm-hash index is consulted), docs 5-8 arrive as a batch and
    // dedup against the index + keep-first among themselves — history
    // text is never re-read. Full oracle (the probe is plain relational
    // algebra).
    "paragraph_dedup_incremental" -> ((s, _) => {
      import s.implicits._
      val all = ParagraphFixture.docs.toDF("doc_id", "text")
      val hist = all.filter(col("doc_id") <= 4)
      val batch = all.filter(col("doc_id") >= 5)
      graft.dedup.ParagraphDedup.dedupParagraphsIncremental(
        batch, "doc_id", "text",
        graft.dedup.ParagraphDedup.paragraphIndex(
          graft.dedup.ParagraphDedup.paragraphUnits(hist, "doc_id", "text")))
    }),
    // The removed-spans audit: every repeated paragraph with occurrence/
    // doc counts and its keeper position.
    "paragraph_dedup_audit" -> ((s, _) => {
      import s.implicits._
      graft.dedup.ParagraphDedup.audit(
        graft.dedup.ParagraphDedup.paragraphUnits(
          ParagraphFixture.docs.toDF("doc_id", "text"), "doc_id", "text"))
    }),
    // Same operator at token-block granularity over the corpus table (the
    // Lee-et-al. exact-span form for paragraph-free text): 20-token
    // blocks, keep-first. Exercises the corpus-scale path + oracle.
    "span_dedup" -> ((s, dir) =>
      graft.dedup.ParagraphDedup.dedupSpans(Tables.documents(s, dir),
        "doc_id", "text", 20)),
    // Overlapping-stride substring dedup (the ExactSubstr approximation):
    // 20-token windows every 5 tokens, md5-keyed marking, removed
    // intervals merged per doc before the token-level rebuild. Catches
    // block-boundary-straddling duplicates span_dedup misses
    // (SubstringDedupSpec plants one).
    "substring_dedup" -> ((s, dir) =>
      graft.dedup.SubstringDedup.cleaned(Tables.documents(s, dir),
        "doc_id", "text", width = 20, stride = 5)),
    // WHAT-was-removed report for the same parameters: every repeated
    // window with occurrence/doc counts and its keeper position.
    "substring_dedup_audit" -> ((s, dir) =>
      graft.dedup.SubstringDedup.audit(Tables.documents(s, dir),
        "doc_id", "text", width = 20, stride = 5)),
    // Content-anchored variant: windows start where md5(lower(token)) ≡ 0
    // mod 5 — copies align at ANY offset (fixed-stride needs offsets to
    // agree mod stride), same expected 1/5 start density.
    "substring_dedup_anchored" -> ((s, dir) =>
      graft.dedup.SubstringDedup.cleaned(Tables.documents(s, dir),
        "doc_id", "text", width = 20, stride = 5, anchored = true)),
    // Incremental substring dedup: docs < 250 are history (only their
    // window-hash index is consulted — history text never re-read), the
    // rest arrive as a batch and dedup against the index + keep-first
    // among themselves. Full oracle (the probe is plain relational
    // algebra); union-equivalence with the full recompute is spec-pinned.
    "substring_dedup_incremental" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      graft.dedup.SubstringDedup.cleanedIncremental(
        all.filter(col("doc_id") >= 250), "doc_id", "text",
        graft.dedup.SubstringDedup.windowIndex(
          graft.dedup.SubstringDedup.windows(
            all.filter(col("doc_id") < 250), "doc_id", "text", 20, 5)),
        width = 20, stride = 5)
    }),
    // Completeness audit vs the TRUE ExactSubstr mass (r11): the truth
    // is the stride-1 minLen-gram marking (tiling argument —
    // SubstringDedup.coverage scaladoc), so the window-hash settings'
    // missed-duplicate mass is a measured per-mille, not a scaladoc
    // sentence. The (10, 1, false) row IS the truth setting — its
    // coverage_pm pins 1000 as a self-check.
    "substring_dedup_coverage" -> ((s, dir) =>
      graft.dedup.SubstringDedup.coverage(Tables.documents(s, dir),
        "doc_id", "text",
        Seq((20, 5, false), (20, 1, false), (20, 5, true), (10, 1, false)),
        minLen = 10)),
    // ---- [EXT] similarity search ----
    "knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Matryoshka truncation audit (r11): recall of prefix-truncated
    // (re-normalized) search vs the full 64-dim top-k, per width —
    // the store-narrowing decision as integer basis points; the full
    // width pins 10000 as the self-check row.
    "embedding_truncate_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.truncationRecall(emb, emb.filter(col("vec_id") % 50 === 0),
        Seq(4, 8, 16, 64), 5)
    }),
    "cosine_pairs" -> ((s, dir) => Similarity.cosinePairs(Tables.embeddings(s, dir), 0.4)),
    // Scalar int8 quantization (r10): per-vector symmetric scale, codes
    // via FLOOR(+0.5) (round-half modes differ across engines; floor is
    // unambiguous), fold-ordered reconstruction-error audit.
    "embedding_quantize" -> ((s, dir) =>
      Similarity.scalarQuantize(Tables.embeddings(s, dir))),
    // Search over the 4x-smaller store: brute-force kNN with the
    // candidates dequantized and the probes full-precision — the
    // adoption question as a query; recall vs the exact index is
    // additionally asserted in SimilaritySpec.
    "knn_quantized" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(Similarity.dequantized(emb),
        emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Contrastive training triplets: near-dup positives (both
    // orientations) + each anchor's top different-label negative with
    // the semi-hard flag — both feeds' proven mirrors composed.
    "contrastive_triplets" -> ((s, dir) =>
      Similarity.contrastiveTriplets(Tables.embeddings(s, dir), 0.4)),
    // Hard/semi-hard negative mining for contrastive training: per
    // anchor, top-k nearest DIFFERENT-label vectors, flagged semi-hard
    // when within the FaceNet margin of the nearest positive.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // ANN quality audit: per-probe recall of the IVF index against the
    // exact top-k — the tuning number for nlist/nprobe. Oracle via the
    // printed-centroid channel (both sides' mirrors already proven).
    "ann_recall_report" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.recallCenters = Some(centers)
      Similarity.recallReport(
        Similarity.knnBruteForce(emb, probes, 5),
        Ivf.knnIvfWith(centers, emb, probes, 5))
    }),
    // Margin-based bitext mining (r10) — the CCMatrix mutual-argmax
    // recipe across the parity-split embedding sets: cosine relative to
    // both sides' k-NN neighborhood density, mutual best, margin >= 1.05
    // (151 of 161 mutual pairs at sf0.01). Fold-ordered averages keep
    // the margins bit-identical across engines.
    "bitext_mine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bitextMine(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), 4, 1.05)
    }),
    // The corpus-scale bitext form (r10): candidates restricted to pairs
    // meeting in a shared fitted quantizer's lists (src probes nprobe=2,
    // tgt holds its own list — pairs meet at most once), same margin/
    // mutual machinery within the pool. Full oracle via printed
    // centroids; recall vs the exact miner pinned in SimilaritySpec.
    "bitext_mine_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.bitextCenters = Some(centers)
      Similarity.bitextMineIvf(centers, emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), 4, 1.05, 2)
    }),
    "embedding_dedup_keepers" -> ((s, dir) =>
      Similarity.embeddingDedupKeepers(Tables.embeddings(s, dir), 0.4)),
    // LSH-candidate feed -> exact verify -> CC: the 100 TB embedding-dedup
    // composition. FULL oracle since r8: DuckDB replays the sign buckets
    // from printed plane constants, so recall is part of the contract,
    // not luck; refinement vs the exact path stays pinned in
    // SimilaritySpec.
    "embedding_dedup_keepers_scaled" -> ((s, dir) =>
      Similarity.embeddingDedupKeepersScaled(Tables.embeddings(s, dir), 0.4)),
    // SemDeDup: k-means-partitioned semantic dedup — quadratic work bounded
    // structurally per cluster. FULL oracle since r9: the seeded
    // deterministic cluster fit is stashed in FittedOracle and its
    // centroids print into the DuckDB replay as exact constants;
    // SimilaritySpec still pins the refinement property vs exact keepers.
    "semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.semCenters = Some(centers)
      Similarity.semanticDedupKeepersWith(centers, emb, 0.4)
    }),
    "knn_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnLsh(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The deterministic half of knn_lsh with a FULL oracle: per-(vector,
    // table) sign buckets replayed in DuckDB from the printed plane
    // constants (exact double round-trip, same left-assoc accumulation).
    "lsh_bucket_assignments" -> ((s, dir) =>
      Similarity.lshBucketAssignments(Tables.embeddings(s, dir))),
    // knn_ivf: KMeans coarse-quantizer IVF. FULL oracle since r9: the
    // seeded deterministic fit is stashed and its centroids print into
    // the DuckDB replay (the r8 LSH plane-constant recipe); recall vs
    // brute force stays pinned in SimilaritySpec.
    "knn_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.ivfCenters = Some(centers)
      Ivf.knnIvfWith(centers, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The STORED IVF layout under the gate (r9): corpus written
    // list-partitioned, probe lists pushed as a partition filter — only
    // nprobe/nlist of the directories are scanned (SimilaritySpec pins
    // the PartitionFilters shape) — and the result must still equal the
    // in-memory knn_ivf, which the shared printed-centroid oracle
    // enforces.
    "knn_ivf_stored" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.ivfStoredCenters = Some(centers)
      // One scratch dir per (user, sf dir, Spark app) under a common
      // parent: the full sanitized dir string kills hashCode collisions
      // across sf dirs, and the app id isolates concurrent JVMs (a
      // Bench run beside a Verify run raced overwrite-vs-read on a
      // shared path). Reclamation is two-layered — a shutdown delete
      // for clean exits, and a stale-sibling sweep at registration so
      // dirs orphaned by CRASHED runs (OOM-kill skips shutdown hooks)
      // are reaped by the next run instead of accumulating forever.
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path =
        s"$parent/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(emb, centers, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The GROWING store (r10): history written with a quantizer fitted
    // on history ONLY, the batch appended under the frozen centers (the
    // FAISS `add` path — no refit, history files untouched), then
    // searched. Assignment is a pure function of (vector, centers), so
    // the printed-centroid oracle over the union corpus enforces
    // appended-store == in-memory-over-everything.
    "knn_ivf_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val centers = Ivf.fitCentroids(hist, 16)
      FittedOracle.appendCenters = Some(centers)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/append_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, centers, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), centers, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Store COMPACTION (r11): the grown store's many small per-list
    // files rewritten as one file per list (hash-repartition by list +
    // temp-dir swap) — content identical, layout minimal. The search
    // after compaction must equal the in-memory search under the same
    // frozen centers, which the shared printed-centroid oracle enforces
    // (IvfMaintenanceSpec additionally pins the one-file-per-list
    // layout and byte-level search identity before/after).
    "knn_ivf_compacted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val centers = Ivf.fitCentroids(hist, 16)
      FittedOracle.compactedCenters = Some(centers)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/compact_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, centers, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), centers, path)
      Ivf.compactStore(s, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Quantizer REFIT (r11): when ivf_list_stats says the corpus moved,
    // re-fit centers from the grown store, re-assign every vector,
    // rewrite list-partitioned (the FAISS retrain loop). Search under
    // the NEW centers over the refit store equals the in-memory search
    // over the same corpus — the refit-centers printed oracle.
    "knn_ivf_refit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val histCenters = Ivf.fitCentroids(hist, 16)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/refit_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, histCenters, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), histCenters, path)
      val centers = Ivf.refit(s, path, 16)
      FittedOracle.refitCenters = Some(centers)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The drift/imbalance audit of that frozen quantizer: per-list
    // history/batch occupancy + integer-ppm corpus share, EVERY list
    // present (empty ones read 0).
    "ivf_list_stats" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb.filter(col("vec_id") < 250), 16)
      FittedOracle.listStatsCenters = Some(centers)
      Ivf.listStats(emb, centers, col("vec_id") >= 250)
    }),
    // Topic-balanced subset: cap each EMBEDDING CLUSTER (printed-centroid
    // assignment) at k by the content-keyed md5 order — uniform sampling
    // would inherit the corpus's topic skew.
    "cluster_balanced_sample" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.clusterSampleCenters = Some(centers)
      Similarity.clusterBalancedSample(emb, centers, 40)
    }),
    // F132: embedding-cluster composition drift between two snapshot
    // stand-ins (vec_id parity) under ONE shared quantizer — the
    // release-to-release topic-mix audit, integer ppm shares.
    "cluster_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.driftCenters = Some(centers)
      Similarity.clusterDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 =!= 0), centers)
    }),
    // knn_pq: product-quantized ADC search (32x-compressed codes). FULL
    // oracle since r9 via printed codebooks; recall pinned in PqSpec.
    "knn_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.pqBooks = Some(books)
      Pq.knnPqWith(books, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The other half of ANN QA beside ann_recall_report: per-subspace
    // reconstruction error of the fitted codebooks, integer-lifted sums.
    "pq_distortion" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.distortionBooks = Some(books)
      Pq.distortionReport(emb, books)
    }),
    // knn_ivf_pq: IVF list pruning + ADC over codes — the billion-scale
    // composition. FULL oracle since r9 (printed centroids + codebooks);
    // recall pinned in PqSpec.
    "knn_ivf_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.ivfPqCenters = Some(centers)
      FittedOracle.ivfPqBooks = Some(books)
      Pq.knnIvfPqWith(centers, books, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
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
      graft.ingest.Links.canonicalDedupIncremental(
        all.filter(col("doc_id") >= 251),
        graft.ingest.Links.canonicalKeeperState(
          all.filter(col("doc_id") < 251)))
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
      graft.ingest.Links.webTrustRank(withLinkHtml(Tables.documents(s, dir)),
        Seq("openweb.org", "data.net"), tolFp = 100000000000L,
        maxIterations = 10)),
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
    "repetition_stats" -> ((s, dir) =>
      graft.pipeline.Curation.repetitionStats(Tables.documents(s, dir))),
    "curation_report" -> ((s, dir) =>
      graft.pipeline.Curation.report(Tables.documents(s, dir))),
    "boilerplate_ngrams" -> ((s, dir) =>
      TextAnalysis.frequentShingles(Tables.documents(s, dir), "text", 3, 5L)),
    // TF-IDF-flavored keyword extraction with integer-only ranking (the
    // rare-source gate is the IDF, so the result is engine-exact). Bigrams:
    // the fixtures' token vocabulary is corpus-wide, phrases discriminate.
    "distinctive_terms" -> ((s, dir) =>
      TextAnalysis.distinctiveTerms(Tables.documents(s, dir), "source", "text", 2, 3, 10)),
    // BM25 relevance scoring: per-row tf expressions + one corpus-stats
    // aggregate, top-k heap. Identical float expression tree (and ln) on
    // the DuckDB side, rounded to 4 decimals -> full oracle.
    "bm25_topk" -> ((s, dir) =>
      graft.text.Relevance.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "vector", "customer"), 15)),
    // Median/MAD robust outlier report per event type (exact interpolated
    // percentile == DuckDB quantile_cont, as order_percentiles pinned).
    "value_outliers" -> ((s, dir) =>
      EventWindows.valueOutliers(Tables.events(s, dir))),
    "value_histogram" -> ((s, dir) =>
      EventWindows.valueHistogram(Tables.events(s, dir), 10.0)),
    // Strictly-ordered funnel: step k counts only after step k-1's
    // first-touch time. view -> click -> purchase over the event stream.
    "event_funnel" -> ((s, dir) =>
      EventWindows.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))),
    // Day x type pivot with an EXPLICIT column contract (no distinct-scan).
    "events_pivot" -> ((s, dir) =>
      EventWindows.dailyTypePivot(Tables.events(s, dir),
        Seq("click", "error", "purchase", "signup", "view"))),
    // Quality-proportional deterministic sampling: bucket < quality*10000.
    "sample_weighted" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.sampleWeighted(docs, "text",
        TextAnalysis.qualityScore(col("text")))
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          graft.pipeline.Curation.sampleBucket(col("text")).as("bucket"))
        .orderBy(col("doc_id"))
    }),
    // F133: stratified exact-k — min(k, |source|) quality-biased rows
    // per source, one rank window on the group key.
    "weighted_reservoir_by_source" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      graft.pipeline.Curation.weightedReservoirPerGroup(docs, "source",
          "doc_id", "text", col("quality"), 5)
        .select(col("doc_id"), col("source"), col("quality"),
          col("res_clock"))
        .orderBy(col("doc_id"))
    }),
    // F131: the reservoir's mergeable-state face — two disjoint batch
    // reservoirs merged must equal the one-shot cut (the oracle IS the
    // one-shot form, so hash-equality proves the merge).
    "weighted_reservoir_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      val halves = Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0))
        .map(graft.pipeline.Curation.weightedReservoir(_, "doc_id", "text",
          col("quality"), 100))
      graft.pipeline.Curation.mergeReservoirs(halves, "doc_id", 100)
        .select(col("doc_id"), col("source"), col("quality"),
          col("res_clock"))
        .orderBy(col("doc_id"))
    }),
    // F128: exact-k weighted sampling without replacement (A-ES
    // exponential clocks) — quality-proportional budget cut, planned as
    // one TakeOrderedAndProject (the distributed reservoir).
    "weighted_reservoir" -> ((s, dir) => {
      // quality is computed ONCE below the reservoir: recomputing it
      // above the limit leaves Limit(Project(Project(Sort))) — the
      // CollapseProject diamond (BASELINE.md) — which misses the
      // TakeOrderedAndProject strategy patterns and degrades the top-k
      // into a full global range-sort (plan-pinned in PlanQualitySpec).
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      graft.pipeline.Curation.weightedReservoir(docs, "doc_id", "text",
          col("quality"), 100)
        .select(col("doc_id"), col("source"), col("quality"),
          col("res_clock"))
        .orderBy(col("doc_id"))
    }),
    // Whole-source mirror detection: shared distinct 3-gram counts per
    // source pair.
    "source_overlap_matrix" -> ((s, dir) =>
      TextAnalysis.sourceOverlapMatrix(Tables.documents(s, dir), "source", "text", 3)),
    // Vocabulary build + id encoding (OOV -> 0): cleaning -> ids -> packing.
    "vocab_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.encodeTokens(docs, "doc_id", "text",
        TextAnalysis.vocabulary(docs, "text", 20))
    }),
    "retention_cohorts" -> ((s, dir) =>
      EventWindows.retentionCohorts(Tables.events(s, dir))),
    // SCD2: the keyed change stream -> validity intervals (the layout AsOf
    // and RangeJoin consume). One shuffle, two window passes.
    "scd2_history" -> ((s, dir) =>
      graft.relational.Scd.history(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("state"))),
    // Morton interleave codes — the Z-order layout primitive; pure integer
    // bit arithmetic, reproduced exactly by the DuckDB oracle.
    "zorder_codes" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"),
        graft.sources.ZOrder.morton2(
          col("o_custkey") % 1024, col("o_orderkey") % 1024, 10).as("z"))
        .orderBy(col("o_orderkey"))),
    // Sampled estimate: deterministic md5-bucket subsample -> scaled
    // counts. The sample is engine-reproducible and the estimate one
    // rounded division, so this carries a FULL oracle (upgraded from
    // rows-only per the round-4 verdict); CurationSpec still pins the
    // estimate-vs-exact error on a planted corpus.
    "boilerplate_ngrams_sampled" -> ((s, dir) =>
      graft.pipeline.Curation.boilerplateSampled(Tables.documents(s, dir),
        "text", 3, 5L, 2000)),
    // Sampled source-overlap: the 100 TB form of source_overlap_matrix
    // (shingle-keyed deterministic sample -> scaled estimates). Full
    // oracle for the same reason.
    "source_overlap_sampled" -> ((s, dir) =>
      TextAnalysis.sourceOverlapSampled(Tables.documents(s, dir),
        "source", "text", 3, 2000)),
    // Data mixing: per-source sampling rates (the dataset-assembly
    // recipe), md5-bucket deterministic like sample_deterministic.
    "corpus_mix" -> ((s, dir) =>
      graft.pipeline.Curation.mixCorpus(Tables.documents(s, dir), "text", "source",
        Map("src0" -> 10000, "src1" -> 5000, "src2" -> 2500, "src3" -> 500))
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))),
    // Mixing with rates ABOVE 1 (DoReMi weights): rate 2.5 = every doc
    // twice + a content-chosen half a third time, each copy numbered by
    // epoch so packing can interleave repeats.
    "corpus_mix_epochs" -> ((s, dir) =>
      graft.pipeline.Curation.mixCorpusWithRepetition(
        Tables.documents(s, dir), "text", "source",
        Map("src0" -> 25000, "src1" -> 10000, "src2" -> 5000))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))),
    // Temperature mixing: α=0.5 downsample-only flattening (kept counts
    // ∝ n^α) — rates derived from the data, not a hand map; sqrt keeps
    // the derived integer rate engine-exact.
    "corpus_mix_temperature" -> ((s, dir) =>
      graft.pipeline.Curation.mixCorpusTemperature(
        Tables.documents(s, dir), "text", "source")
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))),
    // Seeded global shuffle: hierarchical rank (shard prefix + per-shard
    // window + offset join) == global md5 order, pinned by the oracle's
    // single ROW_NUMBER.
    "corpus_shuffle" -> ((s, dir) =>
      graft.pipeline.Curation.shuffleCorpus(
        Tables.documents(s, dir), "text", "mix42", 64)
        .select(col("doc_id"), col("shard"), col("shuffle_pos"))
        .orderBy(col("shuffle_pos"))),
    // Percentile-calibrated length gate: each language's token floor
    // comes from its own distribution (p20 here) — integer cross-
    // multiplied quantile, broadcast thresholds, keep = n >= floor.
    "adaptive_length_gate" -> ((s, dir) =>
      graft.pipeline.Curation.adaptiveLengthGate(Tables.documents(s, dir))),
    // The incremental face: history contributes only its additive
    // (lang, n_tokens, count) histogram partial — text never re-read;
    // the batch gates under merged-state thresholds, which over the
    // final batch equal the one-shot fit (the oracle states that).
    "adaptive_length_gate_incremental" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      graft.pipeline.Curation.adaptiveLengthGateIncremental(
        all.filter(col("doc_id") >= 250),
        graft.pipeline.Curation.lengthHistogram(
          all.filter(col("doc_id") < 250)))
    }),
    // Fixed-budget release sharding in the seeded shuffle order: the
    // physical packaging step — per-shard doc/token counts + an
    // order-independent xor content fingerprint. The oracle replays the
    // shuffle rank, the prefix-sum cut, and the fingerprint exactly.
    "release_shards" -> ((s, dir) =>
      graft.pipeline.Curation.releaseShards(
        Tables.documents(s, dir), "doc_id", "text", 2048L)),
    // GPT-style concat-then-chunk packing via the distributed prefix sum;
    // CurationSpec pins it equal to the single-window semantic form.
    "sequence_packing" -> ((s, dir) =>
      graft.pipeline.Curation.packChunksScalable(Tables.documents(s, dir),
        "doc_id", "text", 512L)),
    // The attention-mask manifest of that packing: per chunk, each
    // document fragment's [start, end) span — what resets attention at
    // document joins inside a packed sequence.
    "packing_boundaries" -> ((s, dir) =>
      graft.pipeline.Curation.packingBoundaries(Tables.documents(s, dir),
        "doc_id", "text", 512L)),
    // Packing in BPE-piece units (what trainers budget in): same
    // prefix-sum assignment, n_tokens from the broadcast-rank encode.
    // FULL oracle since r9 (printed merges + recursive-CTE encode +
    // the sequence_packing prefix-sum replay).
    "sequence_packing_bpe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = graft.text.Bpe.fitMerges(docs, "text", 200)
      FittedOracle.bpePackMerges = Some(merges)
      graft.pipeline.Curation.packChunksBpe(docs, "doc_id", "text", merges, 512L)
    }),
    // The same packing under the unigram tokenizer (r11): Viterbi piece
    // counts feed the identical prefix-sum chunk arithmetic — the chunk
    // map a unigram-standardized pipeline trains on.
    "sequence_packing_unigram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fitPieces(docs, "text", 400)
      FittedOracle.unigramPackPieces = Some(pieces)
      graft.pipeline.Curation.packChunksUnigram(docs, "doc_id", "text",
        pieces, 512L)
    }),
    // The same packing under the PRODUCTION-DEFAULT soft fit (r14, the
    // r13 verdict's #3): `Unigram.fit` with no mode argument now means
    // the Kudo-faithful soft-EM trainer, and the packing consumer is
    // fit-mode-agnostic by construction — same prefix-sum chunk
    // arithmetic, same printed-constants oracle, only the piece table
    // differs.
    "sequence_packing_unigram_soft" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fit(docs, "text", 400)
      FittedOracle.unigramPackSoftPieces = Some(pieces)
      graft.pipeline.Curation.packChunksUnigram(docs, "doc_id", "text",
        pieces, 512L)
    }),
    // Contamination-free bin packing (Krell-et-al. SPFHP): whole docs
    // only, histogram-driven best-fit-decreasing on the driver, broadcast
    // slot arithmetic. Rows-only by declared design (driver loop, like
    // BPE); contract pinned by CurationSpec.
    "sequence_packing_bins" -> ((s, dir) => {
      val chunks = graft.pipeline.Curation.chunkTexts(
        Tables.documents(s, dir), "doc_id", "text", 64, 0)
        .select((col("doc_id") * 100000 + col("chunk_idx")).as("item_id"),
          col("chunk_text"))
      graft.pipeline.Curation.packBinsHistogram(chunks, "item_id", "chunk_text", 128)
    }),
    // Packing-efficiency audit: concat-chunk waste vs pad-per-doc waste
    // and the boundary-contamination counts, one row, from the same
    // prefix-sum assignment sequence_packing pins.
    "packing_efficiency" -> ((s, dir) =>
      graft.pipeline.Curation.packingEfficiency(Tables.documents(s, dir),
        "doc_id", "text", 512L)),
    // Per-(source, lang) release rollup with subtotals and exact-dup pct.
    "release_manifest" -> ((s, dir) =>
      graft.pipeline.Curation.releaseManifest(Tables.documents(s, dir))),
    // Small-cell suppression for the released stats: (source, lang)
    // cells under k=5 docs collapse into one reconciling bucket.
    "k_anonymous_stats" -> ((s, dir) =>
      graft.pipeline.Curation.kAnonymousStats(Tables.documents(s, dir),
        Seq("source", "lang"), 5)),
    // WARC ingestion: archives built from the fixture docs, parsed by
    // the length-driven record walker; the oracle reconstructs the same
    // records relationally — the gate proves parse(write(x)) == x.
    // Density-based main-content extraction over planted page chrome:
    // nav and footer blocks are all-links (dropped), the doc text is the
    // content block, and every third doc grows a second content section.
    "html_main_content" -> ((s, dir) => {
      val html = concat(
        lit("<html><body><div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></div><p>"),
        col("text"),
        lit("</p><div><a>Privacy</a> <a>Terms</a></div>"),
        when(col("doc_id") % 3 === 0,
          lit("<section>Read more about this topic here</section>"))
          .otherwise(lit("")),
        lit("</body></html>"))
      graft.ingest.Boilerplate.mainContent(
        Tables.documents(s, dir).withColumn("html", html))
    }),
    "warc_records" -> ((s, dir) =>
      graft.sources.Warc.records(warcBlobs(Tables.documents(s, dir)))
        .select(col("path").as("source"), col("record_offset"),
          col("target_uri"), col("content_length"),
          substring(col("payload").cast("string"), 1, 15).as("payload_head"))
        .orderBy(col("source"), col("record_offset"))),
    "warc_html_documents" -> ((s, dir) =>
      graft.sources.Warc.htmlDocuments(
          graft.sources.Warc.records(warcBlobs(Tables.documents(s, dir))))
        .orderBy(col("target_uri"))),
    // CDX capture index over the same archives: SURT urlkey, byte-precise
    // offset/length, payload digest — the oracle rebuilds every field
    // relationally, so the gate proves the index points at the records.
    "warc_cdx" -> ((s, dir) =>
      graft.sources.Warc.cdx(
        graft.sources.Warc.records(warcBlobs(Tables.documents(s, dir))))),
    // WET conversion records: the extracted-text sibling of the archives
    // (strip HTTP headers, drop markup, collapse whitespace + digest).
    "warc_wet" -> ((s, dir) =>
      graft.sources.Warc.wetRecords(
        graft.sources.Warc.records(warcBlobs(Tables.documents(s, dir))))),
    // JSONL round trip: render -> parse must be identity through two
    // independent JSON parsers. Escape-stressing suffixes (quote,
    // backslash, newline, tab) planted by doc_id mod 5 in both engines.
    "jsonl_documents" -> ((s, dir) => {
      val suf = Seq("", " \"quoted\"", " back\\slash", " line\nbreak",
        " tab\there")
      val docs = Tables.documents(s, dir).withColumn("text",
        concat(col("text"), element_at(array(suf.map(lit(_)): _*),
          (col("doc_id") % 5 + 1).cast("int"))))
      graft.sources.Jsonl.parse(graft.sources.Jsonl.render(docs))
        .orderBy(col("doc_id"))
    }),
    // The INCREMENTAL manifest: additive counts + mergeable HLL content
    // sketch rolled up from state alone — release cost independent of
    // corpus size. The oracle replays each level's sketch directly; the
    // engine's bucket-max rollup matching it IS the mergeability pin.
    "release_manifest_sketch" -> ((s, dir) =>
      graft.pipeline.Curation.releaseManifestSketch(Tables.documents(s, dir))),
    // The data-card artifact: ONE (section, metric, value) table folding
    // the audited composition/dedup/quality signals — all integer counts
    // over proven column builders, one text scan.
    "release_datasheet" -> ((s, dir) =>
      graft.pipeline.Curation.releaseDatasheet(Tables.documents(s, dir))),
    // Good-Turing count-of-counts: the Zipf-health audit of the corpus.
    "token_spectrum" -> ((s, dir) =>
      TextAnalysis.tokenSpectrum(Tables.documents(s, dir), "text")),
    // Quality-curriculum training order: ascending quality tiers,
    // seeded shuffle within each tier, hierarchical ranks throughout.
    "curriculum_order" -> ((s, dir) =>
      graft.pipeline.Curation.curriculumOrder(Tables.documents(s, dir))),
    // Per-doc cross-document duplication exposure: fraction of the doc's
    // distinct 3-gram shingles shared with >= 5 documents corpus-wide.
    "ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text", 3, 5L)),
    // The incremental face: per-batch df partials merged by sum, the
    // batch scored against corpus-wide state (history = doc_id < 250
    // fixture convention). The oracle scores batch docs against df over
    // ALL docs — sum-merge == whole-corpus counts is what it pins.
    "ngram_novelty_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val history = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      // Materialized once, mirroring the production shape where state is
      // persisted parquet — without it the probe join re-derives both
      // count partials (re-scanning history) per consumer.
      val state = TextAnalysis.mergeShingleCounts(
        TextAnalysis.shingleDfCounts(history, "text", 3),
        TextAnalysis.shingleDfCounts(batch, "text", 3))
        .pinned
      TextAnalysis.ngramNoveltyFromCounts(batch, "doc_id", "text", 3, 5L, state)
    }),
    // Sliding-window chunk expansion (64-token chunks, 16 overlap) — the
    // RAG/pretraining chunk-text generator.
    "chunk_texts" -> ((s, dir) =>
      graft.pipeline.Curation.chunkTexts(Tables.documents(s, dir),
        "doc_id", "text", 64, 16)),
    // The full corpus assembly line in one composition: PII scrub ->
    // df-thresholded exact span dedup (20-token blocks, df >= 3) ->
    // quality floor -> exact dedup -> decontaminate -> deterministic 80%
    // sample -> sequence packing. One DuckDB WITH-chain replays it all.
    "corpus_pipeline" -> ((s, dir) =>
      graft.pipeline.CorpusPipeline(Tables.documents(s, dir))),
    // Same line with the Gopher rule gate switched on at stage 3b
    // (tuned thresholds — see FunnelThresholds); the WITH-chain oracle
    // extends by one predicate, everything downstream shifts with it.
    "corpus_pipeline_gated" -> ((s, dir) =>
      graft.pipeline.CorpusPipeline(Tables.documents(s, dir),
        gopherTh = Some(FunnelThresholds))),
    // Both optional gates on: rules (3b) AND repetition (3c). The
    // WITH-chain oracle grows the rule predicate plus a repetition
    // semi-join (the relational replay of the per-row folds).
    "corpus_pipeline_full" -> ((s, dir) =>
      graft.pipeline.CorpusPipeline(Tables.documents(s, dir),
        gopherTh = Some(FunnelThresholds),
        repetitionTh = Some(RepetitionThresholds))),
    // FineWeb-style end-to-end preset over the line-structured fixture
    // (the synthetic documents are single-line, so the C4 stage needs
    // real pages): C4 line-clean -> Gopher rules -> Gopher repetition ->
    // ANCHORED substring dedup -> exact dedup -> decontaminate ->
    // DSIR per-token-average floor -> seeded shuffle -> pack. One DuckDB
    // WITH-chain replays all nine stages.
    "corpus_pipeline_fineweb" -> ((s, dir) => {
      import s.implicits._
      graft.pipeline.FineWebPipeline(
        FineWebFixture.docs.toDF("doc_id", "text"),
        gopherTh = FineWebRuleThresholds)
    }),
    // RefinedWeb-style preset (r9) over the documents table with the
    // skewed fixture URLs: blocklist -> NFC -> language -> Gopher gates
    // -> exact dedup -> MinHash near-dedup -> per-domain caps. The NFC
    // stage sits AHEAD of every key, the placement it was built for.
    "corpus_pipeline_refinedweb" -> ((s, dir) =>
      graft.pipeline.RefinedWebPipeline(
        withFixtureUrls(Tables.documents(s, dir)),
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15)),
    // The bytes-to-corpus capstone (r10): WARC archive bytes -> the
    // length-driven record walk -> HTTP header strip -> density-based
    // main-content extraction -> the FULL RefinedWeb preset. The Spark
    // side parses real bytes; the oracle replays the construction
    // relationally (the warc_records round-trip gate proves the byte
    // walk separately), then runs the same extraction + preset chain.
    "warc_refinedweb" -> ((s, dir) => {
      val recs = graft.sources.Warc.records(warcBlobs(Tables.documents(s, dir)))
      val pages = graft.sources.Warc.htmlDocuments(recs)
        .withColumn("doc_id",
          regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long"))
        .withColumnRenamed("body", "html")
        .pinned
      val extracted = graft.ingest.Boilerplate.mainContent(pages)
        .filter(col("n_kept") >= 1)
        .select(col("doc_id"), col("main_text").as("text"))
      val meta = pages.select(col("doc_id"),
        regexp_extract(col("target_uri"), "example\\.org/([^/]+)/", 1)
          .as("source"))
      // Pin the composed corpus BEFORE the preset: without the boundary
      // CollapseProject inlines the (expensive) extraction expression
      // into every downstream gate — NFC, langId, the Gopher folds, the
      // dedup md5 — re-extracting each page ~5x (probed 50.5 s unpinned
      // vs 19.9 s pinned at sf0.1 local[8]; the same diamond the
      // cosinePairs scaladoc records). The pages pin above bounds the
      // archive walk to once per blob the same way.
      graft.pipeline.RefinedWebPipeline(
        withFixtureUrls(extracted.join(meta, Seq("doc_id"))).pinned,
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15)
    }),
    // Per-document outcome attribution (r10): which stage dropped each
    // raw doc ('kept' for survivors) — the funnel's per-doc twin;
    // grouped by outcome it reconciles exactly to the funnel deltas.
    "refinedweb_outcomes" -> ((s, dir) =>
      graft.pipeline.RefinedWebPipeline.outcomes(
        withFixtureUrls(Tables.documents(s, dir)),
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15)),
    "refinedweb_funnel" -> ((s, dir) =>
      graft.pipeline.RefinedWebPipeline.funnel(
        withFixtureUrls(Tables.documents(s, dir)),
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15)),
    // The preset's ablation table: per-stage survivor counts, computed
    // from the SAME stage frames the packed corpus ships (shared
    // construction — funnel and corpus can't drift).
    "fineweb_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.pipeline.FineWebPipeline.funnel(
        FineWebFixture.docs.toDF("doc_id", "text"),
        gopherTh = FineWebRuleThresholds)
    }),
    // CCNet-style preset (Wenzek et al. ordering): paragraph dedup ->
    // language gate -> self-fit LM perplexity tiers, tail cut. One
    // DuckDB WITH-chain replays all three stages.
    "corpus_pipeline_ccnet" -> ((s, dir) => {
      import s.implicits._
      graft.pipeline.CcNetPipeline(CcNetFixture.docs.toDF("doc_id", "text"))
    }),
    // The paper's actual stage-3 shape: the LM fit on the metadata-
    // trusted lang='en' slice (Wenzek et al. fit on Wikipedia), the
    // langId-gated survivors priced under it with OOV backoff.
    "corpus_pipeline_ccnet_crossfit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.CcNetPipeline.applyCrossFit(
        docs.select(col("doc_id"), col("text")),
        docs.filter(col("lang") === "en"))
    }),
    // The CCNet preset's ablation table, from the SAME stage frames.
    "ccnet_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.pipeline.CcNetPipeline.funnel(CcNetFixture.docs.toDF("doc_id", "text"))
    }),
    // Incremental FineWeb preset: docs < 9 are history — only their
    // persisted state (window-hash index, content-hash index, fixed
    // bench, additive DSIR counts) is consulted, history text never
    // re-read; docs >= 9 arrive as a batch. The split exercises the
    // cross-batch window-index probe (doc 9's passage matches history
    // doc 8), within-batch exact dedup (11 vs 13), fixed-bench
    // decontamination (12 vs bench doc 20), and the merged-counts DSIR
    // floor (14). Full oracle: the union-equivalence contract says the
    // result IS the batch rows of the full recompute, so DuckDB replays
    // the whole nine-stage chain and selects doc_id >= 9.
    "fineweb_incremental" -> ((s, dir) => {
      import s.implicits._
      val all = FineWebFixture.docs.toDF("doc_id", "text")
      val st = graft.pipeline.FineWebPipeline.state(
        all.filter(col("doc_id") < 9),
        graft.pipeline.FineWebPipeline.benchSlice(all),
        gopherTh = FineWebRuleThresholds)
      graft.pipeline.FineWebPipeline.incremental(
        all.filter(col("doc_id") >= 9), st,
        gopherTh = FineWebRuleThresholds)
    }),
    // Benchmark decontamination: flag docs sharing >= 5 distinct 3-grams
    // with the "benchmark" slice (doc_id % 97 == 0 stands in for an eval
    // suite); broadcast bench shingles, one groupBy on doc_id.
    "decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.decontaminate(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", 3, 5L)
    }),
    // Fuzzy decontamination: MinHash-LSH candidates against the benchmark
    // slice, exact Jaccard verify >= 0.8 — catches paraphrased/re-wrapped
    // benchmark leaks exact n-gram overlap misses. Full oracle: the
    // md5-prefix family lets DuckDB replay banding AND verify.
    "decontaminate_fuzzy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.decontaminateFuzzy(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", 0.8)
    }),
    // BPE tokenizer training: exact word dict (one agg, bounded
    // TakeOrdered) -> driver merge loop -> merge table. Engine-internal
    // loop -> rows-only; hand-computed merges + round-trip pinned in
    // BpeSpec.
    "bpe_merges" -> ((s, dir) =>
      graft.text.Bpe.mergesTable(s,
        graft.text.Bpe.fitMerges(Tables.documents(s, dir), "text", 200))),
    // Applying the trained merges: per-doc piece counts + compression
    // ratio. Broadcast rank table, per-partition map, no shuffle. FULL
    // oracle since r9: the fitted merges print into a recursive-CTE
    // greedy-encode replay (FittedOracle).
    "bpe_encode_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = graft.text.Bpe.fitMerges(docs, "text", 200)
      FittedOracle.bpeStatsMerges = Some(merges)
      graft.text.Bpe.encodeStats(docs, "doc_id", "text", merges)
    }),
    // Tokenizer fertility by language (r10): pieces per word + bytes per
    // piece under the corpus-fitted merges — the per-language audit
    // behind every token-denominated budget. Integer sums end-to-end;
    // full oracle via the printed-merges recursive-CTE replay.
    "bpe_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = graft.text.Bpe.fitMerges(docs, "text", 200)
      FittedOracle.bpeFertilityMerges = Some(merges)
      graft.text.Bpe.fertilityByLang(docs, "doc_id", "text", "lang", merges)
    }),
    // Unigram-LM (SentencePiece-class) tokenizer (r11): Viterbi-EM fit
    // on the bounded word dictionary, maximum-likelihood Viterbi encode
    // under integer micro-nat piece log-probs. Full oracle via the
    // printed piece table + a list_reduce Viterbi DP replay in DuckDB
    // (FittedOracle channel — same discipline as the BPE pair).
    "unigram_encode_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fitPieces(docs, "text", 400)
      FittedOracle.unigramStatsPieces = Some(pieces)
      graft.text.Unigram.encodeStats(docs, "doc_id", "text", pieces)
    }),
    // F138 (r13, the verdict's #2): the PROMOTED soft fit — Kudo 2018's
    // forward-backward E-step WITH §3.2 loss-ranked iterative pruning —
    // as a production fit mode. Same encode, same printed-constants
    // oracle replay; only the fitted table differs, which is the point:
    // every downstream consumer is fit-mode-agnostic.
    "unigram_encode_stats_soft" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fit(docs, "text", 400,
        mode = graft.text.Unigram.SoftEm)
      FittedOracle.unigramStatsSoftPieces = Some(pieces)
      graft.text.Unigram.encodeStats(docs, "doc_id", "text", pieces)
    }),
    // Greedy longest-match (WordPiece/MaxMatch encode family) over the
    // SAME fitted vocab (r11): its compression column against
    // unigram_encode_stats' measures what Viterbi buys.
    "maxmatch_encode_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fitPieces(docs, "text", 400)
      FittedOracle.maxmatchPieces = Some(pieces)
      graft.text.Unigram.maxMatchStats(docs, "doc_id", "text", pieces)
    }),
    // F129: decode round-trip — detokenized bytes must equal the
    // canonical text under BOTH coders; the oracle derives the
    // canonical form independently from raw text, so the hash gate
    // checks Spark's reassembled BYTES, not just piece counts.
    "tokenizer_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fitPieces(docs, "text", 400)
      graft.text.Unigram.roundTrip(docs, "doc_id", "text", pieces)
    }),
    // The fertility audit under the unigram model — multilingual
    // budgets skew differently than under BPE (the point of having
    // both tokenizers in the family).
    "unigram_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fitPieces(docs, "text", 400)
      FittedOracle.unigramFertilityPieces = Some(pieces)
      graft.text.Unigram.fertilityByLang(docs, "doc_id", "text", "lang", pieces)
    }),
    // The fertility audit under the PRODUCTION-DEFAULT soft fit (r14):
    // the multilingual budget skew under the table a Kudo-faithful
    // deployment would actually train — paired with `unigram_fertility`
    // the two queries make the measured fit-mode gap a per-language
    // hash-checked number on the CONSUMER, not just on the encode.
    "unigram_fertility_soft" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pieces = graft.text.Unigram.fit(docs, "text", 400)
      FittedOracle.unigramFertilitySoftPieces = Some(pieces)
      graft.text.Unigram.fertilityByLang(docs, "doc_id", "text", "lang", pieces)
    }),
    // Hard-vs-soft-EM fit fidelity audit (r12, the verdict's #2): the
    // production hard-EM fit against a Kudo-2018 soft-EM (forward-
    // backward expected-count) reference fit of the SAME dictionary,
    // same seed/prune — fertility_delta per language is exactly what
    // the hard E-step simplification costs. Vocab overlap between the
    // two fits is pinned in UnigramSoftSpec; both fits print into one
    // DuckDB oracle (two Viterbi folds).
    "unigram_fit_divergence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val hard = graft.text.Unigram.fitPieces(docs, "text", 400)
      val soft = graft.text.Unigram.fitPiecesSoft(docs, "text", 400)
      FittedOracle.unigramDivHard = Some(hard)
      FittedOracle.unigramDivSoft = Some(soft)
      graft.text.Unigram.fertilityCompare(docs, "doc_id", "text", "lang",
        hard, soft)
    }),
    // Bigram LM scoring (CCNet-style quality signal): per-doc
    // predictability cost under the corpus's own bigram model, in
    // integer micro-nats so the iterative-free float pipeline still
    // hash-matches DuckDB.
    // Cross-fit LM (CCNet's real shape): model fit on the target-
    // language slice, every doc priced under it — OOV bigrams back off
    // to the first token's unigram mass instead of dropping.
    "lm_scores_crossfit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.LmScore.scoresCrossFit(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text")
    }),
    "lm_scores" -> ((s, dir) =>
      graft.text.LmScore.scores(Tables.documents(s, dir), "doc_id", "text")),
    // The curation loop closed: LM cost -> exact-percentile corpus cut
    // (data-derived, not a magic constant) -> filter. CCNet's
    // perplexity-head policy.
    "lm_quality_floor" -> ((s, dir) =>
      graft.text.LmScore.qualityFloor(Tables.documents(s, dir), "doc_id", "text")),
    // Trigram LM with stupid backoff (rational alpha = 4/10 folded into
    // the integer log argument): repeated trigrams score by MLE,
    // singletons back off to the Laplace bigram conditional. More
    // context per prediction than lm_scores; same micro-nat discipline,
    // full oracle.
    "lm_scores_trigram" -> ((s, dir) =>
      graft.text.LmScore.scoresTrigram(Tables.documents(s, dir), "doc_id", "text")),
    // The documented 100 TB swap as a real operator: df>=3 head costs
    // broadcast, tail occurrences charged the constant singleton cost —
    // the scoring join is map-side, the token stream never shuffles.
    "lm_scores_pruned" -> ((s, dir) =>
      graft.text.LmScore.prunedScores(Tables.documents(s, dir), "doc_id", "text")),
    // CCNet head/middle/tail perplexity terciles: integer rank
    // arithmetic, no float quantile boundary — full oracle. Bound to the
    // hierarchical-rank form (r8): per-shard row_number + broadcast
    // offsets + closed-form tercile, no single-partition window; pinned
    // output-identical to the global-ntile reference in LmScoreSpec.
    "lm_perplexity_buckets" -> ((s, dir) =>
      graft.text.LmScore.perplexityBucketsScalable(Tables.documents(s, dir))),
    // Per-source TOKEN budget (mixture design is stated in tokens, not
    // docs): take docs in content-keyed order until the inclusive
    // running token sum would cross 400 per source.
    "token_quota" -> ((s, dir) =>
      graft.pipeline.Curation.quotaTokensPerSource(
        Tables.documents(s, dir), "doc_id", "source", "text", 400L)),
    // Trained quality classifier: hashed-feature linear model, weak
    // labels from the LM-cost median split, 10 rounds of integer
    // fixed-point GD with a hard sigmoid (no libm in the loop) — the
    // whole TRAINING RUN replays as an unrolled DuckDB WITH-chain, so
    // even the learned weights are hash-checked. (Measured: cutting the
    // query to 5 rounds saved ~2 s but left the gate barely
    // discriminating — keep=1 for 30% of the corpus instead of 2% —
    // which also inflates the downstream dedup in
    // corpus_clean_classified; the trained-10-round form stays.)
    // Calibration / reliability table for the trained gate (r11):
    // decile score bins, observed positive rate vs mean predicted
    // score on the labeled subset, integer per-mille — the audit that
    // says whether the score can be read as a probability.
    "classifier_calibration" -> ((s, dir) =>
      graft.pipeline.QualityClassifier.calibration(
        Tables.documents(s, dir), "doc_id", "text")),
    "quality_classifier" -> ((s, dir) =>
      graft.pipeline.QualityClassifier.classify(
        Tables.documents(s, dir), "doc_id", "text")),
    // Gopher rule gate: the Rae-et-al. heuristic signals, pure per-row
    // codegen expressions (zero joins/shuffles before the output sort).
    "gopher_rules" -> ((s, dir) =>
      graft.text.GopherRules.signals(Tables.documents(s, dir))),
    // Same signals over a planted fixture exercising every rule branch
    // (bullets, ellipses, symbols, short docs, prose that PASSES).
    "gopher_rules_edge" -> ((s, _) => {
      import s.implicits._
      graft.text.GopherRules.signals(
        GopherFixture.docs.toDF("doc_id", "text"))
    }),
    // Gopher repetition gate (A1.2, the A1.1 companion): dup line/para
    // fractions + top/dup n-gram char fractions, all per-row sort+fold
    // expressions; the oracle replays them relationally.
    "gopher_repetition" -> ((s, dir) =>
      graft.text.GopherRepetition.signals(Tables.documents(s, dir))),
    // Same signals over planted multi-line repeats (documents are
    // single-line): dup lines, dup paragraphs, a stuffed bigram, an
    // overlapping 5-gram run, a repeated 10-gram sentence.
    "gopher_repetition_edge" -> ((s, _) => {
      import s.implicits._
      graft.text.GopherRepetition.signals(
        RepetitionFixture.docs.toDF("doc_id", "text"))
    }),
    // C4 line/page cleaning over multi-line planted pages (documents
    // are single-line by construction): terminal-punct + min-words +
    // no-javascript line rule, lorem-ipsum/brace/min-lines page rule.
    "c4_filters" -> ((s, _) => {
      import s.implicits._
      graft.pipeline.C4Filters.clean(
        C4Fixture.docs.toDF("doc_id", "text"))
    }),
    // C4's OTHER page gate (r10): the bad-words blocklist. Token-set
    // membership over [a-z0-9] runs = word-boundary semantics; planted
    // suffixes exercise one hit, substring traps (sextonbury/xxxl must
    // NOT match), a two-hit page, and clean tails.
    "c4_badwords" -> ((s, dir) =>
      graft.pipeline.C4Filters.badWords(
        withBadWordTexts(Tables.documents(s, dir)), "doc_id", "text")),
    // Dolma-style one-pass attribute sidecar (r10): every per-doc tagger
    // signal in a SINGLE scan (no join between taggers, shuffle-free
    // before the output sort) — release policies then filter the sidecar
    // without re-reading text. Bad-word suffixes planted so bad_hits
    // discriminates alongside the natural signals.
    "attribute_sidecar" -> ((s, dir) =>
      graft.pipeline.Attributes.sidecar(
        withBadWordTexts(Tables.documents(s, dir)), "doc_id", "text",
        FunnelThresholds)),
    // The sidecar composition closed: a release policy (quality floor,
    // Gopher pass, clean of bad words, English) applied as ONE semi join
    // on ids — the policy-iteration path that never re-reads text.
    "sidecar_policy" -> ((s, dir) => {
      val docs = withBadWordTexts(Tables.documents(s, dir))
      val sc = graft.pipeline.Attributes.sidecar(docs, "doc_id", "text",
        FunnelThresholds)
      graft.pipeline.Attributes.applyPolicy(docs, sc,
          col("quality") >= 0.65 && col("gopher_pass") &&
            col("bad_hits") === 0 && col("lang_pred") === "en")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),
    // DSIR hashed-n-gram importance weights toward the src0 slice as
    // the in-domain target; integer micro-nat log-ratio sums.
    "dsir_weights" -> ((s, dir) =>
      graft.pipeline.Dsir.weights(
        Tables.documents(s, dir), col("source") === "src0")),
    // Per-source unigram KL vs the corpus: the drift analytics behind
    // mixture design. Integer micro-nat numerators -> full oracle.
    "source_kl" -> ((s, dir) =>
      graft.text.SourceDivergence.sourceKl(Tables.documents(s, dir))),
    // Sentence-aware chunking over the multi-line fixture pages (the
    // synthetic documents carry no punctuation): a sentence straddling
    // the budget goes WHOLE to its first token's chunk.
    "sentence_chunks" -> ((s, _) => {
      import s.implicits._
      graft.text.Sentences.sentenceChunks(
        C4Fixture.docs.toDF("doc_id", "text"), budgetTokens = 20)
    }),
    // Gate-attrition funnel: raw -> gopher -> quality floor -> exact
    // dedup survivor counts, one scan + one agg. Thresholds tuned for
    // the synthetic word-soup corpus (stop_hits is 1 there by
    // construction; the word-count cut is the discriminating rule).
    // (quality floor 0.65: the synthetic corpus's quality scores span
    // 0.46-0.75, so the default 0.5 would pass every gopher survivor.)
    "curation_funnel" -> ((s, dir) =>
      graft.pipeline.Curation.curationFunnel(
        Tables.documents(s, dir), th = FunnelThresholds,
        minQuality = 0.65)),
    // Heavy-hitter tokens: distributed Misra-Gries sketch (bounded
    // memory, no token-stream shuffle) + exact recount of the <= 2000
    // candidates. Output provably equals the naive global top list above
    // the N/(capacity+1) threshold -> full oracle despite the sketch.
    "heavy_hitters" -> ((s, dir) =>
      graft.text.HeavyHitters.topTokens(Tables.documents(s, dir), "text",
        capacity = 2000, topK = 50)),
    // Graded contamination: per-doc overlap FRACTION against the
    // benchmark slice — the length-normalized policy form (drop when
    // >= X% of a doc's 3-grams appear in the eval suite).
    "contamination_scores" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.contaminationScores(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", 3)
    }),
    // Bloom-prefiltered decontamination: bit-probe drops non-overlapping
    // shingles before the exact verify join. No false negatives + exact
    // verify => row-identical to `decontaminate`; same oracle hash-checks it.
    // expectedItems: caller-supplied upper bound on the benchmark's
    // distinct shingles — skips the sizing count() job (the filter only
    // gets some spare bits; output unchanged).
    "decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.decontaminateBloom(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 97 === 0), "text", 3, 5L,
        expectedItems = 1000000L)
    }),
    // Deterministic content-keyed train/val/test split (90/5/5).
    "corpus_split" -> ((s, dir) =>
      graft.pipeline.Curation.splitCorpus(Tables.documents(s, dir), "text", 500, 500)
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))),
    // Split-leakage audit (r10): near-dup pairs whose members land in
    // DIFFERENT splits — the content keying pins exact copies together,
    // so every reported pair is a distinct-bytes near-dup crossing the
    // train/test boundary (1,616 of 9,020 near-dup pairs at sf0.01).
    "split_leakage" -> ((s, dir) =>
      graft.pipeline.Curation.splitLeakage(Tables.documents(s, dir),
        "doc_id", "text", 500, 500, 0.9)),
    // Snapshot diff between two deterministic fixture "versions": old =
    // ids % 7 != 0; new = ids % 5 != 0 with a " v2" suffix on ids % 11
    // == 0 — added/removed/changed via (id, md5) full-outer join.
    "corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val oldV = docs.filter(col("doc_id") % 7 =!= 0)
      val newV = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.pipeline.SnapshotDiff.snapshotDiff(oldV, newV, "doc_id", "text")
    }),
    // PII scrub on an inline fixture with known PII (VALUES oracle runs
    // the same RE2-safe regex literals).
    "pii_redact" -> ((s, _) => {
      import s.implicits._
      graft.pipeline.Pii.scrub(
        PiiFixture.docs.toDF("doc_id", "text"), "doc_id", "text")
    }),
    // Range join: each event matched to the session interval containing
    // it (binned equi-join, one shuffle — not a nested-loop theta join).
    "events_in_sessions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.relational.RangeJoin.pointInInterval(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        EventWindows.userSessions(ev),
        "ts", "session_start", "session_end", Seq("user_id"),
        Seq("session_start" -> "session_start"), binSeconds = 1800L)
        .orderBy(col("event_id"))
    }),
    // media -> stub-decoded feature vectors -> exact kNN: the multimodal/
    // similarity composition end-to-end. FULL oracle since r9: the
    // md5-prefix stub features replay in DuckDB
    // (Multimodal.sqlMediaEmbeddingKnn); MultimodalSpec still pins
    // determinism across runs.
    "media_embedding_knn" -> ((s, dir) => {
      val feats = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Similarity.knnBruteForce(feats, feats.filter(col("vec_id") % 100 === 0), 3)
    }),
    // ---- [EXT] multimodal columns (binary payload + typed metadata) ----
    "multimodal_features" -> ((s, dir) =>
      Multimodal.featureSummary(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameIndex(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.mediaFromDocuments(Tables.documents(s, dir)), 64)
        .select(col("media_id"), col("kind"), col("orig_bytes"), col("resized_bytes"))
        .orderBy(col("media_id"))),
    // Perceptual image dedup: aHash signatures (stub decode, md5-prefix
    // grays) through the SAME banded Hamming join as SimHash text dedup.
    // Fixture plants RE-HOSTED COPIES (the real-web case this hash
    // exists for): every image in a 15-id block carries the block
    // anchor's payload, so the 5 images per block pair at hamming 0.
    "image_ahash_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchors = docs
        .select(col("doc_id").as("aid"), encode(col("text"), "UTF-8").as("data"))
      val media = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(anchors, Seq("aid"))
        .select(col("media_id"), lit("image").as("kind"), col("data"))
      Multimodal.imageAhashPairs(media)
    }),
    // REAL-codec aHash (r12): the same planted-copy fixture rendered as
    // actual 16x16 PNGs (deterministic per-pixel grays from the anchor
    // text), decoded back through javax.imageio, area-averaged to the
    // 8x8 grid, hashed, Hamming-joined. The oracle replays the PLANTED
    // pixels numerically, so a pass proves ImageIO's decode returned
    // exactly the encoded image — the stub remains only as the fallback
    // for formats the JDK can't read.
    "image_ahash_real_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.imageAhashPairsDecoded(Multimodal.pngMediaFromAnchors(anchored))
    }),
    // F141 (r13): REAL multi-frame demux — animated GIF is the one
    // frame-sequence container the JDK ships a codec for, so the frame
    // sampler's decode arm is real there: planted 8x8 indexed-gray
    // frames written through the JDK's own GIF sequence writer, demuxed
    // back, per-frame integer gray means hash-checked against the
    // numerically replayed plants. MP4-class containers remain the
    // loudly-documented env-blocked stub arm.
    "video_frames_real" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.videoFramesReal(anchored)
    }),
    // F139 (r13): the F124 move repeated for AUDIO — the planted-copy
    // fixture rendered as real 256-sample PCM WAVs (deterministic u16
    // samples from the anchor text), decoded back through
    // javax.sound.sampled, block-averaged to a 64-bin amplitude grid,
    // hashed, Hamming-joined. The oracle replays the PLANTED samples
    // numerically, so a pass proves the JDK's WAV decode returned
    // exactly the encoded frames; the stub remains only as the
    // fallback for codecs the JDK can't read (MP3/AAC, and video).
    // F140 (r13): REAL image resize — the planted 16x16 PNGs downscaled
    // to 8x8 by exact per-channel integer area averaging (pure JDK, no
    // implementation-defined filtering), re-encoded lossless, decoded
    // BACK, and emitted pixel by pixel. The oracle computes the 2x2
    // block means numerically from the planted grays, so the hash gate
    // proves the whole encode->decode->resize->encode->decode chain is
    // bit-exact; the byte-decimation stub remains only as the fallback
    // arm for undecodable payloads.
    "image_resize_real" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.imageResizeReal(anchored)
    }),
    "audio_ahash_real_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.audioAhashPairsDecoded(Multimodal.wavMediaFromAnchors(anchored))
    }),
    // ---- E1+E2 capstone (r12): the reference's WHOLE loop end-to-end ----
    // A Trigger.AvailableNow micro-batch crawl (each batch = one 6-hour
    // tick re-fetching the SAME seed listings, whose content has grown)
    // through the sink-keyed anti-join dedup and real extraction, then
    // the four dashboard artifacts over the GROWN table as one frame
    // (crawl.py:155-162 + app.py:112-142 as a single oracle-checked
    // query). The oracle replays batch-equivalence: the streaming-grown
    // sink must equal the one-shot distinct article set, on which every
    // dashboard section is plain SQL over `documents`.
    "crawl_then_dashboard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"), col("text"),
          coalesce(col("source"), lit("Unknown")).as("src"))
        .withColumn("url", concat(lit("https://ex.com/a/"), col("doc_id")))
        .withColumn("tick", (col("doc_id") % 3).cast("int"))
        .withColumn("pdate", date_format(
          date_add(lit("2024-01-01").cast("date"),
            (col("doc_id") % 365).cast("int")), "yyyy-MM-dd"))
      val pages = base.select(col("url").as("sources"),
        concat(lit("<h1>Doc "), col("doc_id"), lit("</h1><p>"), col("text"),
          lit("</p><time datetime=\""), col("pdate"),
          lit("\">x</time>"))
          .as("html"))
      val listings = base
        .withColumn("block", concat(lit("<article><a href=\""),
          col("url"), lit("\">t</a></article>")))
        .join(Seq(0, 1, 2).toDF("tick2"), col("tick") <= col("tick2"))
        .groupBy(col("tick2"), col("src"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("block")))),
          x => x.getField("block"))).as("html"))
        .select(col("tick2").as("tick"), col("src").as("source"), col("html"))
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_crawl_" +
        System.getProperty("user.name", "u")
      val root = s"$parent/run_${s.sparkContext.applicationId}_${System.nanoTime()}"
      IvfStoreScratch.deleteOnExit(root)
      (0 until 3).foreach { t =>
        listings.filter(col("tick") === t).select("source", "html")
          .coalesce(1).write.mode("append").parquet(s"$root/in")
      }
      val stream = s.readStream.schema("source STRING, html STRING")
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      graft.streaming.StreamingIngest.crawlLoop(
        stream, pages, s"$root/sink", s"$root/ckpt").start().awaitTermination()
      graft.analytics.Dashboard.composite(s.read.parquet(s"$root/sink"))
    }),
  )

  /** Exact-decontamination oracle — shared verbatim by `decontaminate` and
    * `decontaminate_bloom`: the Bloom pass is a prefilter with no false
    * negatives followed by the exact verify, so both queries must produce
    * row-identical output. */
  private val DecontaminateSql =
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
  private def corpusPipelineSql(
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
  private def paragraphCte: String = {
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
  private def paragraphCleanSql(minOcc: Long): String =
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
  private def substringCte: String = substringCteFor(
    "list_distinct(list_append(range(1, len(toks) - 18, 5), len(toks) - 19))")

  /** Content-anchored start rule (SubstringDedup `anchored = true`):
    * starts where the md5 first-8-hex bucket of the lowercased token is
    * 0 mod 5 — DuckDB's `range` upper bound is exclusive, so
    * `len - 18` covers inclusive starts 1 … len−19. */
  private def substringAnchoredCte: String = substringCteFor(
    """list_filter(range(1, len(toks) - 18),
      |            s -> ('0x' || substring(md5(lower(toks[s])), 1, 8))::UBIGINT % 5 = 0)""".stripMargin)

  private def substringCteFor(startsList: String): String =
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
  private def substringDedupSql(cte: String): String =
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
  private def urlValuesCte: String = {
    val values = UrlFixture.urls
      .map { case (id, u) => s"($id, '${u.replace("'", "''")}')" }
      .mkString(",\n        ")
    s"""WITH d AS (SELECT * FROM (VALUES
       |        $values) t(id, url))""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Every registered oracle runs through [[SqlMat.materializeShared]]:
    * DuckDB 1.0 inlines CTEs per reference site, and the gate's heavy
    * WITH-chains (preset funnels, unrolled rank iterations, banded
    * dedup) re-evaluated their extraction preludes once per reference —
    * ~12 of the r10 gate's ~13.5 compare minutes, the likely cause of
    * the round's empty driver artifact. The hint is correctness-neutral
    * (same rows, different evaluation order), so applying it centrally
    * keeps future chains from regressing the gate wall-clock. */
  def oracleSql: Map[String, String] =
    oracleSqlRaw.map { case (k, v) => k -> SqlMat.materializeShared(v) }

  private def oracleSqlRaw: Map[String, String] = Map(
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
    "paragraph_dedup" -> paragraphCleanSql(2L),
    "paragraph_dedup_df" -> paragraphCleanSql(3L),
    "paragraph_dedup_incremental" ->
      s"""$paragraphCte,
         |hist AS (SELECT DISTINCT norm FROM uu WHERE doc_id <= 4),
         |bu AS (
         |  SELECT doc_id, idx, raw, norm,
         |    ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, idx) AS rn
         |  FROM uu WHERE doc_id >= 5),
         |k AS (SELECT * FROM bu
         |      WHERE rn = 1 AND norm NOT IN (SELECT norm FROM hist)),
         |agg AS (
         |  SELECT doc_id, string_agg(raw, e'\\n\\n' ORDER BY idx) AS text_clean,
         |    CAST(COUNT(*) AS BIGINT) AS n_kept
         |  FROM k GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units
         |        FROM uu WHERE doc_id >= 5 GROUP BY 1)
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         |  COALESCE(agg.text_clean, '') AS text_clean,
         |  COALESCE(agg.n_kept, 0) AS n_kept,
         |  COALESCE(tot.n_units, 0) - COALESCE(agg.n_kept, 0) AS n_removed
         |FROM (SELECT doc_id FROM d WHERE doc_id >= 5) d
         |  LEFT JOIN agg ON d.doc_id = agg.doc_id
         |  LEFT JOIN tot ON d.doc_id = tot.doc_id
         |ORDER BY doc_id""".stripMargin,
    "paragraph_dedup_audit" ->
      s"""$paragraphCte,
         |a AS (
         |  SELECT norm, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM uu GROUP BY 1),
         |k1 AS (SELECT norm, CAST(doc_id AS BIGINT) AS keeper_doc_id,
         |         idx AS keeper_idx FROM m WHERE rn = 1)
         |SELECT a.norm AS paragraph, n_occurrences, n_docs, keeper_doc_id, keeper_idx
         |FROM a JOIN k1 ON a.norm = k1.norm
         |WHERE n_occurrences >= 2
         |ORDER BY n_occurrences DESC, paragraph ASC""".stripMargin,
    "bm25_topk" ->
      graft.text.Relevance.sqlBm25TopK(Seq("spark", "vector", "customer"), 15),
    "span_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id, CAST((s - 1) // 20 AS BIGINT) AS idx,
        |    array_to_string(list_slice(toks, s, least(s + 19, len(toks))), ' ') AS raw
        |  FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks) + 1, 20)) AS s
        |        FROM t WHERE len(toks) > 0)),
        |uu AS (SELECT doc_id, idx, raw, lower(raw) AS norm FROM u),
        |m AS (
        |  SELECT doc_id, idx, raw, norm,
        |    ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, idx) AS rn,
        |    COUNT(*) OVER (PARTITION BY norm) AS n_occ
        |  FROM uu),
        |k AS (SELECT * FROM m WHERE rn = 1 OR n_occ < 2),
        |agg AS (
        |  SELECT doc_id, string_agg(raw, ' ' ORDER BY idx) AS text_clean,
        |    CAST(COUNT(*) AS BIGINT) AS n_kept
        |  FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units FROM uu GROUP BY 1)
        |SELECT d.doc_id AS doc_id,
        |  COALESCE(agg.text_clean, '') AS text_clean,
        |  COALESCE(agg.n_kept, 0) AS n_kept,
        |  COALESCE(tot.n_units, 0) - COALESCE(agg.n_kept, 0) AS n_removed
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |       LEFT JOIN tot ON d.doc_id = tot.doc_id
        |ORDER BY doc_id""".stripMargin,
    "substring_dedup" -> substringDedupSql(substringCte),
    "substring_dedup_anchored" -> substringDedupSql(substringAnchoredCte),
    "substring_dedup_coverage" -> graft.dedup.SubstringDedup.sqlCoverage(
      Seq((20, 5, false), (20, 1, false), (20, 5, true), (10, 1, false)),
      minLen = 10),
    "substring_dedup_incremental" ->
      s"""$substringCte,
         |hist AS (SELECT DISTINCT md5(norm) AS h FROM w WHERE doc_id < 250),
         |bm AS (
         |  SELECT doc_id, start, md5(norm) AS h,
         |    ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id, start) AS rn
         |  FROM w WHERE doc_id >= 250),
         |r AS (SELECT doc_id, start, start + 19 AS fin FROM bm
         |      WHERE rn > 1 OR h IN (SELECT h FROM hist)),
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
         |        FROM t WHERE doc_id >= 250)),
         |kept AS (
         |  SELECT tok.* FROM tok
         |  WHERE NOT EXISTS (SELECT 1 FROM mi
         |    WHERE mi.doc_id = tok.doc_id
         |      AND tok.pos BETWEEN mi.rm_start AND mi.rm_end)),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |        CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
         |        FROM t WHERE doc_id >= 250)
         |SELECT d.doc_id AS doc_id, COALESCE(agg.text_clean, '') AS text_clean,
         |  COALESCE(tot.n_tokens, 0) AS n_tokens,
         |  COALESCE(tot.n_tokens, 0) - COALESCE(agg.n_kept, 0) AS n_removed
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
         |     LEFT JOIN agg ON d.doc_id = agg.doc_id
         |     LEFT JOIN tot ON d.doc_id = tot.doc_id
         |ORDER BY doc_id""".stripMargin,
    "substring_dedup_audit" ->
      s"""$substringCte,
         |a AS (SELECT h, norm, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |      FROM m GROUP BY 1, 2),
         |k1 AS (SELECT h, CAST(doc_id AS BIGINT) AS keeper_doc_id,
         |         start AS keeper_start
         |       FROM m WHERE rn = 1)
         |SELECT a.norm AS passage, n_occurrences, n_docs,
         |  keeper_doc_id, keeper_start
         |FROM a JOIN k1 ON a.h = k1.h
         |WHERE n_occurrences >= 2
         |ORDER BY n_occurrences DESC, passage ASC""".stripMargin,
    "decontaminate_bloom" -> DecontaminateSql,
    "part_pagerank" -> graft.analytics.PageRank.sqlCopurchaseParts(),
    "part_pagerank_convergence" ->
      graft.analytics.PageRank.sqlCopurchaseConvergence(),
    "part_pagerank_earlystop" ->
      graft.analytics.PageRank.sqlCopurchaseEarlyStop(),
    "trust_propagation" -> graft.analytics.PageRank.sqlCopurchaseSpamMass(),
    "trust_propagation_earlystop" ->
      graft.analytics.PageRank.sqlCopurchaseSpamMassEarlyStop(),
    "order_part_hits" -> graft.analytics.PageRank.sqlOrderPartHits(5),
    "order_part_hits_convergence" ->
      graft.analytics.PageRank.sqlOrderPartHitsConvergence(5),
    "order_part_hits_earlystop" ->
      graft.analytics.PageRank.sqlOrderPartHitsEarlyStop(),
    "part_communities" -> graft.analytics.Lpa.sqlPartCommunities(3),
    "part_communities_convergence" ->
      graft.analytics.Lpa.sqlPartCommunitiesConvergence(3),
    "part_communities_earlystop" ->
      graft.analytics.Lpa.sqlPartCommunitiesEarlyStop(),
    "lm_scores" -> graft.text.LmScore.sqlScores,
    "lm_scores_crossfit" -> graft.text.LmScore.sqlScoresCrossFit,
    "lm_quality_floor" -> graft.text.LmScore.sqlQualityFloor(),
    "lm_scores_trigram" -> graft.text.LmScore.sqlScoresTrigram(),
    "lm_scores_pruned" -> graft.text.LmScore.sqlScoresPruned(),
    "lm_perplexity_buckets" -> graft.text.LmScore.sqlPerplexityBuckets,
    "doc_fingerprints" ->
      """SELECT doc_id,
        |  CAST(('0x' || substring(md5(text), 1, 15))::UBIGINT AS BIGINT) AS doc_fp,
        |  list_min(list_transform(
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
        |    s -> CAST(('0x' || substring(md5(s), 1, 15))::UBIGINT AS BIGINT))) AS min_shingle_fp
        |FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // SimHash: replay the bit votes per (doc, bit) over md5-prefix token
    // hashes, assemble the signed 64-bit signature (vote for hash bit b
    // lands at output bit 63-b; the b=0 term is the two's-complement
    // MSB), then ALL-PAIRS exact Hamming <= 3 — the 4x16 chunk banding
    // guarantees the operator's output EQUALS this exact form.
    "simhash_pairs" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    UNNEST(list_transform(toks,
        |      t -> CAST(('0x' || substring(md5(t), 1, 15))::UBIGINT AS BIGINT))) AS h
        |  FROM tk),
        |v AS (
        |  SELECT doc_id, bb.b AS b, SUM(((h >> bb.b) & 1) * 2 - 1) AS cnt
        |  FROM hs CROSS JOIN (SELECT UNNEST(range(0, 64)) AS b) bb
        |  GROUP BY 1, 2),
        |sig0 AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN cnt > 0 THEN
        |      CASE WHEN b = 0 THEN -9223372036854775807 - 1
        |           ELSE CAST(1 AS BIGINT) << CAST(63 - b AS INTEGER) END
        |      ELSE 0 END) AS BIGINT) AS sh
        |  FROM v GROUP BY 1),
        |sig AS (
        |  SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
        |  FROM documents d LEFT JOIN sig0 s USING (doc_id)),
        |p AS (
        |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |    CAST(bit_count(xor(a.sh, b2.sh)) AS BIGINT) AS hamming
        |  FROM sig a JOIN sig b2 ON a.doc_id < b2.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // Winnowing: per-doc sliding window-min SET over md5-prefix shingle
    // hashes (win = LEAST(window, stream length) — the native
    // expression's short-doc rule), boilerplate buckets (> 64 docs)
    // dropped, pair counts over qualifying fingerprints.
    "winnow_overlaps" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
        |      s -> CAST(('0x' || substring(md5(s), 1, 15))::UBIGINT AS BIGINT)) AS hs
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |        FROM documents)),
        |f AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id,
        |      UNNEST(list_transform(range(1, len(hs) - LEAST(4, len(hs)) + 2),
        |        i -> list_min(list_slice(hs, i, i + LEAST(4, len(hs)) - 1)))) AS fp
        |    FROM h WHERE len(hs) >= 1)),
        |b AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64),
        |p AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b
        |      FROM f a JOIN f b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
        |      JOIN b ON a.fp = b.fp)
        |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "token_quota" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS b,
        |    md5(text) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY b, h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 400 ORDER BY doc_id""".stripMargin,
    "quality_classifier" -> graft.pipeline.QualityClassifier.sqlClassifier(),
    "classifier_calibration" ->
      graft.pipeline.QualityClassifier.sqlCalibration(),
    "gopher_rules" -> graft.text.GopherRules.sqlSignals("documents"),
    "gopher_rules_edge" ->
      graft.text.GopherRules.sqlSignals(valuesRel(GopherFixture.docs)),
    "gopher_repetition" ->
      graft.text.GopherRepetition.sqlSignals("documents"),
    "gopher_repetition_edge" ->
      graft.text.GopherRepetition.sqlSignals(valuesRel(RepetitionFixture.docs)),
    "c4_filters" ->
      graft.pipeline.C4Filters.sqlClean(valuesRel(C4Fixture.docs)),
    "c4_badwords" ->
      graft.pipeline.C4Filters.sqlBadWords(
        s"(SELECT doc_id, $sqlBadWordText AS text FROM documents)"),
    "attribute_sidecar" ->
      graft.pipeline.Attributes.sqlSidecar(
        s"(SELECT doc_id, $sqlBadWordText AS text FROM documents)",
        FunnelThresholds),
    "sidecar_policy" ->
      graft.pipeline.Attributes.sqlApplyPolicy(
        s"(SELECT doc_id, source, $sqlBadWordText AS text FROM documents)",
        "quality >= 0.65 AND gopher_pass AND bad_hits = 0 AND lang_pred = 'en'",
        FunnelThresholds),
    "dsir_weights" ->
      graft.pipeline.Dsir.sqlWeights("documents", "source = 'src0'"),
    "curation_funnel" ->
      graft.pipeline.Curation.sqlFunnel("documents", FunnelThresholds,
        minQuality = 0.65),
    "source_kl" ->
      graft.text.SourceDivergence.sqlSourceKl("documents"),
    "sentence_chunks" ->
      graft.text.Sentences.sqlSentenceChunks(
        valuesRel(C4Fixture.docs), budgetTokens = 20),
    "heavy_hitters" ->
      """WITH tok AS (
        |  SELECT UNNEST(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS token FROM documents),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1)
        |SELECT c.token AS token, c.n AS n
        |FROM c, tot WHERE c.n * 2001 > tot.n
        |ORDER BY c.n DESC, c.token ASC LIMIT 50""".stripMargin,
    "contamination_scores" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
        |shl AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shs
        |  FROM tok),
        |sh AS (SELECT doc_id, UNNEST(shs) AS sh FROM shl),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        |o AS (
        |  SELECT d.doc_id, COUNT(*) AS n_overlap
        |  FROM sh d JOIN bench USING (sh) GROUP BY 1)
        |SELECT s.doc_id AS doc_id, len(s.shs)::BIGINT AS n_shingles,
        |  COALESCE(o.n_overlap, 0) AS n_overlap,
        |  round(COALESCE(o.n_overlap, 0) / nullif(len(s.shs), 0)::DOUBLE, 4) AS overlap_frac
        |FROM shl s LEFT JOIN o ON s.doc_id = o.doc_id
        |ORDER BY doc_id""".stripMargin,
    "corpus_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 9000 THEN 'train'
        |       WHEN ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 9500 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "corpus_diff" -> graft.pipeline.SnapshotDiff.sqlDiff("documents"),
    "source_distribution" ->
      """SELECT source, n, ROUND(n * 100.0 / SUM(n) OVER (), 1) AS pct
        |FROM (SELECT COALESCE(source, 'Unknown') AS source, COUNT(*) AS n
        |      FROM documents GROUP BY 1)
        |ORDER BY n DESC, source ASC""".stripMargin,
    "word_frequencies" ->
      s"""SELECT word, COUNT(*) AS n
         |FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS word
         |      FROM documents)
         |WHERE length(word) >= 3 AND word NOT IN ${Stopwords.sqlInList}
         |GROUP BY word ORDER BY n DESC, word ASC LIMIT 150""".stripMargin,
    "timeline_daily" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |bounds AS (SELECT MIN(date) AS lo, MAX(date) AS hi FROM counts),
        |spine AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM bounds)
        |SELECT s.date AS date, COALESCE(c.n, 0) AS n
        |FROM spine s LEFT JOIN counts c ON s.date = c.date
        |ORDER BY date ASC""".stripMargin,
    "recent_events" ->
      """SELECT event_id, ts, event_type, user_id FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 5""".stripMargin,
    "totals" ->
      """SELECT (SELECT COUNT(*) FROM documents) AS n_documents,
        |       (SELECT COUNT(*) FROM events) AS n_events,
        |       (SELECT COUNT(*) FROM embeddings) AS n_embeddings""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "revenue_per_region" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "top_orders_per_priority" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "customers_without_big_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_custkey IS NOT NULL AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "readability_scores" ->
      TextAnalysis.sqlReadability("documents"),
    "text_stats" ->
      s"""SELECT doc_id,
         |  ${TextAnalysis.sqlTokenCount("text")} AS n_tokens,
         |  ${TextAnalysis.sqlBpeishCount("text")} AS n_bpeish,
         |  round(${TextAnalysis.sqlMeanTokenLen("text")}, 4) AS mean_token_len,
         |  round(${TextAnalysis.sqlAlphaRatio("text")}, 4) AS alpha_ratio,
         |  round(${TextAnalysis.sqlStopRatio("text")}, 4) AS stop_ratio,
         |  ${TextAnalysis.sqlQuality("text")} AS quality,
         |  ${TextAnalysis.sqlLangId("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    // normalize_text: the NFC/NFD suffixes print as raw UTF-8 into the
    // SQL (composed on even ids, combining-mark decomposed on odd);
    // DuckDB's nfc_normalize is the oracle for the engine's NfcNormalize.
    // script_mix: RE2 range twins of the Java ranges; dominant via the
    // same greatest + first-in-order CASE chain.
    "char_entropy" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${ScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |${TextAnalysis.sqlCharEntropy("p", "doc_id", "t")}""".stripMargin
    },
    "script_mix" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${ScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      val counts = TextAnalysis.ScriptRangesSql.map { case (n, r) =>
        n -> TextAnalysis.sqlScriptCount("t", r)
      }
      val mx = s"greatest(${counts.map(c => s"n_${c._1}").mkString(", ")})"
      val dominant = counts.map { case (n, _) =>
        s"WHEN $mx > 0 AND n_$n = $mx THEN '$n'"
      }.mkString("CASE ", " ", " ELSE 'none' END")
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    ${counts.map { case (n, e) => s"CAST($e AS BIGINT) AS n_$n" }.mkString(",\n    ")}
         |  FROM p)
         |SELECT doc_id, ${counts.map(c => s"n_${c._1}").mkString(", ")},
         |  $dominant AS dominant_script
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "lang_script_consistency" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${LangScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents)
         |SELECT doc_id,
         |  ${TextAnalysis.sqlLangScriptConsistency("t")}
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "normalize_text" -> {
      val nfc = " café Ångström"
      val nfd = " café Ångström"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 2 = 0 THEN '$nfc' ELSE '$nfd' END AS raw
         |  FROM documents)
         |SELECT doc_id, md5(raw) AS raw_md5, md5(nfc_normalize(raw)) AS norm_md5
         |FROM t ORDER BY doc_id""".stripMargin
    },
    "lang_distribution" ->
      s"""SELECT ${TextAnalysis.sqlLangId("text")} AS lang_pred, COUNT(*) AS n
         |FROM documents GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    // doc_fingerprints: engine-specific hash (xxhash64) — no SQL oracle;
    // semantics pinned by FingerprintSpec (rows-only driver check).
    "dedup_exact" ->
      """SELECT keeper_id, n_copies FROM (
        |  SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |  FROM documents GROUP BY text)
        |ORDER BY keeper_id""".stripMargin,
    "dedup_weights" ->
      """SELECT doc_id, COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |  1000000 // COUNT(*) OVER (PARTITION BY md5(text)) AS weight_micro
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact_incremental" ->
      """WITH hist AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
        |b AS (SELECT md5(text) AS h, doc_id FROM documents WHERE doc_id >= 250)
        |SELECT MIN(doc_id) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM b WHERE h NOT IN (SELECT h FROM hist)
        |GROUP BY h ORDER BY keeper_id""".stripMargin,
    "jaccard_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |          nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    "similarity_join_exact" ->
      graft.dedup.SetSimJoin.sqlJaccardJoin("documents", "doc_id", "text", 0.9),
    "similarity_join_incremental" ->
      graft.dedup.SetSimJoin.sqlJaccardJoin("documents", "doc_id", "text", 0.9,
        " AND id_b >= 250"),
    // MinHash/LSH replayed relationally (r8): md5-prefix component hashes
    // -> per-(doc, component) min -> 16 band 4-tuples -> candidate pairs
    // share >= 1 band -> exact Jaccard verify. Banding at doc granularity
    // equals the engine's rep granularity: identical token sets have
    // identical signatures, so members pair iff their reps do, and
    // within-group pairs (J = 1.0) share every band. Bucket hashing is
    // equality-preserving (60-bit md5 prefix), so tuple equality here is
    // the engine's bucket equality.
    "dedup_near_minhash" ->
      s"""WITH $sqlNearDupPairCtes
        |SELECT id_a, id_b, jaccard FROM jp WHERE jaccard >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    // Near-dup pairs whose members cross the content-keyed split
    // boundary: the same jp chain, annotated with each side's split
    // (identical texts share a split, so only distinct-bytes near-dups
    // can surface).
    "split_leakage" ->
      s"""WITH $sqlNearDupPairCtes,
        |sp AS (SELECT doc_id,
        |  CASE WHEN ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 9000 THEN 'train'
        |       WHEN ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 9500 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT jp.id_a, jp.id_b, jp.jaccard,
        |  sa.split AS split_a, sb.split AS split_b
        |FROM jp JOIN sp sa ON jp.id_a = sa.doc_id
        |        JOIN sp sb ON jp.id_b = sb.doc_id
        |WHERE jp.jaccard >= 0.9 AND sa.split <> sb.split
        |ORDER BY jp.id_a, jp.id_b""".stripMargin,
    // simhash_pairs: full oracle below (bit votes over md5-prefix token
    // hashes replayed relationally since r7).
    "ngram_jaccard_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      range(1, len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) - 1),
        |      i -> regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')[i] || ' ' ||
        |           regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')[i+1] || ' ' ||
        |           regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')[i+2])) AS shl
        |  FROM documents)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(len(list_filter(a.shl, x -> list_contains(b.shl, x)))::DOUBLE /
        |          nullif(len(list_distinct(a.shl || b.shl)), 0)::DOUBLE, 4) AS jaccard
        |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,
    "dedup_keepers" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, source,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents),
        |jp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
        |          UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, MIN(label) AS keeper_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "dedup_keepers_quality" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      // dedup_keepers' clusters (min-label as the cluster id), then the
      // per-cluster quality election.
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, source,
         |         list_distinct(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS toks
         |  FROM documents),
         |jp AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
         |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
         |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
         |          UNION ALL SELECT id_b, id_a FROM jp),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS label FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |lab AS (SELECT id AS doc_id, MIN(label) AS cl FROM reach GROUP BY id),
         |qs AS (SELECT doc_id, $q AS q FROM documents),
         |rep AS (
         |  SELECT cl, doc_id AS keeper_id,
         |    ROW_NUMBER() OVER (PARTITION BY cl ORDER BY q DESC, doc_id ASC) AS rn
         |  FROM lab JOIN qs USING (doc_id))
         |SELECT l.doc_id, r.keeper_id
         |FROM lab l JOIN rep r ON l.cl = r.cl AND r.rn = 1
         |ORDER BY l.doc_id""".stripMargin
    },
    "corpus_clean" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val l = graft.text.TextAnalysis.sqlLangId("text")
      s"""WITH RECURSIVE filtered AS (
         |  SELECT doc_id, source, text FROM documents
         |  WHERE $q >= 0.5 AND $l = 'en'),
         |t AS (
         |  SELECT doc_id, source,
         |         list_distinct(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS toks
         |  FROM filtered),
         |jp AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
         |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
         |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
         |          UNION ALL SELECT id_b, id_a FROM jp),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS label FROM filtered
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |keepers AS (SELECT id, MIN(label) AS keeper_id FROM reach GROUP BY id)
         |SELECT f.doc_id, f.source, $q AS quality
         |FROM filtered f JOIN keepers k ON f.doc_id = k.id AND k.keeper_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin
    },
    "corpus_clean_classified" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val l = graft.text.TextAnalysis.sqlLangId("text")
      // The classifier chain (ending in qc), then corpus_clean's chain
      // reading from the gated docs instead of raw documents.
      s"""WITH RECURSIVE ${graft.pipeline.QualityClassifier.sqlClassifierCtes()},
         |kept AS MATERIALIZED (
         |  SELECT d.doc_id, d.source, d.text FROM documents d
         |  JOIN qc ON d.doc_id = qc.doc_id AND qc.keep = 1),
         |filtered AS (
         |  SELECT doc_id, source, text FROM kept
         |  WHERE $q >= 0.5 AND $l = 'en'),
         |t AS (
         |  SELECT doc_id, source,
         |         list_distinct(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS toks
         |  FROM filtered),
         |jp AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
         |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
         |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
         |          UNION ALL SELECT id_b, id_a FROM jp),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS label FROM filtered
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |keepers AS (SELECT id, MIN(label) AS keeper_id FROM reach GROUP BY id)
         |SELECT f.doc_id, f.source, $q AS quality
         |FROM filtered f JOIN keepers k ON f.doc_id = k.id AND k.keeper_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin
    },
    "corpus_clean_scaled" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val l = graft.text.TextAnalysis.sqlLangId("text")
      // corpus_clean's oracle MINUS the `a.source = b.source` block
      // predicate: the scaled path dedups corpus-wide.
      s"""WITH RECURSIVE filtered AS (
         |  SELECT doc_id, source, text FROM documents
         |  WHERE $q >= 0.5 AND $l = 'en'),
         |t AS (
         |  SELECT doc_id,
         |         list_distinct(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS toks
         |  FROM filtered),
         |jp AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
         |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
         |    FROM t a JOIN t b ON a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
         |          UNION ALL SELECT id_b, id_a FROM jp),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS label FROM filtered
         |  UNION
         |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
         |keepers AS (SELECT id, MIN(label) AS keeper_id FROM reach GROUP BY id)
         |SELECT f.doc_id, f.source, $q AS quality
         |FROM filtered f JOIN keepers k ON f.doc_id = k.id AND k.keeper_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin
    },
    // dedup_incremental: FULL oracle since r8 — the exact-form discipline
    // of dedup_keepers_scaled applied to the batch-vs-index composition:
    // exact batch-internal CC + exact cross-batch J>=0.9 matches with the
    // component lift. Valid because dedup_keepers_scaled's corpus-wide
    // exact==LSH hash equality covers every pair, including those
    // crossing this query's doc_id%2 split.
    "dedup_incremental" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents),
        |bt AS (SELECT * FROM t WHERE doc_id % 2 = 1),
        |ht AS (SELECT * FROM t WHERE doc_id % 2 = 0),
        |jp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM bt a JOIN bt b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
        |          UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS label FROM bt
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, MIN(label) AS keeper_id FROM reach GROUP BY id),
        |xm AS (
        |  SELECT bid, MIN(iid) AS ex_keeper FROM (
        |    SELECT a.doc_id AS bid, h.doc_id AS iid,
        |      round(len(list_filter(a.toks, x -> list_contains(h.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || h.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM bt a CROSS JOIN ht h)
        |  WHERE jaccard >= 0.9 GROUP BY bid),
        |cm AS (SELECT cc.keeper_id, MIN(xm.ex_keeper) AS comp_ex
        |       FROM cc JOIN xm ON cc.doc_id = xm.bid GROUP BY 1)
        |SELECT cc.doc_id,
        |  COALESCE(cm.comp_ex, cc.keeper_id) AS keeper_id,
        |  CASE WHEN cm.comp_ex IS NULL AND cc.doc_id = cc.keeper_id
        |       THEN 1 ELSE 0 END AS novel
        |FROM cc LEFT JOIN cm USING (keeper_id) ORDER BY cc.doc_id""".stripMargin,
    "dedup_keepers_scaled" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents),
        |jp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
        |          UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, MIN(label) AS keeper_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // Identical exact-CC replay: the 4096 cap never binds at sf0.01
    // (spec-pinned), so the capped form's contract IS the uncapped one.
    "dedup_keepers_capped" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents),
        |jp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
        |          UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, MIN(label) AS keeper_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS toks
        |  FROM documents),
        |jp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
        |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
        |    FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.9),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
        |          UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS label FROM documents
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |keep AS (
        |  SELECT id AS doc_id, MIN(label) AS keeper_id FROM reach GROUP BY id),
        |sizes AS (
        |  SELECT keeper_id, COUNT(*) AS cluster_size FROM keep GROUP BY 1)
        |SELECT cluster_size, COUNT(*) AS n_clusters
        |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin,
    "set_ops" ->
      """SELECT c_custkey, op FROM (
        |  SELECT c_custkey, 'union' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    UNION SELECT c_custkey FROM customer WHERE c_custkey > 50)
        |  UNION ALL
        |  SELECT c_custkey, 'intersect' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    INTERSECT SELECT c_custkey FROM customer WHERE c_custkey > 50)
        |  UNION ALL
        |  SELECT c_custkey, 'except' AS op FROM (
        |    SELECT c_custkey FROM customer WHERE c_custkey <= 100
        |    EXCEPT SELECT c_custkey FROM customer WHERE c_custkey > 50))
        |ORDER BY op, c_custkey""".stripMargin,
    "daily_order_deltas" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT d, n, LAG(n) OVER (ORDER BY d) AS prev_n,
        |       n - COALESCE(LAG(n) OVER (ORDER BY d), 0) AS delta
        |FROM d ORDER BY d""".stripMargin,
    "pricing_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "order_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // The sketch estimate replayed exactly: same integer cent-histogram,
    // same crossing-bucket rule, same interpolation arithmetic. The
    // ::DOUBLE casts matter — a bare 0.9 literal is DECIMAL in DuckDB
    // and CEIL(decimal·n) can differ by one rank from the double product
    // Spark computes.
    "order_percentiles_sketch" ->
      """WITH sk AS (
        |  SELECT o_orderpriority,
        |    CAST(FLOOR(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)::DOUBLE / 10000) AS BIGINT) AS bucket,
        |    COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT o_orderpriority, bucket, cnt,
        |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket) AS cum,
        |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM sk),
        |p50 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.5::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |p90 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.9::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |p99 AS (SELECT o_orderpriority, bucket * 10000 +
        |          CAST(FLOOR(10000.0::DOUBLE * (r - cum + cnt) / CAST(cnt AS DOUBLE)) AS BIGINT) AS pc
        |        FROM (SELECT *, CAST(CEIL(0.99::DOUBLE * n) AS BIGINT) AS r FROM c)
        |        WHERE cum - cnt < r AND r <= cum),
        |cnts AS (SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_orders FROM sk GROUP BY 1)
        |SELECT cnts.o_orderpriority, cnts.n_orders,
        |  ROUND(CAST(p50.pc AS DOUBLE) / 100.0, 2) AS p50,
        |  ROUND(CAST(p90.pc AS DOUBLE) / 100.0, 2) AS p90,
        |  ROUND(CAST(p99.pc AS DOUBLE) / 100.0, 2) AS p99
        |FROM cnts
        |JOIN p50 USING (o_orderpriority)
        |JOIN p90 USING (o_orderpriority)
        |JOIN p99 USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "salted_group_count" ->
      """SELECT l_returnflag AS key, COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin,
    "salted_join_agg" ->
      """SELECT n_name, COUNT(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,
    "pricing_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "knn_bruteforce" ->
      Similarity.sqlKnnBruteForce("vec_id % 50 = 0", 5),
    "embedding_truncate_recall" ->
      Similarity.sqlTruncationRecall("vec_id % 50 = 0", Seq(4, 8, 16, 64), 5),
    "hard_negatives" ->
      Similarity.sqlHardNegatives("vec_id % 50 = 0", 5),
    "cosine_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
        |                     (a,b) -> a+b)) AS nv
        |  FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]),
        |                      (x,y) -> x+y) / (a.nv * b.nv), 6) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "embedding_quantize" -> Similarity.sqlScalarQuantize("embeddings"),
    "knn_quantized" -> Similarity.sqlKnnQuantized("vec_id % 50 = 0", 5),
    // knn_lsh: FULL oracle since r8 — bucket replay + the knn_bruteforce
    // rank tail over the LSH candidate set; recall vs knn_bruteforce is
    // additionally asserted in SimilaritySpec.
    "knn_lsh" -> Similarity.sqlKnnLsh(5),
    "contrastive_triplets" -> Similarity.sqlContrastiveTriplets(0.4),
    "bitext_mine" -> Similarity.sqlBitextMine(4, 1.05),
    "lsh_bucket_assignments" -> Similarity.sqlLshBuckets(),
    "embedding_dedup_keepers" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
        |                     (a,b) -> a+b)) AS nv
        |  FROM embeddings),
        |cp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      round(list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]),
        |                        (x,y) -> x+y) / (a.nv * b.nv), 6) AS cosine
        |    FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |  WHERE cosine >= 0.4),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM cp
        |          UNION ALL SELECT id_b, id_a FROM cp),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS label FROM embeddings
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS vec_id, MIN(label) AS keeper_vec_id
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    // embedding_dedup_keepers_scaled: FULL oracle since r8 — sign buckets
    // replay from printed plane constants, DISTINCT shared-bucket pairs
    // equal the engine's first-matching-table candidate set, verify uses
    // the cosine_pairs arithmetic, CC the recursive-CTE discipline.
    "embedding_dedup_keepers_scaled" ->
      Similarity.sqlEmbeddingDedupKeepersScaled(0.4),
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
    "boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
        |s AS (
        |  SELECT UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
        |  FROM t)
        |SELECT shingle, COUNT(*) AS df FROM s GROUP BY 1 HAVING df >= 5
        |ORDER BY df DESC, shingle ASC""".stripMargin,
    "boilerplate_ngrams_sampled" ->
      """WITH s AS (
        |  SELECT text FROM documents
        |  WHERE ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 < 2000),
        |t AS (SELECT regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM s),
        |sh AS (
        |  SELECT UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
        |  FROM t),
        |c AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
        |SELECT shingle, CAST(FLOOR(df * 10000 / 2000) AS BIGINT) AS df_est
        |FROM c WHERE FLOOR(df * 10000 / 2000) >= 5
        |ORDER BY df_est DESC, shingle ASC""".stripMargin,
    "source_overlap_sampled" ->
      """WITH tok AS (
        |  SELECT COALESCE(source, 'Unknown') AS source,
        |         regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
        |    FROM tok)
        |  WHERE ('0x' || substring(md5(sh), 1, 8))::UBIGINT % 10000 < 2000)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |  CAST(FLOOR(COUNT(*) * 10000 / 2000) AS BIGINT) AS n_shared_est
        |FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_in_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, MIN(ts) AS session_start,
        |                MAX(ts) + INTERVAL 30 MINUTE AS session_end
        |         FROM s GROUP BY user_id, sid)
        |SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts,
        |       sess.session_start AS session_start
        |FROM events e JOIN sess ON e.user_id = sess.user_id
        |  AND e.ts >= sess.session_start AND e.ts < sess.session_end
        |ORDER BY event_id""".stripMargin,
    "corpus_pipeline" -> corpusPipelineSql(None),
    "corpus_pipeline_fineweb" ->
      graft.pipeline.FineWebPipeline.sqlPipeline(
        valuesRel(FineWebFixture.docs), gopherTh = FineWebRuleThresholds),
    "corpus_pipeline_refinedweb" ->
      graft.pipeline.RefinedWebPipeline.sqlPipeline(
        s"(SELECT doc_id, text, $sqlFixtureUrl AS url FROM documents)",
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15),
    "warc_refinedweb" -> {
      val mc = graft.ingest.Boilerplate.sqlMainContent("html")
      val cut = mc.indexOf("SELECT doc_id, CAST(len(fs)")
      val (mcCtes, mcSelect) = (mc.substring(0, cut).trim.stripSuffix(","),
        mc.substring(cut))
      val from =
        s"""(WITH $sqlWarcCtes,
           |h AS (SELECT doc_id,
           |        '<html><body>' || text || '</body></html>' AS html
           |      FROM wr0),
           |${mcCtes.stripSuffix(",")},
           |mcq AS ($mcSelect),
           |ex AS (SELECT m.doc_id, m.main_text AS text, w.source
           |       FROM mcq m JOIN wr0 w USING (doc_id) WHERE m.n_kept >= 1)
           |SELECT doc_id, text, $sqlFixtureUrl AS url FROM ex)""".stripMargin
      graft.pipeline.RefinedWebPipeline.sqlPipeline(from,
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15)
    },
    "refinedweb_outcomes" ->
      graft.pipeline.RefinedWebPipeline.sqlOutcomes(
        s"(SELECT doc_id, text, $sqlFixtureUrl AS url FROM documents)",
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15),
    "refinedweb_funnel" ->
      graft.pipeline.RefinedWebPipeline.sqlFunnel(
        s"(SELECT doc_id, text, $sqlFixtureUrl AS url FROM documents)",
        blocked = Seq("foo.co.uk"),
        gopherTh = FunnelThresholds, repetitionTh = RepetitionThresholds,
        cap = 15),
    "fineweb_funnel" ->
      graft.pipeline.FineWebPipeline.sqlFunnel(
        valuesRel(FineWebFixture.docs), gopherTh = FineWebRuleThresholds),
    "fineweb_incremental" ->
      graft.pipeline.FineWebPipeline.sqlIncremental(
        valuesRel(FineWebFixture.docs), split = 9L,
        gopherTh = FineWebRuleThresholds),
    "corpus_pipeline_ccnet" ->
      graft.pipeline.CcNetPipeline.sqlPipeline(valuesRel(CcNetFixture.docs)),
    "corpus_pipeline_ccnet_crossfit" ->
      graft.pipeline.CcNetPipeline.sqlPipelineCrossFit("documents"),
    "ccnet_funnel" ->
      graft.pipeline.CcNetPipeline.sqlFunnel(valuesRel(CcNetFixture.docs)),
    "corpus_pipeline_gated" -> corpusPipelineSql(
      Some(graft.text.GopherRules.sqlPassExpr("red", FunnelThresholds))),
    "corpus_pipeline_full" -> corpusPipelineSql(
      Some(graft.text.GopherRules.sqlPassExpr("red", FunnelThresholds)),
      Some(RepetitionThresholds)),
    "decontaminate" -> DecontaminateSql,
    "decontaminate_fuzzy" ->
      graft.pipeline.Curation.sqlDecontaminateFuzzy("documents", 0.8),
    "distinctive_terms" ->
      """WITH tok AS (
        |  SELECT COALESCE(source, 'Unknown') AS source,
        |         regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |t AS (
        |  SELECT source, UNNEST(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1])) AS term
        |  FROM tok),
        |tf AS (SELECT source, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |sf AS (SELECT term, COUNT(*) AS n_sources FROM tf GROUP BY 1
        |       HAVING COUNT(*) <= 3),
        |r AS (SELECT tf.source, tf.term, tf.tf, sf.n_sources,
        |        ROW_NUMBER() OVER (PARTITION BY tf.source
        |                           ORDER BY tf.tf DESC, tf.term ASC) AS rk
        |      FROM tf JOIN sf USING (term))
        |SELECT source, CAST(rk AS BIGINT) AS rk, term, tf, n_sources
        |FROM r WHERE rk <= 10
        |ORDER BY source, rk""".stripMargin,
    "events_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view"
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "sample_weighted" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      s"""SELECT doc_id, source, $q AS quality,
         |  CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS BIGINT) AS bucket
         |FROM documents
         |WHERE CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS BIGINT) < $q * 10000.0
         |ORDER BY doc_id""".stripMargin
    },
    "weighted_reservoir" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val clock = graft.pipeline.Curation.sqlReservoirClock("text", q)
      s"""SELECT doc_id, source, quality, res_clock FROM (
         |  SELECT doc_id, source, $q AS quality, $clock AS res_clock
         |  FROM documents WHERE $q > 0.0
         |  ORDER BY res_clock, doc_id LIMIT 100)
         |ORDER BY doc_id""".stripMargin
    },
    "weighted_reservoir_by_source" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val clock = graft.pipeline.Curation.sqlReservoirClock("text", q)
      s"""SELECT doc_id, source, quality, res_clock FROM (
         |  SELECT doc_id, source, $q AS quality, $clock AS res_clock,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY $clock, doc_id) AS rk
         |  FROM documents WHERE $q > 0.0)
         |WHERE rk <= 5
         |ORDER BY doc_id""".stripMargin
    },
    // The incremental face's oracle IS the one-shot cut over the whole
    // corpus — hash-equality against it proves the merge identity.
    "weighted_reservoir_incremental" -> {
      val q = graft.text.TextAnalysis.sqlQuality("text")
      val clock = graft.pipeline.Curation.sqlReservoirClock("text", q)
      s"""SELECT doc_id, source, quality, res_clock FROM (
         |  SELECT doc_id, source, $q AS quality, $clock AS res_clock
         |  FROM documents WHERE $q > 0.0
         |  ORDER BY res_clock, doc_id LIMIT 100)
         |ORDER BY doc_id""".stripMargin
    },
    // Fit-free round-trip oracle: the canonical form is derived from
    // RAW text here (lowercase + ASCII-ws collapse — SplitWhitespace's
    // byte set), so equality proves the Spark-side decode reassembly.
    "tokenizer_roundtrip" ->
      """SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks, ' ')) AS viterbi_md5,
        |  md5(array_to_string(toks, ' ')) AS maxmatch_md5,
        |  1 AS viterbi_ok, 1 AS maxmatch_ok
        |FROM (SELECT doc_id,
        |        regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |      FROM documents)
        |WHERE len(toks) > 0
        |ORDER BY doc_id""".stripMargin,
    // bpe_merges: the one fit whose output IS the fit — the oracle
    // recomputes the training loop itself as a recursive CTE (printed
    // constants would be circular here).
    "bpe_merges" -> graft.text.Bpe.sqlMerges(200),
    "vocab_encode" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |vc AS (
        |  SELECT token, COUNT(*) AS n FROM (
        |    SELECT UNNEST(toks) AS token FROM tok) GROUP BY 1),
        |vocab AS (
        |  SELECT token,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS token_id
        |  FROM vc ORDER BY n DESC, token ASC LIMIT 20),
        |e AS (
        |  SELECT doc_id, UNNEST(list_transform(range(1, len(toks) + 1),
        |    i -> {'pos': i, 'token': toks[i]})) AS u
        |  FROM tok),
        |e2 AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token AS token FROM e)
        |SELECT e2.doc_id, e2.pos, COALESCE(v.token_id, 0) AS token_id
        |FROM e2 LEFT JOIN vocab v USING (token)
        |ORDER BY doc_id, pos""".stripMargin,
    "source_overlap_matrix" ->
      """WITH tok AS (
        |  SELECT COALESCE(source, 'Unknown') AS source,
        |         regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
        |    FROM tok))
        |SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
        |FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "event_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT step, name, n_users FROM (VALUES
        |  (1, 'view',     (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)),
        |  (2, 'click',    (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)),
        |  (3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3))
        |) AS t(step, name, n_users)
        |ORDER BY step""".stripMargin,
    "retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY 1)
        |SELECT c.cohort AS cohort,
        |  date_diff('day', c.cohort, ev.day) AS day_offset,
        |  COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
        |  ROUND(CAST(FLOOR(value / 10.0) AS BIGINT) * 10.0, 4) AS lo,
        |  COUNT(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "scd2_history" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(ts) OVER w AS prev_ts,
        |    LAG(event_type) OVER w AS prev
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type),
        |iv AS (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id, state, valid_from, valid_to,
        |  CAST(valid_to IS NULL AS INT) AS is_current
        |FROM iv ORDER BY user_id, valid_from, state""".stripMargin,
    "value_outliers" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, e.value, m.med
        |  FROM events e JOIN m USING (event_type)
        |  WHERE e.value IS NOT NULL),
        |s AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type AS event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(ANY_VALUE(d.med), 4) AS med,
        |  ROUND(s.mad, 4) AS mad,
        |  CAST(SUM(CASE WHEN abs(d.value - d.med) > 3 * s.mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN s USING (event_type)
        |GROUP BY d.event_type, s.mad
        |ORDER BY event_type""".stripMargin,
    "zorder_codes" -> {
      // The same static bit-interleave formula morton2 builds, in SQL.
      val x = "(o_custkey % 1024)"
      val y = "(o_orderkey % 1024)"
      val z = (0 until 10).map(i =>
        s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"SELECT o_orderkey, CAST($z AS BIGINT) AS z FROM orders ORDER BY o_orderkey"
    },
    "pii_redact" -> {
      val values = PiiFixture.docs
        .map { case (id, t) => s"($id, '${t.replace("'", "''")}')" }
        .mkString(",\n        ")
      s"""WITH masked AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '${graft.pipeline.Pii.EmailRe}', '<EMAIL>', 'g') AS t1
         |  FROM (VALUES
         |        $values) t(doc_id, text)),
         |m2 AS (
         |  SELECT doc_id, text, t1,
         |    regexp_replace(t1, '${graft.pipeline.Pii.Ipv4Re}', '<IP>', 'g') AS t2
         |  FROM masked)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(len(regexp_extract_all(text, '${graft.pipeline.Pii.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t1, '${graft.pipeline.Pii.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t2, '${graft.pipeline.Pii.PhoneRe}')) AS BIGINT) AS n_phones,
         |  regexp_replace(t2, '${graft.pipeline.Pii.PhoneRe}', '<PHONE>', 'g') AS redacted
         |FROM m2
         |ORDER BY doc_id""".stripMargin
    },
    "chunk_texts" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    [x FOR x IN range(1, len(toks) + 1, 48) IF x = 1 OR x + 16 <= len(toks)] AS starts
        |  FROM t WHERE len(toks) > 0),
        |u AS (
        |  SELECT doc_id, toks, n,
        |    UNNEST(list_transform(range(1, len(starts) + 1),
        |      j -> {'idx': j - 1, 'st': starts[j]})) AS w
        |  FROM s)
        |SELECT doc_id, CAST(w.idx AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(toks, w.st, least(w.st + 63, n)), ' ') AS chunk_text
        |FROM u ORDER BY doc_id, chunk_idx""".stripMargin,
    "corpus_mix" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS bucket,
        |    CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
        |                WHEN 'src2' THEN 2500 WHEN 'src3' THEN 500 END AS rate
        |  FROM documents)
        |WHERE rate IS NOT NULL AND bucket < rate
        |ORDER BY doc_id""".stripMargin,
    "corpus_mix_epochs" ->
      """WITH j AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5(text), 1, 8))::UBIGINT % 10000 AS bucket,
        |    CASE source WHEN 'src0' THEN 25000 WHEN 'src1' THEN 10000
        |                WHEN 'src2' THEN 5000 END AS rate
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, source,
        |    UNNEST(range(1, (rate // 10000)
        |      + CASE WHEN bucket < rate % 10000 THEN 1 ELSE 0 END + 1)) AS epoch
        |  FROM j WHERE rate IS NOT NULL)
        |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
        |FROM e ORDER BY doc_id, epoch""".stripMargin,
    "corpus_mix_temperature" ->
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |m AS (SELECT MIN(n) AS nmin FROM c),
        |r AS (
        |  SELECT c.source,
        |    CAST(FLOOR(10000.0 * sqrt(m.nmin::DOUBLE / c.n::DOUBLE)) AS BIGINT) AS rate_bp
        |  FROM c CROSS JOIN m)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE ('0x' || substring(md5(d.text), 1, 8))::UBIGINT % 10000 < r.rate_bp
        |ORDER BY d.doc_id""".stripMargin,
    // The oracle states the shuffle's SEMANTIC: one global ROW_NUMBER
    // over the seeded hash. The engine computes the same rank
    // hierarchically (shard prefix + per-shard window + offsets).
    "corpus_shuffle" ->
      """WITH hs AS (
        |  SELECT doc_id, md5('mix42:' || text) AS h FROM documents)
        |SELECT doc_id,
        |  CAST(FLOOR((('0x' || substring(h, 1, 8))::UBIGINT * 64)::DOUBLE
        |             / 4294967296.0) AS INT) AS shard,
        |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_pos
        |FROM hs ORDER BY shuffle_pos""".stripMargin,
    "adaptive_length_gate" ->
      graft.pipeline.Curation.sqlAdaptiveLengthGate("documents"),
    // Thresholds fit over the WHOLE relation, output restricted to the
    // batch — exactly the merged-state semantic of the final batch.
    "adaptive_length_gate_incremental" ->
      graft.pipeline.Curation.sqlAdaptiveLengthGate("documents",
        extraWhere = " AND t.doc_id >= 250"),
    "jsonl_documents" ->
      s"""WITH src AS (
         |  SELECT doc_id, source, lang,
         |    text || ['', ' "quoted"', e' back\\\\slash', e' line\\nbreak',
         |             e' tab\\there'][CAST(doc_id % 5 AS INT) + 1] AS text
         |  FROM documents),
         |l AS (SELECT ${graft.sources.Jsonl.sqlRenderExpr(
              "doc_id", "source", "lang", "text")} AS line FROM src)
         |SELECT CAST(json_extract_string(line, '$$.doc_id') AS BIGINT)
         |    AS doc_id,
         |  json_extract_string(line, '$$.source') AS source,
         |  json_extract_string(line, '$$.lang') AS lang,
         |  json_extract_string(line, '$$.text') AS text
         |FROM l ORDER BY doc_id""".stripMargin,
    "warc_wet" ->
      s"""WITH $sqlWarcCtes,
         |wt AS (
         |  SELECT uri,
         |    trim(regexp_replace(regexp_replace(
         |      '<html><body>' || text || '</body></html>',
         |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS wet_text
         |  FROM wr0)
         |SELECT uri AS target_uri, '2026-01-01T00:00:00Z' AS warc_date,
         |  wet_text, CAST(length(wet_text) AS BIGINT) AS n_chars,
         |  md5(wet_text) AS digest
         |FROM wt ORDER BY target_uri""".stripMargin,
    "release_shards" ->
      """WITH hs AS (
        |  SELECT doc_id, text, md5('rel42:' || text) AS h FROM documents),
        |o AS (
        |  SELECT text,
        |    len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))::BIGINT
        |      AS n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY h, doc_id) AS pos
        |  FROM hs),
        |c AS (
        |  SELECT n_tokens, text,
        |    SUM(n_tokens) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS off
        |  FROM o),
        |f AS (
        |  SELECT CAST(FLOOR(off / 2048.0) AS BIGINT) AS shard_id, n_tokens,
        |    CAST(('0x' || substring(md5(text), 1, 15))::UBIGINT AS BIGINT) AS fp
        |  FROM c)
        |SELECT shard_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  bit_xor(fp) AS content_fp
        |FROM f GROUP BY 1 ORDER BY shard_id""".stripMargin,
    "sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))::BIGINT AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS off
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(FLOOR(off / 512.0) AS BIGINT) AS chunk_id,
        |  CASE WHEN n_tokens = 0 THEN 0
        |       ELSE CAST(FLOOR((off + n_tokens - 1) / 512.0) AS BIGINT)
        |            - CAST(FLOOR(off / 512.0) AS BIGINT) + 1 END AS n_chunks
        |FROM o ORDER BY doc_id""".stripMargin,
    "packing_boundaries" ->
      graft.pipeline.Curation.sqlPackingBoundaries(
        "documents", "doc_id", "text", 512L),
    "packing_efficiency" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))::BIGINT AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS off
        |  FROM t),
        |p AS (
        |  SELECT n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0
        |         ELSE CAST(FLOOR((off + n_tokens - 1) / 512.0) AS BIGINT)
        |              - CAST(FLOOR(off / 512.0) AS BIGINT) + 1 END AS nc
        |  FROM o),
        |a AS (
        |  SELECT COUNT(*) AS n_docs,
        |    COALESCE(SUM(n_tokens), 0)::BIGINT AS total_tokens,
        |    COALESCE(SUM(CASE WHEN nc > 1 THEN 1 ELSE 0 END), 0)::BIGINT AS straddling_docs,
        |    COALESCE(SUM(GREATEST(nc - 1, 0)), 0)::BIGINT AS boundaries_crossed,
        |    COALESCE(SUM(CASE WHEN n_tokens = 0 THEN 0
        |      ELSE CAST(FLOOR((n_tokens + 511) / 512.0) AS BIGINT) END), 0)::BIGINT
        |      AS padded_chunks
        |  FROM p),
        |b AS (
        |  SELECT *, CAST(FLOOR((total_tokens + 511) / 512.0) AS BIGINT) AS n_chunks
        |  FROM a)
        |SELECT n_docs, total_tokens, n_chunks,
        |  (n_chunks * 512 - total_tokens)::BIGINT AS tail_waste,
        |  straddling_docs, boundaries_crossed, padded_chunks,
        |  (padded_chunks * 512 - total_tokens)::BIGINT AS padded_waste,
        |  round((n_chunks * 512 - total_tokens)::DOUBLE * 100.0 /
        |    nullif((n_chunks * 512)::DOUBLE, 0), 4) AS pct_tail_waste,
        |  round((padded_chunks * 512 - total_tokens)::DOUBLE * 100.0 /
        |    nullif((padded_chunks * 512)::DOUBLE, 0), 4) AS pct_padded_waste
        |FROM b""".stripMargin,
    "k_anonymous_stats" -> graft.pipeline.Curation.sqlKAnonymousStats(5),
    "html_main_content" ->
      ("WITH h AS (SELECT doc_id,\n" +
        "  '<html><body><div class=\"nav\"><a href=\"/\">Home</a> " +
        "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></div><p>'\n" +
        "  || text || '</p><div><a>Privacy</a> <a>Terms</a></div>' ||\n" +
        "  CASE WHEN doc_id % 3 = 0 THEN " +
        "'<section>Read more about this topic here</section>' ELSE '' END\n" +
        "  || '</body></html>' AS html FROM documents),\n" +
        graft.ingest.Boilerplate.sqlMainContent("html") +
        "\nORDER BY doc_id"),
    "warc_records" ->
      s"""WITH $sqlWarcCtes,
         |o AS (
         |  SELECT source, uri, clen, payload,
         |    CAST(COALESCE(SUM(strlen(rec)) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS record_offset
         |  FROM wr)
         |SELECT source, record_offset, uri AS target_uri,
         |  clen AS content_length, substring(payload, 1, 15) AS payload_head
         |FROM o ORDER BY source, record_offset""".stripMargin,
    "warc_html_documents" ->
      s"""WITH $sqlWarcCtes
         |SELECT uri AS target_uri, '2026-01-01T00:00:00Z' AS warc_date,
         |  200 AS http_status,
         |  '<html><body>' || text || '</body></html>' AS body
         |FROM wr0 ORDER BY target_uri""".stripMargin,
    "warc_cdx" ->
      s"""WITH $sqlWarcCtes,
         |o AS (
         |  SELECT source, uri, payload,
         |    CAST(strlen(rec) AS BIGINT) AS record_length,
         |    CAST(COALESCE(SUM(strlen(rec)) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS record_offset
         |  FROM wr),
         |c AS (
         |  SELECT
         |    array_to_string(list_reverse(
         |        string_split(${graft.ingest.Urls.sqlHost("uri")}, '.')), ',')
         |      || ')' ||
         |      lower(CASE WHEN regexp_extract(trim(uri),
         |                   '${graft.ingest.Urls.PathRe}', 1) = '' THEN '/'
         |            ELSE regexp_extract(trim(uri),
         |                   '${graft.ingest.Urls.PathRe}', 1) END) AS urlkey,
         |    regexp_replace('2026-01-01T00:00:00Z', '[^0-9]', '', 'g') AS ts14,
         |    uri AS original,
         |    CASE WHEN trim(regexp_extract(payload,
         |           '(?i)\r\ncontent-type: *([^;\r]+)', 1)) = '' THEN 'unk'
         |      ELSE trim(regexp_extract(payload,
         |           '(?i)\r\ncontent-type: *([^;\r]+)', 1)) END AS mime,
         |    TRY_CAST(regexp_extract(payload,
         |      '^HTTP/[0-9.]+ ([0-9]{3})', 1) AS INT) AS status,
         |    md5(payload) AS digest, source AS filename,
         |    record_offset, record_length
         |  FROM o)
         |SELECT * FROM c
         |ORDER BY urlkey, ts14, filename, record_offset""".stripMargin,
    "release_datasheet" ->
      graft.pipeline.Curation.sqlReleaseDatasheet("documents"),
    "release_manifest" ->
      """WITH t AS (
        |  SELECT COALESCE(source, 'Unknown') AS source,
        |    COALESCE(lang, 'und') AS lang,
        |    md5(text) AS h,
        |    len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))::BIGINT AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT source, lang,
        |    COUNT(*) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_contents
        |  FROM t GROUP BY ROLLUP (source, lang))
        |SELECT COALESCE(source, 'TOTAL') AS source, COALESCE(lang, 'ALL') AS lang,
        |  n_docs, sum_tokens, n_distinct_contents,
        |  round((n_docs - n_distinct_contents)::DOUBLE * 100.0 / n_docs::DOUBLE, 4)
        |    AS pct_dup
        |FROM g
        |ORDER BY source, lang""".stripMargin,
    "release_manifest_sketch" ->
      graft.pipeline.Curation.sqlReleaseManifestSketch("documents"),
    // One NTILE + one ROW_NUMBER state the curriculum semantic; the
    // engine's closed-form tier (== NTILE) and hierarchical (shard,
    // hash) rank (prefix-monotone => hash order) reproduce it exactly.
    "curriculum_order" -> {
      val q = s"COALESCE(${TextAnalysis.sqlQuality("text")}, 0.0)"
      s"""WITH q AS (SELECT doc_id, text, $q AS q FROM documents),
         |r AS (SELECT doc_id, text, q,
         |        NTILE(3) OVER (ORDER BY q, doc_id) AS tier FROM q),
         |p AS (SELECT doc_id, q, tier,
         |        CAST(ROW_NUMBER() OVER (
         |          ORDER BY tier, md5('cur42:' || text), doc_id) AS BIGINT)
         |          AS train_pos
         |      FROM r)
         |SELECT doc_id, q AS quality, tier, train_pos
         |FROM p ORDER BY train_pos""".stripMargin
    },
    "token_spectrum" ->
      """WITH tok AS (
        |  SELECT UNNEST(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS tok
        |  FROM documents),
        |occ AS (SELECT tok, COUNT(*) AS occ FROM tok GROUP BY tok)
        |SELECT occ, COUNT(*) AS n_types, CAST(SUM(occ) AS BIGINT) AS token_mass
        |FROM occ GROUP BY occ ORDER BY occ""".stripMargin,
    "ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |  FROM toks),
        |pairs AS (
        |  SELECT doc_id, substring(md5(s), 1, 15) AS h FROM sh),
        |dfc AS (
        |  SELECT h, COUNT(*) AS df FROM pairs GROUP BY h),
        |per_doc AS (
        |  SELECT p.doc_id,
        |    COUNT(*)::BIGINT AS n_shingles,
        |    SUM(CASE WHEN d.df >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_common
        |  FROM pairs p JOIN dfc d USING (h)
        |  GROUP BY p.doc_id)
        |SELECT t.doc_id,
        |  COALESCE(n_shingles, 0)::BIGINT AS n_shingles,
        |  COALESCE(n_common, 0)::BIGINT AS n_common,
        |  round(COALESCE(n_common, 0)::DOUBLE * 100.0 /
        |    nullif(COALESCE(n_shingles, 0)::DOUBLE, 0), 4) AS pct_common
        |FROM toks t LEFT JOIN per_doc USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "ngram_novelty_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
        |  FROM toks),
        |pairs AS (
        |  SELECT doc_id, substring(md5(s), 1, 15) AS h FROM sh),
        |dfc AS (
        |  SELECT h, COUNT(*) AS df FROM pairs GROUP BY h),
        |per_doc AS (
        |  SELECT p.doc_id,
        |    COUNT(*)::BIGINT AS n_shingles,
        |    SUM(CASE WHEN d.df >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_common
        |  FROM pairs p JOIN dfc d USING (h)
        |  WHERE p.doc_id >= 250
        |  GROUP BY p.doc_id)
        |SELECT t.doc_id,
        |  COALESCE(n_shingles, 0)::BIGINT AS n_shingles,
        |  COALESCE(n_common, 0)::BIGINT AS n_common,
        |  round(COALESCE(n_common, 0)::DOUBLE * 100.0 /
        |    nullif(COALESCE(n_shingles, 0)::DOUBLE, 0), 4) AS pct_common
        |FROM toks t LEFT JOIN per_doc USING (doc_id)
        |WHERE t.doc_id >= 250
        |ORDER BY t.doc_id""".stripMargin,
    "curation_report" ->
      """WITH t AS (
        |  SELECT source,
        |    len(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+'))::BIGINT AS n_tok,
        |    len(list_distinct(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')))::BIGINT AS n_dis
        |  FROM documents)
        |SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |  round(CAST(SUM(n_tok) AS BIGINT)::DOUBLE / COUNT(*), 4) AS mean_tokens,
        |  round(CAST(SUM(n_dis) AS BIGINT)::DOUBLE /
        |    nullif(CAST(SUM(n_tok) AS BIGINT), 0)::DOUBLE, 4) AS distinct_token_ratio,
        |  round(CAST(SUM(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
        |    * 100.0 / COUNT(*), 1) AS pct_short
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
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
              tolFp = 100000000000L)}""".stripMargin,
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
    // repetition_stats oracle: the RELATIONAL formulation (explode bigrams
    // -> group -> max/sum) of the same signals the Spark side computes
    // per-row via a sorted-run fold — pinning the two formulations equal.
    "repetition_stats" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks FROM documents),
        |b AS (
        |  SELECT doc_id, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_distinct,
        |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bgs
        |  FROM t),
        |c AS (
        |  SELECT doc_id, bg, COUNT(*) AS c
        |  FROM (SELECT doc_id, UNNEST(bgs) AS bg FROM b) GROUP BY 1, 2),
        |m AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT b.doc_id AS doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  round(1.0 - n_distinct::DOUBLE / nullif(n_tokens, 0)::DOUBLE, 4) AS dup_token_frac,
        |  round(m.mx::DOUBLE / nullif(m.tot, 0)::DOUBLE, 4) AS top_bigram_frac
        |FROM b LEFT JOIN m ON b.doc_id = m.doc_id ORDER BY doc_id""".stripMargin,
    // media stub features (md5-prefix discipline, r9) -> brute-force kNN:
    // the whole multimodal/similarity composition replays in DuckDB.
    "media_embedding_knn" -> Multimodal.sqlMediaEmbeddingKnn(3),
    "image_ahash_pairs" -> Multimodal.sqlImageAhashPairs(3),
    "image_ahash_real_pairs" -> Multimodal.sqlImageAhashRealPairs(3),
    "audio_ahash_real_pairs" -> Multimodal.sqlAudioAhashRealPairs(3),
    "image_resize_real" -> Multimodal.sqlImageResizeReal,
    "video_frames_real" -> Multimodal.sqlVideoFramesReal,
    // crawl_then_dashboard: batch-equivalence — the streaming-grown sink
    // IS the one-shot distinct article set (each tick's re-crawls drop
    // in the sink-key anti-join), so the dashboard replays from
    // `documents` with the fixture's derivations inlined.
    "crawl_then_dashboard" ->
      s"""WITH arts AS (
         |  SELECT doc_id,
         |    'https://ex.com/a/' || CAST(doc_id AS VARCHAR) AS sources,
         |    text AS content,
         |    COALESCE(source, 'Unknown') AS src,
         |    strftime(DATE '2024-01-01' + (doc_id % 365) * INTERVAL 1 DAY,
         |             '%Y-%m-%d') AS pdate
         |  FROM documents),
         |tl_counts AS (SELECT pdate, COUNT(*) AS n FROM arts GROUP BY pdate),
         |tl_bounds AS (SELECT MIN(pdate) AS lo, MAX(pdate) AS hi FROM tl_counts),
         |tl_spine AS (
         |  SELECT strftime(CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
         |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d') AS pdate
         |  FROM tl_bounds),
         |words AS (
         |  SELECT word, COUNT(*) AS n
         |  FROM (SELECT UNNEST(regexp_extract_all(lower(content), '[a-zA-Z]+')) AS word
         |        FROM arts)
         |  WHERE length(word) >= 3 AND word NOT IN ${Stopwords.sqlInList}
         |  GROUP BY word ORDER BY n DESC, word ASC LIMIT 150)
         |SELECT section, k, v, n FROM (
         |  SELECT 'total' AS section, 'articles' AS k, CAST(NULL AS VARCHAR) AS v,
         |    (SELECT COUNT(*) FROM arts)::BIGINT AS n
         |  UNION ALL
         |  SELECT 'source', src, NULL, COUNT(*)::BIGINT FROM arts GROUP BY src
         |  UNION ALL
         |  SELECT 'timeline', sp.pdate, NULL, COALESCE(c.n, 0)::BIGINT
         |  FROM tl_spine sp LEFT JOIN tl_counts c USING (pdate)
         |  UNION ALL
         |  SELECT 'recent', CAST(rk AS VARCHAR), sources, CAST(NULL AS BIGINT)
         |  FROM (SELECT sources,
         |          row_number() OVER (ORDER BY pdate DESC, sources DESC) AS rk
         |        FROM arts) WHERE rk <= 5
         |  UNION ALL
         |  SELECT 'word', word, NULL, n::BIGINT FROM words)
         |ORDER BY section, k""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 1 THEN 'audio' WHEN 2 THEN 'video'
        |                  ELSE 'image' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  16 AS feat_dim
        |FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  UNNEST(generate_series(0, strlen(text) % 7)) AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
    // resize stub arithmetic: keep every k-th byte (k = n div target),
    // capped at target; payloads <= target pass through
    "multimodal_resize" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  CAST(strlen(text) AS BIGINT) AS orig_bytes,
        |  CAST(CASE WHEN strlen(text) <= 64 THEN strlen(text)
        |       ELSE LEAST(64, (strlen(text) - 1) // GREATEST(1, strlen(text) // 64) + 1)
        |       END AS BIGINT) AS resized_bytes
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id""".stripMargin,
  ) ++
    // Printed-constant oracles for the k-means ANN family: present only
    // after the corresponding query has run and stashed its seeded
    // deterministic fit (Verify executes every query before dumping this
    // map — see FittedOracle). Absent → the driver's rows-only fallback.
    FittedOracle.oracleEntries

  /** Host mix for the `domain_caps` fixture URLs: deliberately
    * domain-skewed (6/10 hosts under one registered domain) plus a
    * two-label public-suffix case, so the cap is only correct if
    * subdomains collapse to eTLD+1 and `foo.co.uk` survives intact. */
  private val DomainCapHosts = Seq(
    "news.example.com", "blog.example.com", "shop.example.com",
    "example.com", "cdn.example.com", "static.example.com",
    "mirror.openweb.org", "data.openweb.org",
    "docs.data.net", "archive.foo.co.uk")

  /** Non-latin samples planted by `script_mix` (index = doc_id mod 5,
    * 1-based into this list; mod 0 keeps the latin fixture text). */
  private val ScriptSamples = Seq(
    "привет мир сегодня", "你好世界今天 𠀀😀", "γεια σου κόσμε", "مرحبا بالعالم")

  /** WARC archive blobs built from the documents table (one archive per
    * source, records ordered by doc_id) — the `warc_records` /
    * `warc_html_documents` fixture; the oracle constructs the identical
    * record bytes in SQL (e'\r\n' escapes), so the gate proves
    * [[graft.sources.Warc.parse]] inverts the construction exactly. */
  private def warcBlobs(docs: DataFrame): DataFrame = {
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
  private val sqlWarcCtes: String =
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
  private val LangScriptSamples = Seq(
    "shi bu wo ni zai hen ma ba",
    "the and of занимает большое количество текста здесь",
    "der und das ist nicht ein mit",
    "這是一個測試文本沒有標記詞")

  /** Deterministic per-doc URLs over the skewed host mix — shared by the
    * `domain_caps` / `domain_blocklist` queries and their oracles. */
  private def withFixtureUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(lit("https://"),
      element_at(array(DomainCapHosts.map(lit(_)): _*),
        (col("doc_id") % 10 + 1).cast("int")),
      lit("/"), col("source"), lit("/"), col("doc_id")))

  /** The fixture-URL construction as DuckDB SQL (the oracle twin of
    * [[withFixtureUrls]]). */
  private def sqlFixtureUrl: String =
    s"'https://' || [${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1] || '/' || source || '/' || CAST(doc_id AS VARCHAR)"

  /** Fixture HTML with a full anchor zoo (r10, `host_link_graph` /
    * `anchor_texts` / `web_trustrank`): an absolute cross-host link, a
    * root-relative and a path-relative same-host link (self-loops at
    * domain granularity), a scheme-relative cross-host link, plus the
    * drop cases — fragment-only, mailto:, and an anchor with no href.
    * Both engines construct identical bytes ([[sqlLinkHtml]]); the
    * extraction + resolution mirror is what the oracles check. */
  private def withLinkHtml(docs: DataFrame): DataFrame = {
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
  private def sqlLinkHtml: String = {
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
  private def withCanonicalHtml(docs: DataFrame): DataFrame =
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
  private def sqlCanonicalHtml: String =
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
  private def withSitemapXml(docs: DataFrame): DataFrame = {
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
  private def sqlSitemapXml: String = {
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
  private val RobotsTxtVariants: Seq[Seq[String]] = Seq(
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
  private val HostRobotsRows: Seq[(String, String)] = {
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

  private def withRobotsTxt(docs: DataFrame): DataFrame = {
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
  private def sqlRobotsTxt: String = {
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
  private val SpamPathSuffixes = Seq(
    "", "/casino-bonus", "/free-download/poker-night", "/betting-tips", "/about")

  /** Fixture URLs with the spam-path suffixes appended (doc_id mod 5). */
  private def withSpamUrls(docs: DataFrame): DataFrame =
    withFixtureUrls(docs).withColumn("url", concat(col("url"),
      element_at(array(SpamPathSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withSpamUrls]]'s url expression. */
  private def sqlSpamUrl: String =
    s"($sqlFixtureUrl || [${SpamPathSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Fixture URLs with deterministic SECTION paths (`/sec<id mod 7>/
    * page/<id>`) so robots prefix rules can target known sections. */
  private def withRobotsUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(lit("https://"),
      element_at(array(DomainCapHosts.map(lit(_)): _*),
        (col("doc_id") % 10 + 1).cast("int")),
      lit("/sec"), col("doc_id") % 7, lit("/page/"), col("doc_id")))

  /** DuckDB twin of [[withRobotsUrls]]'s url expression. */
  private def sqlRobotsUrl: String =
    s"('https://' || [${DomainCapHosts.map(h => s"'$h'").mkString(", ")}]" +
      "[CAST(doc_id % 10 AS INT) + 1] || '/sec' || CAST(doc_id % 7 AS VARCHAR)" +
      " || '/page/' || CAST(doc_id AS VARCHAR))"

  /** Card-number suffixes planted by doc id for `pii_credit_cards`: a
    * Luhn-valid Visa test number, its checksum-failing twin, a valid
    * Mastercard beside a Luhn-failing 13-digit serial (two candidates,
    * one valid — the conditional redaction masks BOTH), and a digit run
    * too short to be a candidate at all. */
  private val CcTextSuffixes = Seq(
    "",
    " pay 4111 1111 1111 1111 today",
    " ref 4111-1111-1111-1112 case",
    " order 5500 0000 0000 0004 shipped serial 1234567890123 x",
    " invoice 99 1234567 internal")

  private def withCcTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(CcTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withCcTexts]]'s text expression. */
  private def sqlCcText: String =
    s"(text || [${CcTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Mojibake suffixes planted by doc id for `mojibake_repair` — BUILT
    * from the repair table ([[graft.text.Encoding.moj]]) so fixture and
    * table cannot drift: accented-letter corruption, punctuation
    * corruption, and symbol corruption. */
  private val MojTextSuffixes: Seq[String] = {
    import graft.text.Encoding.moj
    Seq(
      "",
      s" Caf${moj("é")} d${moj("é")}j${moj("à")} vu",
      s" don${moj("’")}t ${moj("“")}quote${moj("‘")} me ${moj("–")} ok",
      s" 25${moj("°")}C ${moj("€")}50 ${moj("™")}")
  }

  private def withMojTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(MojTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 4 + 1).cast("int"))))

  /** DuckDB twin of [[withMojTexts]]'s text expression. */
  private def sqlMojText: String =
    s"(text || [${MojTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 4 AS INT) + 1])"

  /** The corpus-wide MinHash→band→verify near-dup chain shared by the
    * `dedup_near_minhash` and `split_leakage` oracles: md5-quad signature
    * components (64 hashes, 16 bands of 4), banded candidates, exact
    * Jaccard verify in `jp`. Pre-stripped (no margin bars) so it
    * interpolates into stripMargin templates untouched. */
  private def sqlNearDupPairCtes: String =
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
  private val BadWordTextSuffixes: Seq[String] = Seq(
    "",
    " buy viagra online today",
    " the sextonbury parish xxxl archive",
    " live xxx casino stream tonight",
    " plain family picnic notes")

  private def withBadWordTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(BadWordTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withBadWordTexts]]'s text expression. */
  private def sqlBadWordText: String =
    s"(text || [${BadWordTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Damage suffixes planted by doc id for `encoding_hygiene`:
    * replacement characters, stray C0 controls, mojibake markers (from
    * the repair table), and a clean ASCII tail. */
  private val HygieneTextSuffixes: Seq[String] = Seq(
    "",
    " bad �� bytes",
    " ctl\u0001\u0002\u0007x",
    s" marker ${graft.text.Encoding.moj("é")}${graft.text.Encoding.moj("è")} twice",
    " plain ascii tail")

  private def withHygieneTexts(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      element_at(array(HygieneTextSuffixes.map(lit(_)): _*),
        (col("doc_id") % 5 + 1).cast("int"))))

  /** DuckDB twin of [[withHygieneTexts]]'s text expression. */
  private def sqlHygieneText: String =
    s"(text || [${HygieneTextSuffixes.map(x => s"'$x'").mkString(", ")}]" +
      "[CAST(doc_id % 5 AS INT) + 1])"

  /** Funnel thresholds tuned to the synthetic corpus: the word-count
    * floor discriminates (doc lengths straddle 40) while the stop-hits
    * rule is relaxed to 1 ('the' is the only required word the word-soup
    * generator emits). */
  private val FunnelThresholds =
    graft.text.GopherRules.Thresholds(minWords = 40L, minStopHits = 1L)

  /** Repetition cuts tuned to the synthetic corpus (Gopher's published
    * cuts drop nothing that survives the rule gate here — small-vocab
    * word soup repeats bigrams mildly, never line/paragraph-wise): the
    * tightened top-2-gram and dup-5-gram fractions make stage 3c a REAL
    * filter at sf0.01, so the `corpus_pipeline_full` hash-match checks
    * discrimination, not just wiring. */
  private val RepetitionThresholds =
    graft.text.GopherRepetition.Thresholds(maxTop2Frac = 0.12,
      maxDup5Frac = 0.10)

  /** Gopher rule cuts for the FineWeb fixture pages (short multi-line
    * prose): the word floor drops to 20 so a 3-line page can pass while
    * doc 6's 15-word page still fails, and one stop hit suffices. */
  private val FineWebRuleThresholds =
    graft.text.GopherRules.Thresholds(minWords = 20L, minStopHits = 1L)

  /** Render an inline fixture as a DuckDB VALUES relation aliased
    * t(doc_id, text). Newlines become `chr(10)` concats so the emitted
    * SQL stays single-escaped through the JSON dump. */
  private def valuesRel(docs: Seq[(Long, String)]): String = {
    val rows = docs.map { case (id, t) =>
      s"($id, '${t.replace("'", "''").replace("\n", "' || chr(10) || '")}')"
    }.mkString(",\n          ")
    s"(VALUES\n          $rows) t(doc_id, text)"
  }
}

/** Planted robots rules for `robots_exclusion` — every decision branch:
  * whole-host block, section block with a longer allow punched through,
  * an exact-length tie (allow wins), an allow-only host, unlisted hosts
  * (allowed by default), and the RFC 9309 wildcards (r10): a mid-`*`
  * disallow, an end-anchored `$` disallow, and a wildcard disallow with
  * a more specific wildcard allow punched through. Shared by the query
  * and its VALUES oracle. */
object RobotsRulesFixture {
  val rules: Seq[(String, String, String)] = Seq(
    ("news.example.com", "disallow", "/"),
    ("blog.example.com", "disallow", "/sec1"),
    ("blog.example.com", "allow", "/sec1/page"),
    ("docs.data.net", "disallow", "/sec"),
    ("docs.data.net", "allow", "/sec3"),
    ("mirror.openweb.org", "disallow", "/sec2"),
    ("mirror.openweb.org", "allow", "/sec2"),
    ("archive.foo.co.uk", "allow", "/"),
    // wildcards: shop blocks ids starting '1' in any section; cdn blocks
    // paths ENDING in 44; static blocks all sections but re-allows sec2
    // via the longer wildcard allow
    ("shop.example.com", "disallow", "/sec*/page/1*"),
    ("cdn.example.com", "disallow", "*44$"),
    ("static.example.com", "disallow", "/sec*"),
    ("static.example.com", "allow", "/sec2/*"))
}

/** Cleanup for the per-app IVF store scratch dirs (`knn_ivf_stored`):
  * per-app paths can't collide across concurrent JVMs, but they would
  * accumulate in tmp across runs without reclamation. Two layers —
  * a shutdown delete (clean exits) and a stale-sibling sweep (crashed
  * runs never reach their shutdown hook; the next run deletes siblings
  * untouched for 6+ hours — far beyond any live run, so a CONCURRENT
  * JVM's fresh store is never swept). Registration is idempotent per
  * path; sweep failures are best-effort by design (cleanup must never
  * fail a query). */
object IvfStoreScratch {
  private val StaleMs = 6L * 3600 * 1000
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def deleteOnExit(path: String): Unit =
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
        catch { case _: java.io.IOException => () }))
      sweepStaleSiblings(new java.io.File(path))
    }
  private def sweepStaleSiblings(dir: java.io.File): Unit = {
    val sibs = Option(dir.getParentFile).flatMap(p => Option(p.listFiles()))
      .getOrElse(Array.empty[java.io.File])
    val cutoff = System.currentTimeMillis() - StaleMs
    sibs.foreach { f =>
      if (f.getAbsolutePath != dir.getAbsolutePath && f.lastModified() < cutoff)
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: java.io.IOException => () }
    }
  }
}

/** Inline PII corpus (the synthetic documents contain no PII, so the scrub
  * query gets its own fixture; the same literals feed the VALUES oracle). */
object PiiFixture {
  val docs: Seq[(Long, String)] = Seq(
    (1L, "contact alice.smith+spam@example.co.uk or call +1 (555) 123-4567 today"),
    (2L, "server at 192.168.1.254 responded; backup at 10.0.0.7 did not"),
    (3L, "no sensitive content here, just words and the number 42"),
    (4L, "mail bob@corp.io and carol_d@mail.example.org from 555-867-5309"),
    (5L, "edge: version 1.2.3.4 of the lib pinged 8.8.8.8 at dawn"))
}

/** Edge corpus for the Gopher rule signals: the synthetic documents are
  * single-line low-stopword word soup (every doc fails the stop-hits
  * rule), so this fixture plants one document per rule branch — a
  * genuine PASS, bullet walls, ellipsis walls, symbol spam, digit spam,
  * over-long tokens, a too-short doc, the four-dot edge, and the empty
  * string (NULL-ratio parity). */
object GopherFixture {
  private val prose =
    "The committee met with the board to review all of the plans that " +
    "have been made for the coming year and they agreed that the work " +
    "should continue with the same care and attention to detail that " +
    "the team have shown before because the results of the effort were " +
    "clear to everyone and the plan will be ready to share with all of " +
    "the members next week after the final review is complete there."
  val docs: Seq[(Long, String)] = Seq(
    (1L, prose),                                  // passes every rule
    (2L, "- alpha item one here\n- beta item two here\n* gamma item three\n" +
         "\t- delta four\n• epsilon five\n- zeta six\n- eta seven\n" +
         "* theta eight\n- iota nine\nonly prose line of the page"),
    (3L, "the first thought trails off...\nthe second does too... \n" +
         "and the third as well...\t\na final plain line of the text"),
    (4L, "### heading spam ## with #tags# and more... dots... here... " +
         "plus #extra #hash #marks everywhere... in the text"),
    (5L, "just nine words of text in this tiny doc"),
    (6L, "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis " +
         "antidisestablishmentarianism floccinaucinihilipilification " +
         "honorificabilitudinitatibus incomprehensibilities"),
    (7L, "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 " +
         "the and of 42 17 93 55 28 61 84"),
    (8L, "dots.... four in the a row with to of and"),
    (9L, ""))
}

/** Planted repeats for the Gopher repetition signals (the synthetic
  * documents are single-line, so the line/paragraph rules never fire on
  * them): a clean multi-line page that PASSES, a duplicated line, a
  * duplicated paragraph, a stuffed bigram, a doc whose ONLY violation
  * is a twice-occurring 5-gram (distinct filler dilutes every shorter
  * n-gram under its cut, demonstrating the threshold ladder), a
  * repeated 10-gram sentence (which necessarily drags its sub-n-grams
  * over their cuts too — the ladder is monotone downward), the empty
  * doc, and a tiny all-distinct doc that must NOT fire the top-n-gram
  * rule. */
object RepetitionFixture {
  private val fiveGram = "one two three four five"
  private val tenGram =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  val docs: Seq[(Long, String)] = Seq(
    (1L, "the morning report covers local news from the harbor district\n" +
         "a second line adds fresh detail about evening market trading\n" +
         "closing notes thank readers for their continued weekly support\n" +
         "nothing on this page repeats so every fraction stays small\n" +
         "a final sentence rounds out the sample with calm words"),
    (2L, "subscribe to our newsletter today\nsome genuine article content\n" +
         "subscribe to our newsletter today\nmore real words in between\n" +
         "subscribe to our newsletter today"),
    (3L, "news update for the town\n\nnews update for the town\n\n" +
         "fresh other words now"),
    (4L, "best price best price best price now with some other calm words here"),
    (5L, fiveGram + " " + (1 to 60).map(i => s"w$i").mkString(" ") +
         " " + fiveGram),
    (6L, tenGram + " filler words sit between the copies " + tenGram),
    (7L, ""),
    (8L, "tiny doc here"))
}

/** Multi-line pages for the C4 line filters (the synthetic documents are
  * single-line): kept/dropped line variants plus each page-level drop. */
object C4Fixture {
  val docs: Seq[(Long, String)] = Seq(
    (1L, "This is the first good sentence of the page.\n" +
         "short line.\n" +
         "this line has plenty of words but no terminal punctuation\n" +
         "Enable javascript to view the comments on this page.\n" +
         "Is this a fine question sentence with enough words?\n" +
         "An exclamation sentence with plenty of words here!\n" +
         "He said \"this quoted sentence ends with a quote mark.\"\n" +
         "   A sentence with trailing spaces after the period.   "),
    (2L, "A perfectly fine long sentence number one here.\n" +
         "This page however mentions Lorem Ipsum filler text.\n" +
         "A perfectly fine long sentence number three here.\n" +
         "A perfectly fine long sentence number four here."),
    (3L, "A good long sentence before the code block starts.\n" +
         "function f() { return 42; }\n" +
         "Another good long sentence right after the code.\n" +
         "And one more good long sentence to close it."),
    (4L, "Only one good long sentence lives on this page.\n" +
         "plus a short tail.\n" +
         "and nothing else without punctuation"),
    (5L, "Exactly three good sentences make this page survive.\n" +
         "Here then is the second of the three sentences.\n" +
         "And here at last is the third full sentence."))
}

/** Line-structured corpus for the FineWeb end-to-end preset — every stage
  * gets a designated victim (validated in FineWebPipelineSpec):
  * C4 page kills (3 braces, 4 lorem-ipsum, 5 thin), a C4 line kill inside
  * a survivor (2), a Gopher-rules kill (6, under the word floor), a
  * repetition kill (7, duplicated lines), an offset-shifted shared
  * passage for the ANCHORED substring dedup (8 keeper / 9 loser — the
  * shared 25-token passage sits at different token offsets), an
  * exact-dup pair whose leading tokens are all non-anchors so it reaches
  * the exact stage intact (11 keeper / 13 loser), a contaminated doc
  * sharing two sentences with the benchmark slice (12), the benchmark
  * doc itself (20, `% 10`), and DSIR targets (9, 21, `% 3` among
  * survivors) vs the common-vocabulary docs the per-token weight floor
  * drops. */
object FineWebFixture {
  private val passage =
    "the ancient library held countless scrolls from forgotten ages of distant history.\n" +
    "scholars traveled great distances to study the rare manuscripts kept safely stored within."
  val docs: Seq[(Long, String)] = Seq(
    (1L, "morning light spread slowly across the quiet valley floor.\n" +
         "farmers walked out early to tend their growing fields.\n" +
         "children played beside the river while elders watched calmly.\n" +
         "evening brought a gentle rain that cooled the warm earth."),
    (2L, "click here\n" +
         "please visit our javascript page for more details now.\n" +
         "travelers crossed the old wooden bridge before sunrise today.\n" +
         "merchants sold spices and cloth in the crowded market square.\n" +
         "lanterns glowed softly along the narrow cobbled streets tonight."),
    (3L, "this page contains code like {var x = 1} inside.\n" +
         "the parser should reject every page that has braces.\n" +
         "three more words complete this line properly today friend."),
    (4L, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\n" +
         "the filler text above marks this page as boilerplate.\n" +
         "nothing here should ever survive the cleaning stage today."),
    (5L, "only two proper lines exist within this short page.\n" +
         "that is one line fewer than the cleaner requires."),
    (6L, "five short words end here.\n" +
         "the line also stays tiny.\n" +
         "of course this stops now."),
    (7L, "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "one different closing line ends this strange page quietly."),
    (8L, "archivists opened the heavy eastern door.\n" + passage + "\n" +
         "visitors often remained inside reading until the lamps burned low."),
    (9L, "seven caretakers guarded the heavy eastern door.\n" + passage + "\n" +
         "copied chronicles filled the lower shelves beyond the great staircase.\n" +
         "apprentices carried fresh candles upstairs every single winter evening."),
    (11L, "matching mirrored replica volumes repeat every word precisely today.\n" +
          "the deduplicator must keep only the earliest copy.\n" +
          "later copies should quietly disappear now."),
    (12L, "the benchmark suite contains famous questions about rivers.\n" +
          "which long river crosses the largest desert on earth.\n" +
          "students answered the difficult geography quiz with ease."),
    (13L, "matching mirrored replica volumes repeat every word precisely today.\n" +
          "the deduplicator must keep only the earliest copy.\n" +
          "later copies should quietly disappear now."),
    (14L, "zephyr quartz vortex jumbled kaleidoscope fragments drifted with haze.\n" +
          "prism nebula quasar flux shimmered behind murky violet fog.\n" +
          "glyph runes etched obsidian tablets humming with arcane static."),
    (21L, "quiet market mornings brought farmers and merchants to the river.\n" +
          "the old library beside the bridge stored countless village records.\n" +
          "children watched lanterns glow along the valley streets each evening."),
    (20L, "the benchmark suite contains famous questions about rivers.\n" +
          "which long river crosses the largest desert on earth.\n" +
          "examiners graded every answer sheet before the deadline passed."))
}

/** Gnarly-URL fixture for the canonicalization queries: case games,
  * default and non-default ports, tracking params, unsorted params,
  * fragments, trailing and duplicate slashes, empty paths, a scheme-less
  * malformed link, and two pairs (1/8, 3/4) that only collide AFTER
  * canonicalization. */
object UrlFixture {
  val urls: Seq[(Long, String)] = Seq(
    (1L, "https://Example.COM:443/Path/To/Page?utm_source=x&b=2&a=1#frag"),
    (2L, "HTTP://example.com:80//a//b/?z=1&y=2&"),
    (3L, "https://example.com/"),
    (4L, "https://example.com#top"),
    (5L, "https://example.com/a?fbclid=abc123"),
    (6L, "relative/path#section"),
    (7L, "http://example.com:8080/x?port=kept"),
    (8L, "https://example.com/Path/To/Page?a=1&utm_medium=m&b=2"),
    (9L, " https://blog.example.com/posts/spark-tips/ "),
    (10L, "ftp://Files.Example.com:21/pub/data.csv"),
    (11L, "https://example.com/search?q=spark+sql&gclid=1&lang=en"),
    (12L, "https://example.com/a/b/c///"))
}

/** Inline multi-paragraph corpus for the paragraph-dedup queries (the
  * synthetic documents table is single-line text, so paragraph structure
  * needs its own fixture; the same literals feed the VALUES oracle).
  * Engineered edges: a case/whitespace variant of the license paragraph
  * (doc 3 — normalization must merge it), a pure-boilerplate doc (5 —
  * must come back empty), a whitespace-only paragraph (doc 7 — dropped,
  * counted neither kept nor removed), and a 2-occurrence repeat (docs
  * 7/8 — removed at minOccurrences=2, SURVIVES at 3). */
/** Fixture for the CCNet preset: every stage has designated victims —
  * repeated License/Nav paragraphs (stage-1 paragraph dedup; doc 4 is
  * ALL boilerplate and vanishes), a French doc and a gibberish doc
  * (stage-2 language gate), and an English doc of rare vocabulary whose
  * self-fit bigram cost lands it in the tail tier (stage-3 cut). */
object CcNetFixture {
  private val License =
    "This document is licensed under the terms of the open content license."
  private val Nav = "Home | About | Contact | Privacy"
  val docs: Seq[(Long, String)] = Seq(
    (1L, s"$License\n\nthe quick brown fox jumps over the lazy dog and runs to the river.\n\n$Nav"),
    (2L, s"$License\n\nthe cat sat on the mat and the dog sat on the rug by the door.\n\n$Nav"),
    (3L, s"the sun rose over the hills and the farmers went to the fields early.\n\n$Nav"),
    (4L, s"$License\n\n$Nav"),
    (5L, "le vieux port de la ville est dans la brume et les bateaux dorment pour la nuit."),
    (6L, "zorp blick frumble quax vantor miskle dron plif warx jentu klavor brint."),
    (7L, "the rain fell on the roof and the children listened to the storm in the dark."),
    (8L, "the baker made bread in the morning and the town came to the shop for it."),
    (9L, "quantum chromodynamics explains that confinement of the color charge is in the gluon field."),
    (10L, "the teacher read the book to the class and the students wrote notes in the hall."))
}

object ParagraphFixture {
  private val License =
    "This document is licensed under the Creative Commons Attribution license."
  private val Nav = "Home | About | Contact | Privacy Policy"
  private val Subscribe = "Subscribe to our newsletter for weekly updates."
  val docs: Seq[(Long, String)] = Seq(
    (1L, s"$License\n\nSpark shuffles data between stages when keys change.\n\n$Nav"),
    (2L, s"$License\n\nBroadcast joins avoid shuffles for small dimension tables.\n\n$Nav"),
    (3L, "  this   DOCUMENT is Licensed under the creative commons attribution license.  " +
      s"\n\nPartition pruning skips files outside the predicate range.\n\n$Subscribe"),
    (4L, s"$Nav\n\n$Subscribe\n\nAdaptive execution re-plans joins at runtime using observed sizes."),
    (5L, s"$License\n\n$Nav\n\n$Subscribe"),
    (6L, "A wholly unique document with a single paragraph."),
    (7L, s"Columnar formats let scans skip unread columns.\n\n   \n\n$Subscribe"),
    (8L, s"Columnar formats let scans skip unread columns.\n\n$License"))
}

/** Inline page fixtures for the ingest driver queries (deterministic —
  * the same literals are embedded in the DuckDB oracle VALUES). */
object IngestFixture {
  val listings: Seq[(String, String)] = Seq(
    ("https://ex.com/list",
      """<article><a href="/a/1">one</a></article>
        |<article><a href="/a/2">two</a></article>
        |<article><p>no link, skipped</p></article>""".stripMargin))

  val pages: Seq[(String, String)] = Seq(
    ("https://ex.com/a/1",
      "<h1>Title One</h1><p>Body 1.</p><time datetime=\"2024-01-01\">x</time>"),
    ("https://ex.com/a/2",
      "<title>Title Two</title><p>Body 2a.</p><p>Body 2b.</p>"))

  val rawDates: Seq[String] = Seq(
    "2024-03-01T10:15:30", "2024-07-04 08:30:00", "2024-03-01",
    "March 1, 2024", "Mar 15, 2024", "01/03/2024", "not a date",
    " 2024-12-25 ",
    // dateutil-breadth forms (app.py:90): RFC-2822 with zone name and
    // offset, bare dd-Mon-yyyy, month-name+time, slash-ISO
    "Tue, 01 Mar 2024 10:15:30 GMT", "Fri, 05 Jul 2024 23:59:01 +0200",
    "01 Mar 2024 10:15:30", "15 Mar 2024", "March 1, 2024 10:30 AM",
    "2024/03/01", "Sat, 32 Jan 2024 00:00:00 GMT")

  /** The dateutil free-text tail (r12): ordinal suffixes, dotted/Sept
    * month tokens, comma-less month-name forms, single-digit days —
    * plus the documented-out-of-contract negatives ('of'-phrases,
    * defaulted-field dates, impossible days) that must stay null. */
  val rawDatesFree: Seq[String] = Seq(
    "March 3rd, 2024", "August 21st, 2024 3:05 PM", "June 2nd, 2024",
    "22nd February 2024", "23rd March 2024", "1st Mar 2024",
    "3th March 2024", // dateutil strips ANY digit+suffix, grammatical or not
    "Sept. 5, 2024", "Sept 5, 2024", "Mar. 3 2024",
    "3 Mar 2024", "3 Mar 2024 10:15:30", "3 March 2024 10:15:30",
    "March 3 2024", "March 3 2024 10:30 AM", "Mar 3 2024",
    "Feb 31st, 2024",      // impossible day: null in both engines
    "3rd of March 2024",   // 'of' = dateutil fuzzy mode: out of contract
    "March 2024",          // defaulted day: nondeterministic in dateutil
    "the 3rd quarter",     // ordinal strips, then no format matches
    // Multi-occurrence pin (r13 advice): DuckDB regexp_replace is
    // first-match-only without the 'g' option; every format has exactly
    // one day token, so a two-ordinal string can never PARSE under
    // either normalization — the pin locks the null on both engines
    // while exercising the global-replace path the mirrors now share.
    "1st March 3rd, 2024")
}
