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

/** exact/near/substring/paragraph dedup and set-similarity joins — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesDedup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
  )

  def oracleSql: Map[String, String] = Map(
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
  )
}
