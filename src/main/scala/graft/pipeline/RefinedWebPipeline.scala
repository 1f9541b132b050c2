package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{GopherRepetition, GopherRules, TextAnalysis}

/** [EXT] The RefinedWeb-style corpus preset (`corpus_pipeline_refinedweb`
  * query) — Penedo et al. 2023's Macrodata-Refinement ordering ("The
  * RefinedWeb Dataset for Falcon LLM"), the third preset family next to
  * [[FineWebPipeline]] and [[CcNetPipeline]], chained from operators this
  * library already ships:
  *
  *  1. URL gate — both halves of RefinedWeb's URL filtering: the hard
  *     registered-domain blocklist ([[graft.ingest.Urls.registeredDomain]]
  *     — subdomains of a blocked eTLD+1 drop with it; a null/unparseable
  *     URL maps to the '' domain group, so the kept/dropped decision
  *     never depends on whether a blocklist was supplied) and the soft
  *     word score of the URL string ([[graft.ingest.Urls.spamScore]],
  *     off unless `spamWeights` is passed);
  *  2. Unicode NFC normalization
  *     ([[org.apache.spark.sql.graft.NfcNormalize]]) — BEFORE every
  *     downstream key, so NFC/NFD twins collapse for language ID,
  *     dedup hashes, and MinHash signatures alike (the canonicalization
  *     placement the operator was built for); optionally preceded by one
  *     mojibake-repair round ([[graft.text.Encoding.fixMojibake]],
  *     `repairEncoding` — off by default) so corrupted documents rejoin
  *     their clean twins' byte identity ahead of the dedup keys;
  *  3. language gate ([[TextAnalysis.langId]] == target);
  *  4. Gopher rule + repetition gates ([[GopherRules.passExpr]],
  *     [[GopherRepetition.passExpr]]);
  *  5. exact dedup, keep-first on md5(normalized text) — one
  *     content-hash-keyed window;
  *  6. fuzzy dedup: MinHash-LSH near-dup keepers
  *     ([[graft.dedup.Dedup.nearDupKeepersScaled]]) — survivors are
  *     their own cluster keepers;
  *  7. per-registered-domain caps (first-come by doc id — RefinedWeb's
  *     host-level skew control as the release gate).
  *
  * Output: (doc_id, domain, n_tokens) ordered by doc_id. Every stage is
  * ANSI-expressible, so ONE DuckDB WITH-chain ([[sqlPipeline]]) replays
  * the whole line: the fuzzy stage uses the exact quadratic Jaccard+CC
  * form the `dedup_keepers_scaled` oracle established (valid because the
  * pinned-seed LSH misses a J≥threshold pair with prob ~4e-8), and every
  * other stage reuses its operator's existing SQL mirror.
  *
  * Scale shape: stages 1-4 are per-row scan-stage expressions; stage 5
  * one hash-keyed exchange; stage 6 the banded ids-only MinHash
  * composition; stage 7 one domain-keyed window. No single-partition
  * window, nothing quadratic engine-side.
  *
  * Materialization: shared stage frames are pinned through `materialize`
  * (default [[graft.Mat.pin]] — the session-wide
  * `spark.graft.materialize` knob: localCheckpoint for speed,
  * diskOnly/memoryAndDisk persist or a reliable checkpoint for clusters
  * that must survive executor loss — local checkpoints live on executor
  * storage and cannot be recomputed). An explicit parameter overrides
  * the conf per stage. Output is materializer-invariant (spec-pinned).
  */
object RefinedWebPipeline {

  /** Stage frames, shared by [[apply]] and [[funnel]]. `funnelObs`
    * carries the (raw, url_blocklist, language) observation handles when
    * `observeFunnel` was set — their counts ride the SAME scan that
    * materializes `gated`, so the funnel never re-executes the raw gate
    * chain (read them only after an action has run on `gated` or a
    * descendant; `Observation.get` blocks until then). */
  final case class Stages(urlGated: DataFrame, langed: DataFrame,
                          gated: DataFrame, exact: DataFrame,
                          fuzzy: DataFrame, capped: DataFrame,
                          funnelObs: Option[(Observation, Observation, Observation)])

  def stages(docs: DataFrame, urlCol: String = "url",
             blocked: Seq[String] = Seq.empty, lang: String = "en",
             gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
             repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
             threshold: Double = 0.9, cap: Int = 100,
             idCol: String = "doc_id", textCol: String = "text",
             materialize: DataFrame => DataFrame = graft.Mat.pin,
             observeFunnel: Boolean = false,
             spamWeights: Seq[(String, Double)] = Seq.empty,
             spamThreshold: Double = 1.0,
             repairEncoding: Boolean = false,
             maxBucket: Int = 4096): Stages = {
    // Widen FIRST: the interpreted HOF gates (langId markers, repetition
    // folds) are the preset's per-row CPU, and a small parquet scan
    // arrives in 1-2 partitions — without the repartition they run
    // near-single-threaded (measured 6× on the repetition stage).
    // Null/unparseable URLs coalesce to the '' domain group (explicit,
    // so `isin` null semantics can't silently drop them when a blocklist
    // is supplied but keep them when it's empty).
    val dom0 = graft.Par.widen(docs).withColumn("domain",
      coalesce(graft.ingest.Urls.registeredDomain(col(urlCol)), lit("")))
    // Funnel observation points (one-pass discipline): CollectMetrics
    // nodes ride the gated-materialization scan — the counts for stages
    // 0-2 cost zero extra passes over the raw corpus.
    val (obsRaw, obsUrl, obsLang) =
      (Observation("rw_raw"), Observation("rw_url"), Observation("rw_lang"))
    val dom = if (observeFunnel) dom0.observe(obsRaw, count(lit(1)).as("n")) else dom0
    // The URL gate is both halves of RefinedWeb's URL filtering: the
    // hard eTLD+1 blocklist AND the soft word score of the URL string
    // (off by default — pass spamWeights to enable). Both are scan-stage
    // expressions; nothing is fetched or parsed to reject a URL.
    val domBlocked =
      if (blocked.isEmpty) dom else dom.filter(!col("domain").isin(blocked: _*))
    val urlGated0 =
      (if (spamWeights.isEmpty) domBlocked
       else domBlocked.filter(
         graft.ingest.Urls.spamScore(col(urlCol), spamWeights) < spamThreshold))
        .select(col(idCol).cast("long").as("doc_id"), col("domain"),
          col(textCol).as("text"))
    val urlGated = if (observeFunnel) urlGated0.observe(obsUrl, count(lit(1)).as("n"))
                   else urlGated0
    // Optional encoding repair (r10, off by default — stage 1c): one
    // mojibake round BEFORE NFC, so a corrupted document rejoins its
    // clean twin's byte identity ahead of every dedup key (the repair
    // emits precomposed characters, which NFC preserves). Without it,
    // `cafÃ©` and `café` are distinct documents forever.
    val repaired =
      if (repairEncoding)
        urlGated.withColumn("text", graft.text.Encoding.fixMojibake(col("text")))
      else urlGated
    // NFC FIRST: all keys below (langId markers, md5, MinHash tokens)
    // see canonical bytes.
    val normed = repaired.withColumn("text",
      org.apache.spark.sql.graft.ArrayFunctions.nfcNormalize(col("text")))
    val langed0 = normed.filter(TextAnalysis.langId(col("text")) === lang)
    val langed = if (observeFunnel) langed0.observe(obsLang, count(lit(1)).as("n"))
                 else langed0
    // Materialize: the gated survivors feed the exact-dedup window, the
    // MinHash fit, and the funnel — one materialization, three readers.
    val gated = materialize(langed
      .filter(GopherRules.passExpr(col("text"), gopherTh))
      .filter(GopherRepetition.passExpr(col("text"), repetitionTh)))
    val exact = materialize(gated
      .withColumn("__k",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__k")).drop("__k"))
    // The F134 LSH safety valve rides the production entry point (r13):
    // a degenerate corpus (near-identical boilerplate at scale) packs one
    // band bucket with >maxBucket distinct-set reps, whose Σm² candidate
    // mass is the TB-scale spill the m100 audit measured — the cap drops
    // such buckets from candidate generation. 4096 never binds at any
    // driver fixture scale (bucket widths are orders of magnitude under
    // it — the preset oracles stay exact-CC green), and on real corpora
    // mega-buckets are exact-dup artifacts the rep-grouping already
    // collapsed; pass Int.MaxValue to disable.
    val keepers = graft.dedup.Dedup
      .nearDupKeepersScaled(exact, "doc_id", "text", threshold, maxBucket)
    // Materialize: the MinHash composition is the preset's dominant CPU;
    // without this the funnel's near_dedup count and the caps stage each
    // re-run it (measured ~2× the stage cost at sf0.1).
    val fuzzy = materialize(exact.join(
      keepers.filter(col("doc_id") === col("keeper_id")).select(col("doc_id")),
      Seq("doc_id")))
    val capped = fuzzy
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
      .filter(col("rk") <= cap)
    Stages(urlGated, langed, gated, exact, fuzzy, capped,
      if (observeFunnel) Some((obsRaw, obsUrl, obsLang)) else None)
  }

  def apply(docs: DataFrame, urlCol: String = "url",
            blocked: Seq[String] = Seq.empty, lang: String = "en",
            gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
            repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
            threshold: Double = 0.9, cap: Int = 100,
            materialize: DataFrame => DataFrame = graft.Mat.pin,
            spamWeights: Seq[(String, Double)] = Seq.empty,
            spamThreshold: Double = 1.0,
            repairEncoding: Boolean = false,
            maxBucket: Int = 4096): DataFrame =
    stages(docs, urlCol, blocked, lang, gopherTh, repetitionTh, threshold, cap,
      materialize = materialize,
      spamWeights = spamWeights, spamThreshold = spamThreshold,
      repairEncoding = repairEncoding, maxBucket = maxBucket)
      .capped
      .select(col("doc_id"), col("domain"),
        size(TextAnalysis.tokens(lower(col("text")))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))

  /** Per-stage survivor counts (`refinedweb_funnel` query) — the ablation
    * table from the SAME stage frames [[apply]] ships (NFC is
    * count-invariant and not a funnel row). One-pass discipline: stages
    * 0-2 are observation metrics riding the scan that materializes
    * `gated` (never a re-execution of the raw gate chain), stages 3-6
    * count materialized frames — the whole funnel reads the raw corpus
    * exactly once (PlanQualitySpec pins the single raw scan). */
  def funnel(docs: DataFrame, urlCol: String = "url",
             blocked: Seq[String] = Seq.empty, lang: String = "en",
             gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
             repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
             threshold: Double = 0.9, cap: Int = 100,
             materialize: DataFrame => DataFrame = graft.Mat.pin,
             spamWeights: Seq[(String, Double)] = Seq.empty,
             spamThreshold: Double = 1.0,
             maxBucket: Int = 4096): DataFrame = {
    val st = stages(docs, urlCol, blocked, lang, gopherTh, repetitionTh,
      threshold, cap, materialize = materialize, observeFunnel = true,
      spamWeights = spamWeights, spamThreshold = spamThreshold,
      maxBucket = maxBucket)
    // Count the materialized frame FIRST: with the default eager
    // materializer the metrics are already in; with a lazy one this
    // count is the action that runs the observed plan — either way the
    // subsequent Observation.get calls never block indefinitely.
    val nGated = st.gated.count()
    val (obsRaw, obsUrl, obsLang) = st.funnelObs.get
    def n(o: Observation): Long = o.get("n").asInstanceOf[Long]
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(
      (0L, "raw", n(obsRaw)),
      (1L, "url_blocklist", n(obsUrl)),
      (2L, "language", n(obsLang)),
      (3L, "gopher_gates", nGated),
      (4L, "exact_dedup", st.exact.count()),
      (5L, "near_dedup", st.fuzzy.count()),
      (6L, "domain_caps", st.capped.count()))
      .toDF("stage", "gate", "n_docs")
      .orderBy(col("stage"))
  }

  /** [EXT] Per-document outcome attribution (`refinedweb_outcomes`
    * query) — the artifact a pipeline team debugs with: for EVERY raw
    * document, the stage that dropped it ('url_blocklist', 'language',
    * 'gopher_rules', 'gopher_repetition', 'exact_dedup', 'near_dedup',
    * 'domain_caps') or 'kept'. The funnel answers "how many survived
    * stage k"; this answers "why is doc 1234 not in the release" —
    * and grouped by outcome it reconciles exactly to the funnel's
    * stage deltas (spec-pinned).
    *
    * Shape: stages 1-4 are per-row expressions, so their verdicts
    * compute as FLAGS in one scan of the raw corpus — and (r16) that
    * flags scan is now the ONLY evaluation of the per-row gates: the
    * downstream stage frames (gated → exact → fuzzy → capped) filter
    * the PINNED flags frame instead of re-running langId + the two
    * Gopher folds through [[stages]] a second time (the repetition fold
    * alone is ~1.3 s per corpus pass at sf0.1 — guide §1.2 step 1,
    * don't compute things twice; same filter conjunction, so the stage
    * memberships are identical by construction). Only the three
    * non-per-row stages (exact dedup, near-dup keepers, domain caps)
    * contribute membership via ids-only left joins. One gate scan +
    * three id-keyed joins. */
  def outcomes(docs: DataFrame, urlCol: String = "url",
               blocked: Seq[String] = Seq.empty, lang: String = "en",
               gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
               repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
               threshold: Double = 0.9, cap: Int = 100,
               idCol: String = "doc_id", textCol: String = "text",
               materialize: DataFrame => DataFrame = graft.Mat.pin,
               spamWeights: Seq[(String, Double)] = Seq.empty,
               spamThreshold: Double = 1.0,
               repairEncoding: Boolean = false,
               maxBucket: Int = 4096): DataFrame = {
    val dom = graft.Par.widen(docs)
      .withColumn("domain",
        coalesce(graft.ingest.Urls.registeredDomain(col(urlCol)), lit("")))
      .select(col(idCol).cast("long").as("doc_id"), col("domain"),
        col(textCol).as("text"), col(urlCol).as("__url"))
    val urlPass =
      (if (blocked.isEmpty) lit(true)
       else !col("domain").isin(blocked: _*)) &&
        (if (spamWeights.isEmpty) lit(true)
         else graft.ingest.Urls.spamScore(col("__url"), spamWeights)
           < spamThreshold)
    val repaired =
      if (repairEncoding) graft.text.Encoding.fixMojibake(col("text"))
      else col("text")
    val normed =
      org.apache.spark.sql.graft.ArrayFunctions.nfcNormalize(repaired)
    // coalesce to false: a NULL verdict (null text) must attribute to
    // the stage whose FILTER dropped the doc — a bare when(!NULL) would
    // skip the branch and fall through to a wrong 'exact_dedup'.
    // The NORMED text rides along: the dedup stages below key on it,
    // so the flags pin is the single evaluation of NFC + every gate.
    val flagged = materialize(dom.select(col("doc_id"), col("domain"),
      normed.as("__text"),
      coalesce(urlPass, lit(false)).as("__p1"),
      coalesce(TextAnalysis.langId(normed) === lang, lit(false)).as("__p3"),
      coalesce(GopherRules.passExpr(normed, gopherTh), lit(false)).as("__p4"),
      coalesce(GopherRepetition.passExpr(normed, repetitionTh), lit(false))
        .as("__p5")))
    // The stage frames, re-derived by FILTERING the pinned flags (the
    // same conjunction [[stages]] applies as successive filters — equal
    // membership by construction, zero per-row gate re-evaluation).
    val gated = flagged
      .filter(col("__p1") && col("__p3") && col("__p4") && col("__p5"))
      .select(col("doc_id"), col("domain"), col("__text").as("text"))
    val exact = materialize(gated
      .withColumn("__k",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__k")).drop("__k"))
    val keepers = graft.dedup.Dedup
      .nearDupKeepersScaled(exact, "doc_id", "text", threshold, maxBucket)
    val fuzzy = materialize(exact.join(
      keepers.filter(col("doc_id") === col("keeper_id")).select(col("doc_id")),
      Seq("doc_id")))
    val capped = fuzzy
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
      .filter(col("rk") <= cap)
    def member(frame: DataFrame, flag: String): DataFrame =
      frame.select(col("doc_id"), lit(true).as(flag))
    val out = flagged
      .join(member(exact, "__m6"), Seq("doc_id"), "left")
      .join(member(fuzzy, "__m7"), Seq("doc_id"), "left")
      .join(member(capped, "__m8"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(!col("__p1"), "url_blocklist")
          .when(!col("__p3"), "language")
          .when(!col("__p4"), "gopher_rules")
          .when(!col("__p5"), "gopher_repetition")
          .when(col("__m6").isNull, "exact_dedup")
          .when(col("__m7").isNull, "near_dedup")
          .when(col("__m8").isNull, "domain_caps")
          .otherwise("kept").as("outcome"))
    out.orderBy(col("doc_id"))
  }

  /** DuckDB mirror of [[outcomes]] — the same CTE chain, with each doc
    * attributed to the first stage whose survivor set it left. */
  def sqlOutcomes(from: String, blocked: Seq[String], lang: String = "en",
                  gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
                  repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
                  threshold: Double = 0.9, cap: Int = 100,
                  spamWeights: Seq[(String, Double)] = Seq.empty,
                  spamThreshold: Double = 1.0): String =
    sqlCtes(from, blocked, lang, gopherTh, repetitionTh, threshold, cap,
      spamWeights, spamThreshold) +
      s"""
         |SELECT dm.doc_id,
         |  CASE WHEN r1.doc_id IS NULL THEN 'url_blocklist'
         |       WHEN r3.doc_id IS NULL THEN 'language'
         |       WHEN r4.doc_id IS NULL THEN 'gopher_rules'
         |       WHEN r5.doc_id IS NULL THEN 'gopher_repetition'
         |       WHEN r6.doc_id IS NULL THEN 'exact_dedup'
         |       WHEN r7.doc_id IS NULL THEN 'near_dedup'
         |       WHEN r8.doc_id IS NULL THEN 'domain_caps'
         |       ELSE 'kept' END AS outcome
         |FROM dm
         |LEFT JOIN rw1 r1 ON dm.doc_id = r1.doc_id
         |LEFT JOIN rw3 r3 ON dm.doc_id = r3.doc_id
         |LEFT JOIN rw4 r4 ON dm.doc_id = r4.doc_id
         |LEFT JOIN rw5 r5 ON dm.doc_id = r5.doc_id
         |LEFT JOIN rw6 r6 ON dm.doc_id = r6.doc_id
         |LEFT JOIN rw7 r7 ON dm.doc_id = r7.doc_id
         |LEFT JOIN rw8 r8 ON dm.doc_id = r8.doc_id
         |ORDER BY dm.doc_id""".stripMargin

  /** Shared WITH-chain over a relation exposing (doc_id, text, url). The
    * registered-domain stage replays as [[graft.ingest.Psl]]'s printed
    * rule table + candidate-suffix equi-join. */
  private def sqlCtes(from: String, blocked: Seq[String], lang: String,
                      gopherTh: GopherRules.Thresholds,
                      repetitionTh: GopherRepetition.Thresholds,
                      threshold: Double, cap: Int,
                      spamWeights: Seq[(String, Double)] = Seq.empty,
                      spamThreshold: Double = 1.0): String = {
    val tok = "[^ \\t\\n\\x0B\\f\\r]+"
    val blockedSql =
      if (blocked.isEmpty) "TRUE"
      else s"domain NOT IN (${blocked.map(b => s"'$b'").mkString(", ")})"
    val spamSql =
      if (spamWeights.isEmpty) "TRUE"
      else s"(${graft.ingest.Urls.sqlSpamScore("url", spamWeights)}) < $spamThreshold"
    val rulesPass = GopherRules.sqlPassExpr("text", gopherTh)
    val repSig = GopherRepetition.sqlSignals("rw4", repetitionTh)
    s"""WITH RECURSIVE ${graft.ingest.Psl.sqlPslCte},
       |d0 AS (SELECT doc_id, text, url FROM $from),
       |${graft.ingest.Psl.sqlDomainCtes("d0", "doc_id", Seq("text", "url"), "url", "dm0")},
       |dm AS (SELECT doc_id, text, url, COALESCE(domain, '') AS domain FROM dm0),
       |rw1 AS (SELECT doc_id, domain, text FROM dm
       |        WHERE $blockedSql AND $spamSql),
       |rw2 AS (SELECT doc_id, domain, nfc_normalize(text) AS text FROM rw1),
       |rw3 AS (SELECT * FROM rw2 WHERE ${TextAnalysis.sqlLangId("text")} = '$lang'),
       |rw4 AS (SELECT * FROM rw3 WHERE $rulesPass),
       |rw5 AS (SELECT rw4.* FROM rw4
       |       WHERE doc_id IN (SELECT doc_id FROM ($repSig) rs WHERE rs.pass)),
       |rw6 AS (SELECT doc_id, domain, text FROM (
       |         SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |         FROM rw5)
       |       WHERE doc_id = keeper),
       |t AS (SELECT doc_id,
       |        list_distinct(regexp_extract_all(lower(text), '$tok')) AS toks
       |      FROM rw6),
       |jp AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE /
       |            nullif(len(list_distinct(a.toks || b.toks)), 0)::DOUBLE, 4) AS jaccard
       |    FROM t a JOIN t b ON a.doc_id < b.doc_id)
       |  WHERE jaccard >= $threshold),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM jp
       |          UNION ALL SELECT id_b, id_a FROM jp),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS label FROM rw6
       |  UNION
       |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id),
       |keep AS (SELECT id, MIN(label) AS keeper_id FROM reach GROUP BY id),
       |rw7 AS (SELECT rw6.* FROM rw6
       |       JOIN keep ON rw6.doc_id = keep.id AND keep.keeper_id = rw6.doc_id),
       |rw8 AS (SELECT doc_id, domain, text FROM (
       |         SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
       |                                      ORDER BY doc_id ASC) AS rk
       |         FROM rw7)
       |       WHERE rk <= $cap)""".stripMargin
  }

  /** The whole line as ONE DuckDB WITH-chain; `from` must expose
    * (doc_id, text, url). The fuzzy stage replays as the exact quadratic
    * Jaccard+CC (the `dedup_keepers_scaled` oracle's established
    * equivalence to the engine's LSH path). */
  def sqlPipeline(from: String, blocked: Seq[String], lang: String = "en",
                  gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
                  repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
                  threshold: Double = 0.9, cap: Int = 100,
                  spamWeights: Seq[(String, Double)] = Seq.empty,
                  spamThreshold: Double = 1.0): String =
    sqlCtes(from, blocked, lang, gopherTh, repetitionTh, threshold, cap,
      spamWeights, spamThreshold) +
      s"""
         |SELECT doc_id, domain,
         |  CAST(len(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tokens
         |FROM rw8 ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[funnel]] — the same CTE chain, counted. */
  def sqlFunnel(from: String, blocked: Seq[String], lang: String = "en",
                gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
                repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
                threshold: Double = 0.9, cap: Int = 100,
                spamWeights: Seq[(String, Double)] = Seq.empty,
                spamThreshold: Double = 1.0): String =
    sqlCtes(from, blocked, lang, gopherTh, repetitionTh, threshold, cap,
      spamWeights, spamThreshold) +
      """
        |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS gate,
        |       CAST((SELECT COUNT(*) FROM d0) AS BIGINT) AS n_docs
        |UNION ALL SELECT 1, 'url_blocklist', (SELECT COUNT(*) FROM rw1)
        |UNION ALL SELECT 2, 'language', (SELECT COUNT(*) FROM rw3)
        |UNION ALL SELECT 3, 'gopher_gates', (SELECT COUNT(*) FROM rw5)
        |UNION ALL SELECT 4, 'exact_dedup', (SELECT COUNT(*) FROM rw6)
        |UNION ALL SELECT 5, 'near_dedup', (SELECT COUNT(*) FROM rw7)
        |UNION ALL SELECT 6, 'domain_caps', (SELECT COUNT(*) FROM rw8)
        |ORDER BY stage""".stripMargin
}
