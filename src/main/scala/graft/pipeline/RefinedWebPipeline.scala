package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{GopherRepetition, GopherRules, TextAnalysis}

/** [EXT] The RefinedWeb-style corpus preset (`corpus_pipeline_refinedweb`
  * query) — Penedo et al. 2023's Macrodata-Refinement ordering ("The
  * RefinedWeb Dataset for Falcon LLM"), the third preset family next to
  * [[FineWebPipeline]] and [[CcNetPipeline]], chained from operators this
  * library already ships — including the round-9 additions it exists to
  * integrate:
  *
  *  1. URL gate: registered-domain blocklist
  *     ([[graft.ingest.Urls.registeredDomain]] — subdomains of a blocked
  *     eTLD+1 drop with it);
  *  2. Unicode NFC normalization
  *     ([[org.apache.spark.sql.graft.NfcNormalize]]) — BEFORE every
  *     downstream key, so NFC/NFD twins collapse for language ID,
  *     dedup hashes, and MinHash signatures alike (the canonicalization
  *     placement the operator was built for);
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
  */
object RefinedWebPipeline {

  /** Stage frames, shared by [[apply]] and [[funnel]]. */
  final case class Stages(urlGated: DataFrame, langed: DataFrame,
                          gated: DataFrame, exact: DataFrame,
                          fuzzy: DataFrame, capped: DataFrame)

  def stages(docs: DataFrame, urlCol: String = "url",
             blocked: Seq[String] = Seq.empty, lang: String = "en",
             gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
             repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
             threshold: Double = 0.9, cap: Int = 100,
             idCol: String = "doc_id", textCol: String = "text"): Stages = {
    // Widen FIRST: the interpreted HOF gates (langId markers, repetition
    // folds) are the preset's per-row CPU, and a small parquet scan
    // arrives in 1-2 partitions — without the repartition they run
    // near-single-threaded (measured 6× on the repetition stage).
    val dom = graft.Par.widen(docs).withColumn("domain",
      graft.ingest.Urls.registeredDomain(col(urlCol)))
    val urlGated =
      (if (blocked.isEmpty) dom else dom.filter(!col("domain").isin(blocked: _*)))
        .select(col(idCol).cast("long").as("doc_id"), col("domain"),
          col(textCol).as("text"))
    // NFC FIRST: all keys below (langId markers, md5, MinHash tokens)
    // see canonical bytes.
    val normed = urlGated.withColumn("text",
      org.apache.spark.sql.graft.ArrayFunctions.nfcNormalize(col("text")))
    val langed = normed.filter(TextAnalysis.langId(col("text")) === lang)
    // Checkpoint: the gated survivors feed the exact-dedup window, the
    // MinHash fit, and the funnel — one materialization, three readers.
    val gated = langed
      .filter(GopherRules.passExpr(col("text"), gopherTh))
      .filter(GopherRepetition.passExpr(col("text"), repetitionTh))
      .localCheckpoint(true)
    val exact = gated
      .withColumn("__k",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__k")).drop("__k")
      .localCheckpoint(true)
    val keepers = graft.dedup.Dedup
      .nearDupKeepersScaled(exact, "doc_id", "text", threshold)
    // Checkpoint: the MinHash composition is the preset's dominant CPU;
    // without this the funnel's near_dedup count and the caps stage each
    // re-run it (measured ~2× the stage cost at sf0.1).
    val fuzzy = exact.join(
      keepers.filter(col("doc_id") === col("keeper_id")).select(col("doc_id")),
      Seq("doc_id"))
      .localCheckpoint(true)
    val capped = fuzzy
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id"))))
      .filter(col("rk") <= cap)
    Stages(urlGated, langed, gated, exact, fuzzy, capped)
  }

  def apply(docs: DataFrame, urlCol: String = "url",
            blocked: Seq[String] = Seq.empty, lang: String = "en",
            gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
            repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
            threshold: Double = 0.9, cap: Int = 100): DataFrame =
    stages(docs, urlCol, blocked, lang, gopherTh, repetitionTh, threshold, cap)
      .capped
      .select(col("doc_id"), col("domain"),
        size(TextAnalysis.tokens(lower(col("text")))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))

  /** Per-stage survivor counts (`refinedweb_funnel` query) — the ablation
    * table from the SAME stage frames [[apply]] ships (NFC is
    * count-invariant and not a funnel row). */
  def funnel(docs: DataFrame, urlCol: String = "url",
             blocked: Seq[String] = Seq.empty, lang: String = "en",
             gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
             repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
             threshold: Double = 0.9, cap: Int = 100): DataFrame = {
    val st = stages(docs, urlCol, blocked, lang, gopherTh, repetitionTh, threshold, cap)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(
      (0L, "raw", docs.count()),
      (1L, "url_blocklist", st.urlGated.count()),
      (2L, "language", st.langed.count()),
      (3L, "gopher_gates", st.gated.count()),
      (4L, "exact_dedup", st.exact.count()),
      (5L, "near_dedup", st.fuzzy.count()),
      (6L, "domain_caps", st.capped.count()))
      .toDF("stage", "gate", "n_docs")
      .orderBy(col("stage"))
  }

  /** Shared WITH-chain over a relation exposing (doc_id, text, url). */
  private def sqlCtes(from: String, blocked: Seq[String], lang: String,
                      gopherTh: GopherRules.Thresholds,
                      repetitionTh: GopherRepetition.Thresholds,
                      threshold: Double, cap: Int): String = {
    val tok = "[^ \\t\\n\\x0B\\f\\r]+"
    val blockedSql =
      if (blocked.isEmpty) "TRUE"
      else s"domain NOT IN (${blocked.map(b => s"'$b'").mkString(", ")})"
    val rulesPass = GopherRules.sqlPassExpr("text", gopherTh)
    val repSig = GopherRepetition.sqlSignals("rw4", repetitionTh)
    s"""WITH RECURSIVE d0 AS (SELECT doc_id, text, url FROM $from),
       |dm AS (
       |  SELECT doc_id, text,
       |    ${graft.ingest.Urls.sqlRegisteredDomain("url")} AS domain
       |  FROM d0),
       |rw1 AS (SELECT doc_id, domain, text FROM dm WHERE $blockedSql),
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
                  threshold: Double = 0.9, cap: Int = 100): String =
    sqlCtes(from, blocked, lang, gopherTh, repetitionTh, threshold, cap) +
      s"""
         |SELECT doc_id, domain,
         |  CAST(len(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tokens
         |FROM rw8 ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[funnel]] — the same CTE chain, counted. */
  def sqlFunnel(from: String, blocked: Seq[String], lang: String = "en",
                gopherTh: GopherRules.Thresholds = GopherRules.Thresholds(),
                repetitionTh: GopherRepetition.Thresholds = GopherRepetition.Thresholds(),
                threshold: Double = 0.9, cap: Int = 100): String =
    sqlCtes(from, blocked, lang, gopherTh, repetitionTh, threshold, cap) +
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
