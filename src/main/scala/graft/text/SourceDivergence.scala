package graft.text

import graft.Mat.Pinnable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Per-source token-distribution divergence (`source_kl` query):
  * KL(P_source ‖ P_corpus) over unigram distributions — the drift
  * analytics behind mixture design: a source whose token distribution
  * sits far from the corpus mean dominates or starves a naive mix, and
  * this table is what [[graft.pipeline.Curation.mixCorpusTemperature]]'s
  * α is tuned against (cf. the per-language alphas in the XLM-R recipe).
  *
  * Exactness: KL = Σ_t (c_st ∕ N_s) · ln((c_st · N) ∕ (N_s · c_t)) is a
  * float sum, so the engine emits the INTEGER numerator
  * Σ_t c_st · ⌊1e6 · ln((c_st · N) ∕ (N_s · c_t))⌋ — per-term weights in
  * micro-nats ([[LmScore]]'s discipline), scaled by integer counts,
  * summed associatively — then divides by N_s once and rounds to 4.
  * Every product sits far below 2⁵³ at oracle scale, the one division
  * is a single correctly-rounded IEEE op on exact integers, so the
  * result hash-matches DuckDB bit-for-bit. (The per-term floor biases
  * each weight by < 1e-6 nat — an analytics-grade approximation, and
  * the SAME approximation in both engines, which is what the oracle
  * requires.)
  *
  * Scale shape: one explode → (source, token) count agg (the only
  * token-volume exchange, map-side combined to distinct pairs);
  * corpus-wide token counts REUSE that pair table (a second, vocab-sized
  * agg — never a corpus re-scan); the pair⇄token join is keyed on token
  * (broadcastable here; at web scale it is the vocabulary-sized
  * sort-merge join every exact distributional statistic pays); totals
  * broadcast back as single rows. */
object SourceDivergence {

  def sourceKl(docs: DataFrame, sourceCol: String = "source",
               textCol: String = "text"): DataFrame = {
    // The pair table feeds three consumers (the term join, the
    // vocab-sized token totals, the per-source totals); Catalyst does
    // not share common subtrees, so checkpoint it once or the corpus
    // explode+agg runs three times. (At cluster scale: persist/cache —
    // same note as Dedup.scala:97.)
    val pairs = graft.Par.widen(docs)
      .select(col(sourceCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
      .groupBy(col(sourceCol), col("__tok"))
      .agg(count(lit(1)).as("__cst"))
      .pinned
    val tokTotals = pairs.groupBy(col("__tok"))
      .agg(sum(col("__cst")).as("__ct"))
    val srcTotals = pairs.groupBy(col(sourceCol))
      .agg(sum(col("__cst")).as("__ns"))
    val grand = tokTotals.agg(sum(col("__ct")).as("__n"))
    pairs
      .join(tokTotals, Seq("__tok"))
      .join(broadcast(srcTotals), Seq(sourceCol))
      .crossJoin(broadcast(grand))
      .select(col(sourceCol), col("__ns"),
        (col("__cst") *
          floor(log((col("__cst") * col("__n")).cast("double") /
            (col("__ns") * col("__ct")).cast("double")) * lit(1000000.0))
            .cast("long")).as("__num"))
      .groupBy(col(sourceCol))
      .agg(first(col("__ns")).as("n_tokens"),
        round(sum(col("__num")).cast("double") /
          first(col("__ns")).cast("double") / lit(1000000.0), 4)
          .as("kl_nats"))
      .orderBy(col(sourceCol))
  }

  /** DuckDB mirror over a relation exposing (source, text). */
  def sqlSourceKl(from: String): String =
    s"""WITH tk AS (
       |  SELECT source,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS tok
       |  FROM $from),
       |pairs AS (SELECT source, tok, COUNT(*) AS cst FROM tk GROUP BY 1, 2),
       |toks AS (SELECT tok, SUM(cst) AS ct FROM pairs GROUP BY 1),
       |srcs AS (SELECT source, SUM(cst) AS ns FROM pairs GROUP BY 1),
       |g AS (SELECT SUM(ct) AS n FROM toks),
       |terms AS (
       |  SELECT p.source, s.ns,
       |    p.cst * CAST(FLOOR(ln((p.cst * g.n)::DOUBLE /
       |                          (s.ns * t.ct)::DOUBLE) * 1000000.0) AS BIGINT)
       |      AS num
       |  FROM pairs p
       |  JOIN toks t USING (tok) JOIN srcs s USING (source) CROSS JOIN g)
       |SELECT source, CAST(MIN(ns) AS BIGINT) AS n_tokens,
       |  round(SUM(num)::DOUBLE / MIN(ns)::DOUBLE / 1000000.0, 4) AS kl_nats
       |FROM terms GROUP BY source ORDER BY source""".stripMargin
}
