package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** [EXT] Bigram language-model scoring (`lm_scores` query) — the
  * CCNet-style quality signal: score each document by how predictable
  * its text is under an n-gram model fit on the corpus itself. Low cost
  * = fluent/common phrasing; high cost = gibberish, mangled encodings,
  * keyword stuffing. The standard curation use is filtering or bucketing
  * by LM perplexity (CCNet trains KenLM on Wikipedia; here the model is
  * the corpus's own bigram table, which needs no external artifact).
  *
  * Per document: cost(D) = Σ over bigram occurrences (w1 w2) of
  * −ln p̂(w2|w1), with the LAPLACE-smoothed conditional
  * p̂(w2|w1) = (c(w1 w2) + 1) ∕ (c(w1) + V), V = vocabulary size.
  * Smoothing is not optional here: the unsmoothed MLE on a self-fit
  * corpus scores singleton contexts as perfectly predictable (c(w1) =
  * c(w1 w2) = 1 ⇒ p = 1 ⇒ cost 0), handing unique gibberish a BETTER
  * score than common prose — exactly backwards. With +V smoothing a
  * never-repeated bigram costs ≈ ln(V∕2) while a frequent one costs
  * ≈ ln(V∕c), restoring the fluency ordering.
  *
  * The engine emits each term as ⌊ln((c(w1)+V) ∕ (c(w1 w2)+1)) · 1e6⌋ —
  * an integer number of micro-nats — so the per-document SUM is an
  * integer: associative, partition-order-independent, and bit-identical
  * in DuckDB, which is what lets a floating-point NLP scorer carry a
  * full hash-checked oracle (one `ln` call per DISTINCT bigram is the
  * only libm dependency; c(w1 w2)+1 ≤ c(w1)+V keeps every term ≥ 0, so
  * the final integer division floors identically on both engines).
  *
  * Scale shape: two count aggregates (map-side combined) build the
  * unigram and bigram tables; the cost table is their equi-join keyed by
  * the bigram's first token; scoring re-keys the corpus bigram stream
  * once to meet the cost table, then aggregates by doc id — two wide
  * exchanges of the bigram stream total, both irreducible for an exact
  * corpus-fit model. The 100 TB swap (documented, not the oracle path):
  * prune the cost table to df ≥ k bigrams + a constant backoff cost for
  * the tail, which shrinks the join's build side to a broadcastable
  * head and turns the stream join into a map-side lookup.
  */
object LmScore {

  /** Integer micro-nat cost per distinct bigram: (bg, c) where
    * c = ⌊ln((c(w1)+V) ∕ (c(w1 w2)+1)) · 1e6⌋ ≥ 0. */
  def bigramCostTable(docs: DataFrame, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val uni = graft.Par.widen(docs)
      .select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = graft.Par.widen(docs)
      .select(explode(TextAnalysis.shingles(col(textCol), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    big.join(uni, split(col("bg"), " ").getItem(0) === col("w"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"),
        floor(log((col("cu") + col("v")).cast("double") /
          (col("cb") + lit(1L)).cast("double")) *
          lit(1000000.0)).cast("long").as("c"))
  }

  /** Per-document LM cost (`lm_scores` query): (doc_id, n_bigrams,
    * total_cost_micro, avg_cost_micro) for every document with at least
    * one bigram. avg = total ∕∕ n (integer division; both operands
    * non-negative, so truncation ≡ floor on both engines). */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cost = bigramCostTable(docs, textCol)
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.shingles(col(textCol), 2)).as("bg"))
      .join(cost, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c")).as("total_cost_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("total_cost_micro"),
        // `div` is true integer division — a double `/` + cast could slip
        // a ulp across the truncation boundary on large totals.
        expr("total_cost_micro div n_bigrams").as("avg_cost_micro"))
      .orderBy(col("doc_id"))
  }

  /** LM-quality floor (`lm_quality_floor` query) — the curation loop
    * closed: [[scores]] feeds a robust corpus threshold (exact
    * interpolated percentile, the [[graft.relational.Relational
    * .orderPercentiles]] discipline) and documents costlier than the
    * `q`-quantile drop — CCNet's "keep the head/middle of the
    * perplexity distribution" policy with a data-derived cut instead of
    * a magic constant. One extra single-row aggregate broadcast back;
    * `percentile_approx` is the documented 100 TB swap. */
  def qualityFloor(docs: DataFrame, idCol: String, textCol: String,
                   q: Double = 0.5): DataFrame = {
    val s = scores(docs, idCol, textCol)
    val cut = s.agg(expr(s"percentile(avg_cost_micro, $q)").as("cut"))
    s.crossJoin(broadcast(cut))
      .filter(col("avg_cost_micro") <= col("cut"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_cost_micro"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of [[qualityFloor]]. */
  def sqlQualityFloor(q: Double = 0.5): String =
    s"""WITH s AS (${sqlScores.replace("ORDER BY doc_id", "")}),
       |m AS (SELECT quantile_cont(avg_cost_micro, $q) AS cut FROM s)
       |SELECT doc_id, n_bigrams, avg_cost_micro
       |FROM s, m WHERE avg_cost_micro <= m.cut
       |ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[scores]] over `documents`. */
  def sqlScores: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, UNNEST(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS bg
      |  FROM tok),
      |u AS (SELECT w, COUNT(*) AS cu FROM (SELECT UNNEST(toks) AS w FROM tok) GROUP BY 1),
      |v AS (SELECT COUNT(*) AS v FROM u),
      |b AS (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY 1),
      |cost AS (
      |  SELECT b.bg,
      |    CAST(FLOOR(ln((u.cu + v.v)::DOUBLE / (b.cb + 1)::DOUBLE) * 1000000.0) AS BIGINT) AS c
      |  FROM b JOIN u ON u.w = split_part(b.bg, ' ', 1) CROSS JOIN v),
      |d AS (
      |  SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(cost.c) AS BIGINT) AS total_cost_micro
      |  FROM bg JOIN cost ON bg.bg = cost.bg GROUP BY 1)
      |SELECT doc_id, n_bigrams, total_cost_micro,
      |  total_cost_micro // n_bigrams AS avg_cost_micro
      |FROM d ORDER BY doc_id""".stripMargin
}
