package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** [EXT] DSIR — Data Selection via Importance Resampling (Xie et al.
  * 2023) — (`dsir_weights` query): score every raw document by how much
  * it resembles a TARGET distribution, using hashed n-gram importance
  * weights. The standard use: given a small high-quality target (wiki,
  * textbooks, an in-domain slice), up-select the raw crawl toward it —
  * the model-free counterpart of
  * [[graft.pipeline.QualityClassifier]]'s trained gate.
  *
  * Model: tokens hash into `buckets` feature buckets (the md5-prefix
  * bucket — [[Curation.sampleBucket]]'s engine-reproducible primitive,
  * modulus swapped). With target/raw occurrence counts ct[f], cr[f] and
  * totals Nt, Nr, each bucket's log-likelihood-ratio weight is
  *
  *   w[f] = ⌊ln( ((ct[f]+1) · (Nr+B)) ∕ ((cr[f]+1) · (Nt+B)) ) · 1e6 ⌋
  *
  * (Laplace +1 on buckets, +B on totals), an INTEGER number of
  * micro-nats — [[graft.text.LmScore]]'s discipline, so the per-document
  * SUM over token occurrences is associative, order-independent, and
  * bit-identical in DuckDB: a floating-point importance scorer carries a
  * full hash-checked oracle. Each product stays far below 2⁵³ at oracle
  * scale (exact in doubles); the 100 TB form splits the log into
  * ln(ct+1) − ln(cr+1) + ln((Nr+B)∕(Nt+B)) — same table, no product.
  * Documents with no tokens weight 0 (left join + coalesce).
  *
  * Scale shape: the weight table is `buckets` rows built from two
  * map-combined count aggs — broadcast it; the token stream meets it in
  * a map-side join and collapses per document before the one exchange
  * (partial-sum agg keyed by doc id). The target is usually tiny; the
  * raw pass is the irreducible full-corpus token scan. */
object Dsir {

  def featureBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** (f, ct, cr) per-bucket target/raw occurrence counts — the ADDITIVE
    * form of the model: counts over a corpus union are the per-corpus
    * count sums ([[mergeCounts]]), so an incremental pipeline persists
    * THIS table (≤ `buckets` rows) and absorbs each batch by addition —
    * no history re-read ([[FineWebPipeline.incremental]]'s DSIR state). */
  def countTable(raw: DataFrame, isTarget: Column, textCol: String,
                 buckets: Int): DataFrame =
    graft.Par.widen(raw)
      .select(isTarget.as("__t"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
      .select(col("__t"), featureBucket(col("__tok"), buckets).as("f"))
      .groupBy(col("f")).agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))

  /** Count tables added bucket-wise: counts(A ∪ B) for disjoint corpora. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("f"))
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))

  /** (f, w) weight table from a (possibly merged) count table — totals
    * Nt/Nr are the count sums, so the table is self-contained. */
  def weightTableFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val totals = counts.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    counts.crossJoin(broadcast(totals)).select(col("f"),
      floor(log(((col("ct") + 1L) * (col("nr") + buckets)).cast("double") /
        ((col("cr") + 1L) * (col("nt") + buckets)).cast("double")) *
        lit(1000000.0)).cast("long").as("w"))
  }

  /** (f, w) integer micro-nat weight table from target/raw corpora. */
  def weightTable(raw: DataFrame, isTarget: Column, textCol: String,
                  buckets: Int): DataFrame =
    weightTableFromCounts(countTable(raw, isTarget, textCol, buckets), buckets)

  /** Per-document weight sums against an EXPLICIT weight table — the
    * apply-side half of [[weights]], split out so incremental callers can
    * score a batch with a table built from merged history+batch counts. */
  def weightsFromTable(docs: DataFrame, wt: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       buckets: Int = 256): DataFrame = {
    val docTok = graft.Par.widen(docs)
      .select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__tok"))
      .select(col(idCol), featureBucket(col("__tok"), buckets).as("f"))
    val sums = docTok.join(broadcast(wt), Seq("f"))
      .groupBy(col(idCol)).agg(sum(col("w")).as("__s"))
    docs.select(col(idCol)).join(sums, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__s"), lit(0L)).as("dsir_weight"))
      .orderBy(col(idCol))
  }

  /** Per-document importance weight in micro-nats, ordered by id. */
  def weights(raw: DataFrame, isTarget: Column, idCol: String = "doc_id",
              textCol: String = "text", buckets: Int = 256): DataFrame =
    weightsFromTable(raw, weightTable(raw, isTarget, textCol, buckets),
      idCol, textCol, buckets)

  /** DuckDB mirror: target = rows of `from` satisfying `targetPred`. */
  def sqlWeights(from: String, targetPred: String,
                 buckets: Int = 256): String =
    s"""WITH tk AS (
       |  SELECT doc_id, ($targetPred) AS is_t,
       |    unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS tok
       |  FROM $from),
       |tok AS (
       |  SELECT doc_id, is_t,
       |    ('0x' || substring(md5(tok), 1, 8))::UBIGINT % $buckets AS f
       |  FROM tk),
       |counts AS (
       |  SELECT f, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |         COUNT(*) AS cr
       |  FROM tok GROUP BY f),
       |totals AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts),
       |wt AS (
       |  SELECT f,
       |    CAST(FLOOR(ln(((ct + 1) * (nr + $buckets))::DOUBLE /
       |                  ((cr + 1) * (nt + $buckets))::DOUBLE) * 1000000.0)
       |         AS BIGINT) AS w
       |  FROM counts CROSS JOIN totals)
       |SELECT d.doc_id, COALESCE(s.s, 0) AS dsir_weight
       |FROM $from d LEFT JOIN (
       |  SELECT tok.doc_id, CAST(SUM(wt.w) AS BIGINT) AS s
       |  FROM tok JOIN wt USING (f) GROUP BY tok.doc_id) s
       |  ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
