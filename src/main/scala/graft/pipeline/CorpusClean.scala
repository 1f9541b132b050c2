package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The end-to-end training-corpus cleaning composition
  * (`corpus_clean` query) — what an LLM-data user actually runs:
  *
  * {{{ documents → quality floor → language gate → near-dup keepers → clean corpus }}}
  *
  * Each stage is an operator the library already oracle-checks in
  * isolation; this query pins the COMPOSITION end-to-end against one
  * DuckDB recursive-CTE oracle (filters inside the CTE, CC over the
  * filtered pair graph), so stage-ordering regressions (e.g. deduping
  * before filtering, which changes which doc becomes a component's
  * keeper) hash-mismatch immediately.
  *
  * Order matters and is part of the contract: filter FIRST, then dedup —
  * a near-dup cluster whose min-id member fails the quality gate must
  * elect a new keeper among the survivors, exactly what running CC on the
  * filtered graph yields. At 100 TB swap the blocked exact pair feed for
  * [[Dedup.nearDupKeepersScaled]] — same keepers up to LSH recall (see
  * `dedup_keepers_scaled`).
  */
object CorpusClean {

  def apply(docs: DataFrame, minQuality: Double = 0.5, lang: String = "en",
            dedupThreshold: Double = 0.9,
            idCol: String = "doc_id", textCol: String = "text",
            blockCol: String = "source",
            materialize: DataFrame => DataFrame = graft.Mat.pin): DataFrame =
    build(docs, minQuality, lang, idCol, textCol, blockCol,
      f => Dedup.nearDupKeepers(f, idCol, textCol, blockCol, dedupThreshold),
      materialize)

  /** The 100 TB variant (`corpus_clean_scaled` query): identical stages,
    * but the dedup feed is the CORPUS-WIDE MinHash→verify→CC path
    * ([[Dedup.nearDupKeepersScaled]]) — no blocking key, bucketed
    * candidate generation. Note the semantics differ from [[apply]] by
    * design: the exact path dedups within `blockCol` blocks (the audit
    * contract), this one across the whole corpus (what you actually want
    * at scale — cross-source mirrors merge). Equal to corpus-wide exact
    * Jaccard up to LSH recall (a J ≥ 0.9 pair is missed with prob ≈ 4e-8),
    * so the DuckDB oracle runs the corpus-wide quadratic CC and
    * hash-matches — the same oracle discipline as `dedup_keepers_scaled`.
    *
    * `sourceCol` is carried through to the OUTPUT projection only — unlike
    * [[apply]]'s `blockCol` it is NOT a blocking key (renamed per round-4
    * advice: the scaled dedup is corpus-wide by design, and a parameter
    * named `blockCol` invited callers to believe blocking was honored). */
  def scaled(docs: DataFrame, minQuality: Double = 0.5, lang: String = "en",
             dedupThreshold: Double = 0.9,
             idCol: String = "doc_id", textCol: String = "text",
             sourceCol: String = "source",
             materialize: DataFrame => DataFrame = graft.Mat.pin,
             maxBucket: Int = 4096): DataFrame =
    // `maxBucket` (r13): the F134 LSH safety valve rides the production
    // entry point — the default never binds at driver fixture scales
    // (oracle stays the exact corpus-wide CC), and on a degenerate
    // corpus it bounds the Σm² bucket pair mass the m100 audit measured
    // spilling TB-scale. Pass Int.MaxValue to disable.
    build(docs, minQuality, lang, idCol, textCol, sourceCol,
      f => Dedup.nearDupKeepersScaled(f, idCol, textCol, dedupThreshold,
        maxBucket),
      materialize)

  /** [[apply]] with the TRAINED quality gate composed in front: documents
    * the [[QualityClassifier]] rejects (keep = 0) never reach the
    * heuristic quality/language filters or the dedup pair feed — the
    * model-based pre-gate the production pipelines run (classifier +
    * perplexity + heuristics, each cutting the next stage's input).
    * Classifier training sees the UNGATED corpus (its weak labels need
    * the full LM cost distribution); only the survivors flow on. */
  def withClassifierGate(docs: DataFrame, minQuality: Double = 0.5,
                         lang: String = "en", dedupThreshold: Double = 0.9,
                         idCol: String = "doc_id", textCol: String = "text",
                         blockCol: String = "source",
                         iters: Int = 10): DataFrame = {
    val verdicts = QualityClassifier.classify(docs, idCol, textCol, iters = iters)
      .filter(col("keep") === 1).select(col("doc_id").as("__keep_id"))
    val gated = docs.join(verdicts, docs(idCol) === col("__keep_id"))
      .drop("__keep_id")
    apply(gated, minQuality, lang, dedupThreshold, idCol, textCol, blockCol)
  }

  /** `materialize` pins the shared stage frame (default
    * [[graft.Mat.pin]] — the session-wide `spark.graft.materialize`
    * knob; pass an explicit function to override per call). Output is
    * materializer-invariant (CorpusCleanSpec pins it). */
  private def build(docs: DataFrame, minQuality: Double, lang: String,
                    idCol: String, textCol: String, blockCol: String,
                    keepersOf: DataFrame => DataFrame,
                    materialize: DataFrame => DataFrame): DataFrame = {
    val filtered = materialize(docs
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.langId(col(textCol)) === lang))
      // feeds the pair join, the CC ids, and the output
    val keepers = keepersOf(filtered)
      .filter(col("doc_id") === col("keeper_id"))
      .select(col("doc_id"))
    filtered
      .join(keepers, filtered(idCol) === keepers("doc_id"))
      .select(filtered(idCol),
        col(blockCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .orderBy(col(idCol))
  }
}
