package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Exact sub-document deduplication — the Lee et al. ("Deduplicating
  * Training Data Makes Language Models Better") / RefinedWeb operator the
  * whole-document passes can't express: boilerplate PARAGRAPHS repeated
  * across millions of pages (license headers, navigation chrome,
  * subscribe footers) survive whole-doc MinHash because the surrounding
  * text differs, and Winnow only FLAGS containment pairs — nothing removed
  * the duplicated spans themselves until this operator.
  *
  * Two unit granularities share one core:
  *  - [[paragraphUnits]]: split on a delimiter regex (default blank
  *    lines), normalize (collapse whitespace + trim + lowercase) — the
  *    RefinedWeb paragraph form;
  *  - [[spanUnits]]: fixed-width token blocks — the Lee-et-al. exact-span
  *    granularity for corpora without paragraph structure (and a cheap,
  *    SQL-expressible stand-in for suffix-array substring dedup).
  *
  * Core semantics ([[cleaned]] / [[audit]]): group units by normalized
  * text; the FIRST occurrence in (doc_id, idx) order is the keeper; a
  * non-first occurrence is removed iff its paragraph occurs
  * `minOccurrences`-or-more times corpus-wide (minOccurrences = 2 is plain
  * keep-first dedup; higher values are the RefinedWeb df-threshold policy:
  * only paragraphs frequent enough to be boilerplate are dropped, rare
  * coincidental repeats survive). Documents are rebuilt from their kept
  * units in original order; an audit table reports every repeated
  * paragraph with its occurrence/document counts and keeper position.
  *
  * Everything is plain relational algebra — window + groupBy — so both
  * outputs carry full DuckDB oracles (`paragraph_dedup`,
  * `paragraph_dedup_df`, `paragraph_dedup_audit`, `span_dedup`), unlike
  * the probabilistic dedup family.
  *
  * Scale shape (100 TB): ONE shuffle keyed by the normalized paragraph
  * (both window functions share the partition key, so Catalyst plans a
  * single Exchange + sort), then one shuffle keyed by doc id to rebuild
  * documents. The paragraph-keyed exchange necessarily carries each unit
  * once — same cost class as exact whole-doc dedup, linear, no fan-out.
  * Skewed keys are bounded: the heaviest paragraph ("Home | About | …")
  * lands on one reducer as ONE run of rows that a streaming row_number
  * handles without materializing the group. A production variant can key
  * the exchange by a 128-bit content hash (`md5`/`sha2` of norm) to
  * shorten the sort keys; the payload (doc_id, idx, raw) is irreducible —
  * raw must reach the rebuild.
  */
object ParagraphDedup {

  /** The normalization contract: collapse runs of whitespace to one
    * space, trim, lowercase — mirrored verbatim in the DuckDB oracles as
    * `lower(trim(regexp_replace(raw, '\s+', ' ', 'g')))`. */
  def normalize(raw: Column): Column =
    lower(trim(regexp_replace(raw, "\\s+", " ")))

  /** Paragraph unit table: (doc_id, idx, raw, norm), one row per
    * delimiter-separated paragraph, 0-based idx over the ORIGINAL split
    * positions. Units that normalize to "" (whitespace-only) are dropped
    * here and never count as kept or removed. Pure per-row fan-out — no
    * shuffle. */
  def paragraphUnits(docs: DataFrame, idCol: String, textCol: String,
                     splitRe: String = "\\n{2,}"): DataFrame =
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), splitRe)).as(Seq("idx", "raw")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("raw"),
        normalize(col("raw")).as("norm"))
      .filter(col("norm") =!= "")

  /** Fixed-width token-block unit table: (doc_id, idx, raw, norm), one
    * row per `spanTokens`-wide non-overlapping block of the document's
    * whitespace tokens (trailing partial block kept). raw is the
    * single-space token join, so it is already collapsed and trimmed and
    * `norm = lower(raw)` equals the [[normalize]] contract. Pure per-row
    * fan-out — no shuffle. */
  def spanUnits(docs: DataFrame, idCol: String, textCol: String,
                spanTokens: Int): DataFrame = {
    require(spanTokens > 0, "need spanTokens > 0")
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")), lit(spanTokens)),
          s => concat_ws(" ", slice(col("toks"), s, lit(spanTokens)))))
          .as(Seq("idx", "raw")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"), col("raw"),
        lower(col("raw")).as("norm"))
  }

  /** Mark each unit kept/removed: first occurrence of a norm (by
    * (doc_id, idx)) always survives; later occurrences survive only while
    * the norm's corpus-wide occurrence count stays below
    * `minOccurrences`. One Exchange: both windows partition by norm. */
  private def keepFirst(units: DataFrame, minOccurrences: Long): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences < 2 would remove nothing's copies")
    val w = Window.partitionBy(col("norm")).orderBy(col("doc_id"), col("idx"))
    val wc = Window.partitionBy(col("norm"))
    units
      .withColumn("rn", row_number().over(w))
      .withColumn("n_occ", count(lit(1)).over(wc))
      .withColumn("kept", col("rn") === 1 || col("n_occ") < minOccurrences)
  }

  /** Per-document rebuild over only the documents that HAD units:
    * (doc_id, text_clean, n_kept, n_removed). The composition form —
    * no all-input-documents join and no output sort, so pipelines
    * ([[graft.pipeline.CorpusPipeline]]) can chain it without paying a
    * Sort they immediately destroy. A document whose every unit was
    * removed still appears (text_clean = ""); a document that produced
    * no units (empty/whitespace-only) is absent. */
  def rebuilt(units: DataFrame, minOccurrences: Long = 2L,
              sep: String = "\n\n"): DataFrame =
    keepFirst(units, minOccurrences)
      .groupBy(col("doc_id"))
      .agg(
        // collect_list skips the nulls `when` leaves for removed units;
        // array_sort on (idx, raw) structs restores document order (idx
        // is unique per doc, so the sort is total and deterministic).
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("idx").as("idx"), col("raw").as("raw"))))),
          s => s.getField("raw"))).as("text_clean"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"))

  /** Cleaned documents: (doc_id, text_clean, n_kept, n_removed) for EVERY
    * input document — kept units rejoined with `sep` in original order; a
    * document whose every unit was removed (pure boilerplate) comes back
    * with text_clean = "". */
  def cleaned(docs: DataFrame, idCol: String, units: DataFrame,
              minOccurrences: Long = 2L, sep: String = "\n\n"): DataFrame = {
    val agged = rebuilt(units, minOccurrences, sep)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(agged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Removed-spans audit: every paragraph repeated `minOccurrences`-or-
    * more times, with its corpus occurrence count, distinct-document
    * count, and keeper position — the table a pipeline owner reads to see
    * WHAT the dedup removed (and the boilerplate mining feed: high-n_docs
    * rows are site chrome). One hash aggregate keyed by norm. */
  def audit(units: DataFrame, minOccurrences: Long = 2L): DataFrame =
    units.groupBy(col("norm"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        // structs order by field position, so min((doc_id, idx)) IS the
        // keep-first keeper position.
        min(struct(col("doc_id").as("doc_id"), col("idx").as("idx"))).as("first"))
      .filter(col("n_occurrences") >= minOccurrences)
      .select(col("norm").as("paragraph"),
        col("n_occurrences"), col("n_docs"),
        col("first").getField("doc_id").as("keeper_doc_id"),
        col("first").getField("idx").as("keeper_idx"))
      .orderBy(col("n_occurrences").desc, col("paragraph").asc)

  /** Persisted paragraph index over a corpus's units — the incremental
    * state: one row per DISTINCT normalized paragraph, keyed by md5 so
    * the stored index carries a 32-hex key + keeper position, never the
    * paragraph text. Written once (e.g. partitioned parquet bucketed by
    * h); batches probe it and append their novel norms. */
  def paragraphIndex(units: DataFrame): DataFrame =
    units.groupBy(md5(col("norm")).as("h"))
      .agg(min(struct(col("doc_id").as("doc_id"), col("idx").as("idx"))).as("first"))
      .select(col("h"), col("first").getField("doc_id").as("keeper_doc_id"),
        col("first").getField("idx").as("keeper_idx"))

  /** The index after absorbing a batch: existing entries win (their
    * keeper positions are history); the batch contributes one entry per
    * norm the index has never seen. */
  def indexAfterBatch(index: DataFrame, batchUnits: DataFrame): DataFrame =
    index.unionByName(
      paragraphIndex(batchUnits)
        .join(index.select(col("h")), Seq("h"), "left_anti"))

  /** [EXT] INCREMENTAL paragraph dedup (`paragraph_dedup_incremental`
    * query) — the [[Dedup.newKeepers]] discipline at paragraph
    * granularity: clean a new batch against the persisted norm-hash
    * index WITHOUT recomputing history. A batch paragraph is removed iff
    * its norm is already in the index (its keeper lives in history) or a
    * batch sibling with a smaller (doc_id, idx) carries the same norm
    * (keep-first within the batch); batch documents rebuild from their
    * kept units. Equals the batch rows of a FULL
    * [[dedupParagraphs]](history ∪ batch, minOccurrences = 2) recompute
    * whenever history doc ids precede batch doc ids (the append-only
    * corpus contract) — ParagraphDedupSpec pins the union-equivalence.
    * (The df-threshold policy needs corpus-wide occurrence counts; an
    * index carrying per-norm counts would extend this the same way.
    * Plain keep-first is implemented, matching `newKeepers`.)
    *
    * Scale shape: per-batch cost is O(|batch units| + index matches) —
    * the index is probed by an equi-join on h (pre-bucketed storage
    * makes it shuffle-free on the index side) and history text is never
    * re-read. This is the operator that makes 100 TB paragraph-clean
    * corpus builds incremental. */
  def dedupParagraphsIncremental(batch: DataFrame, idCol: String,
                                 textCol: String, index: DataFrame,
                                 splitRe: String = "\\n{2,}"): DataFrame = {
    val units = paragraphUnits(batch, idCol, textCol, splitRe)
      .withColumn("h", md5(col("norm")))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))
    val marked = units
      .join(index.select(col("h"), lit(1).as("__hist")), Seq("h"), "left")
      .withColumn("rn", row_number().over(w))
      .withColumn("kept", col("__hist").isNull && col("rn") === 1)
    val agged = marked.groupBy(col("doc_id"))
      .agg(
        concat_ws("\n\n", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("idx").as("idx"), col("raw").as("raw"))))),
          s => s.getField("raw"))).as("text_clean"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"))
    batch.select(col(idCol).cast("long").as("doc_id"))
      .join(agged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Paragraph-granularity dedup end-to-end (`paragraph_dedup` /
    * `paragraph_dedup_df` queries). */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
                      minOccurrences: Long = 2L,
                      splitRe: String = "\\n{2,}"): DataFrame =
    cleaned(docs, idCol, paragraphUnits(docs, idCol, textCol, splitRe),
      minOccurrences)

  /** Token-block-granularity dedup end-to-end (`span_dedup` query); kept
    * blocks rejoin with a single space (they are token joins). */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanTokens: Int, minOccurrences: Long = 2L): DataFrame =
    cleaned(docs, idCol, spanUnits(docs, idCol, textCol, spanTokens),
      minOccurrences, sep = " ")
}
