package graft.pipeline

import graft.Mat.Pinnable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{LmScore, TextAnalysis}

/** [EXT] Trained document-quality classifier (`quality_classifier`
  * query) — the fastText-style supervised gate the standard LLM-data
  * pipeline pairs with perplexity filtering (CCNet/GPT-3/LLaMA all run
  * a wiki-vs-crawl classifier next to the LM score). Here the training
  * signal is self-supervised: documents at-or-below the corpus median
  * bigram-LM cost ([[LmScore.scores]]) are weak POSITIVES, the rest
  * weak negatives — the classifier then generalizes that split onto
  * hashed lexical features, which is exactly the production recipe with
  * the labeled wiki set swapped out for an in-corpus proxy.
  *
  * Model: logistic-regression-shaped linear model over HASHED
  * bag-of-words features (md5-bucket token hashing, `numBuckets` dims —
  * the same engine-reproducible primitive as
  * [[Curation.sampleDeterministic]]), trained by `iters` rounds of
  * full-batch gradient descent with a HARD sigmoid
  * σ(z) = clamp(½ + z∕4, 0, 1). Everything is integer fixed-point
  * (micro-units): weights are integer micro-logits, the hard sigmoid is
  * one exact power-of-two floor (z∕4 is exact in binary for |z| < 2⁵³),
  * gradients are exact integer sums (order-independent), and the update
  * divides non-negative integers (truncation ≡ floor in both engines).
  * NO transcendental call anywhere in the loop — unlike a true-sigmoid
  * trainer there is no per-iteration libm parity risk — so the ENTIRE
  * training run plus inference replays as a DuckDB WITH-chain
  * ([[sqlClassifier]] unrolls the iterations, the
  * [[graft.analytics.PageRank]] discipline) and the query is
  * hash-checked end-to-end: features, labels, every weight update, and
  * every score. Training is deterministic by construction (zero init +
  * deterministic data), which subsumes "seeded".
  *
  * Scale shape (100 TB): the feature table is built once (one
  * map-combined aggregate), folded to one array row per doc, joined to
  * the iteration-invariant labels once, and checkpointed; each of the
  * `iters` rounds is then a SINGLE stage — a map pass computing the
  * per-doc error with the numBuckets weights inlined as a literal array
  * (zero joins, zero doc-keyed exchanges) followed by a map-combined
  * per-bucket gradient reduce. Only the numBuckets gradient rows ever
  * reach the driver (bounded, like the PQ codebooks). Inference is one
  * array fold per doc. Result materializes eagerly and every pinned
  * block is dropped on exit (PageRank's hygiene).
  */
object QualityClassifier {

  /** Stable feature bucket from the md5 of a token — engine-exact in
    * DuckDB as `('0x' || substring(md5(tok), 1, 8))::UBIGINT % n`. */
  def bucket(tok: Column, numBuckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % numBuckets

  /** Hashed bag-of-words feature table (doc_id, j, x): token counts per
    * md5 bucket over lowercased whitespace tokens. */
  def features(docs: DataFrame, idCol: String, textCol: String,
               numBuckets: Int): DataFrame =
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("doc_id"), bucket(col("tok"), numBuckets).as("j"))
      .agg(count(lit(1)).as("x"))

  /** Weak labels (doc_id, y), y ∈ {0, 1000000}: positive iff the doc's
    * avg bigram-LM cost is at-or-below the corpus median (a dyadic
    * quantile — engine-exact, see [[LmScore.qualityFloor]]). Docs
    * without bigrams carry no label and don't train (they still get
    * scored). */
  def weakLabels(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = LmScore.scores(docs, idCol, textCol)
    val cut = s.agg(expr("percentile(avg_cost_micro, 0.5D)").as("cut"))
    s.crossJoin(broadcast(cut))
      .select(col("doc_id"),
        when(col("avg_cost_micro") <= col("cut"), 1000000L).otherwise(0L).as("y"))
  }

  /** Hard sigmoid in micro-units: clamp(500000 + ⌊z∕4⌋, 0, 1e6). The
    * ∕4 is a power of two, so the double division is EXACT for any
    * |z| < 2⁵³ and the floor is engine-identical even for negative z. */
  private def sigmaMicro(z: Column): Column =
    least(greatest(lit(500000L) +
      floor(z.cast("double") / lit(4.0)).cast("long"), lit(0L)), lit(1000000L))

  /** The per-doc dot product z = Σ w[j]·x over a `fs: array<struct<j,x>>`
    * column, with the weight vector inlined as a numBuckets-literal
    * array — one expression fold per doc, NO per-doc join and NO
    * shuffle. Exact: integer accumulator, order-independent. (Measured
    * alternative: shipping the weights as a broadcast one-row array
    * column kept the plan shape constant across GD iterations but ran
    * ~3× slower cold — the higher-order fold is interpreted either way,
    * and the per-iteration broadcast cross-join cost more than the
    * literal re-plan.) */
  private def zExpr(w: Array[Long]): Column = {
    // typedlit, not array(lit...): ONE ArrayType literal node whose value
    // rides the expression as data. The former 256-node array(lit, ...)
    // tree changed its generated source every GD iteration (constants
    // inline into codegen), forcing a fresh Janino compile per round;
    // the single-literal form keeps the plan and generated code
    // byte-identical across iterations, so analysis + codegen are paid
    // once per query (guide §1.2 step 2 — per-task work; measured
    // ~0.2 s/iteration off the GD loop at sf0.1). Same values, same
    // element_at arithmetic — bit-identical output.
    val wLit = typedlit(w.toIndexedSeq)
    aggregate(col("fs"), lit(0L), (acc, f) =>
      acc + element_at(wLit, (f.getField("j") + 1).cast("int")) * f.getField("x"))
  }

  /** `iters` rounds of full-batch GD over the pre-joined training table
    * `train(fs: array<struct<j,x>>, y)`; returns the integer micro-logit
    * weight vector. Each round is ONE stage: a map pass computes the
    * per-doc error e = σ(z) − y with the weights inlined as a literal
    * array (no weight-table join, no per-doc shuffle — the round-6 shape
    * paid both, twice per round), then explode + map-combined agg reduces
    * to the numBuckets gradient rows, the only rows that reach the
    * driver. Update: w ← w ∓ (|g|·lrNum) div (lrDen·n) — non-negative
    * operands, so Spark's truncating `div`, JVM `/`, and DuckDB `//` all
    * agree. */
  private def trainWeights(train: DataFrame, n: Long, numBuckets: Int,
                           iters: Int, lrNum: Long, lrDen: Long): Array[Long] = {
    require(n > 0, "no labeled documents to train on")
    var w = Array.fill(numBuckets)(0L)
    for (_ <- 1 to iters) {
      val g = train
        .select((sigmaMicro(zExpr(w)) - col("y")).as("e"),
          explode(col("fs")).as("f"))
        .groupBy(col("f.j").as("j")).agg(sum(col("e") * col("f.x")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wv, j) =>
        val gj = g.getOrElse(j.toLong, 0L)
        val step = math.abs(gj) * lrNum / (lrDen * n)
        if (gj > 0) wv - step else wv + step
      }
    }
    w
  }

  /** End-to-end train + score (`quality_classifier` query):
    * (doc_id, score_micro, keep) for EVERY input document; keep = 1 iff
    * score ≥ 500000. A document with no tokens scores z = 0 → exactly
    * 500000 → kept (no evidence against it). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               numBuckets: Int = 256, iters: Int = 10,
               lrNum: Long = 1L, lrDen: Long = 16L): DataFrame = {
    val (out, labels) = classifyWithLabels(docs, idCol, textCol, numBuckets,
      iters, lrNum, lrDen)
    labels.unpersist(false)
    out
  }

  /** [[classify]] plus the pinned weak-label table it trained on — for
    * callers that need BOTH (the calibration table joins scores against
    * labels). The labels are the iteration-invariant frame classify
    * already built; returning it saves the caller a full second
    * [[LmScore.scores]] fit over the corpus (measured ~3 s at sf0.1 —
    * guide §1.2 step 1: don't compute things twice). The caller owns the
    * label frame's unpersist. */
  private[pipeline] def classifyWithLabels(
      docs: DataFrame, idCol: String, textCol: String,
      numBuckets: Int = 256, iters: Int = 10,
      lrNum: Long = 1L, lrDen: Long = 16L): (DataFrame, DataFrame) = {
    // Pre-aggregate the feature table to one array row per doc and
    // pre-join the (iteration-invariant) labels ONCE, then eagerly
    // localCheckpoint both tables: every GD iteration reads materialized
    // per-doc arrays — the round-6 loop re-ran a weight-table join plus a
    // doc-keyed shuffle twice per iteration; this shape runs zero joins
    // and only the numBuckets-wide gradient reduce per iteration.
    val featsArr = features(docs, idCol, textCol, numBuckets)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("j"), col("x"))).as("fs"))
      .pinned
    val labels = weakLabels(docs, idCol, textCol).pinned
    // Every labeled doc has features (a label needs a bigram ⇒ ≥ 2 tokens),
    // so the inner join loses nothing.
    val train = featsArr.join(labels, Seq("doc_id"))
      .select(col("fs"), col("y")).pinned
    val w = trainWeights(train, labels.count(), numBuckets, iters, lrNum, lrDen)
    val z = featsArr.select(col("doc_id"), zExpr(w).as("z"))
    val score = sigmaMicro(coalesce(col("z"), lit(0L)))
    val out = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(z, Seq("doc_id"), "left")
      .select(col("doc_id"), score.as("score_micro"),
        when(score >= 500000L, 1).otherwise(0).cast("int").as("keep"))
      .orderBy(col("doc_id"))
      .pinned
    featsArr.unpersist(false); train.unpersist(false)
    (out, labels)
  }

  /** [EXT] Calibration / reliability table for the trained gate
    * (`classifier_calibration` query) — the audit a team runs before
    * trusting the classifier's SCORES as probabilities (threshold
    * tuning, mixture weighting, loss re-weighting all read the score
    * as one): decile-bin the scores, and per bin compare the MEAN
    * PREDICTED score against the OBSERVED positive rate on the labeled
    * subset (Guo et al. 2017's reliability diagram, as a table). A
    * well-calibrated bin has gap ≈ 0; the hard-sigmoid + weak-label
    * training here is NOT a calibrated recipe, which is exactly what
    * the table shows and why it ships beside the gate.
    *
    * All integer: bins = score_micro ∕ 100000 capped at 9; observed
    * and predicted rates in per-mille via integer DIV (bins with no
    * labeled docs carry nulls — never a division by zero under ANSI).
    * One score pass + one label join + a ≤10-row aggregate. */
  def calibration(docs: DataFrame, idCol: String, textCol: String,
                  numBuckets: Int = 256, iters: Int = 10): DataFrame = {
    // Reuse the label table classify already fit: the former
    // `weakLabels(docs, ...)` here re-ran the whole bigram-LM fit +
    // percentile cut a second time (~3 s at sf0.1) for a frame classify
    // had just materialized. Same labels by construction — weakLabels is
    // deterministic — so the calibration rows are bit-identical.
    val (scored, labels) = classifyWithLabels(docs, idCol, textCol,
      numBuckets, iters)
    val out = scored.join(labels, Seq("doc_id"), "left")
      .withColumn("bin", least(expr("score_micro div 100000"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("y")).as("n_labeled"),
        sum(when(col("y") === 1000000L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y").isNotNull, col("score_micro"))).as("__sp"))
      .select(col("bin"), col("n_docs"), col("n_labeled"), col("n_pos"),
        when(col("n_labeled") === 0L, lit(null).cast("long"))
          .otherwise(expr("n_pos * 1000L div n_labeled")).as("obs_pm"),
        when(col("n_labeled") === 0L, lit(null).cast("long"))
          .otherwise(expr("__sp div (n_labeled * 1000L)")).as("pred_pm"))
      .withColumn("gap_pm", abs(col("pred_pm") - col("obs_pm")))
      .orderBy(col("bin"))
      // Materialize (≤10 rows) before dropping the label blocks the lazy
      // plan still reads — classify's hygiene contract, kept here.
      .pinned
    labels.unpersist(false)
    out
  }

  /** DuckDB mirror of [[calibration]] — the FULL oracle for
    * `classifier_calibration`: the proven classifier chain, then the
    * bin/label aggregate (the `labels` CTE stays referenceable after
    * `qc`). */
  def sqlCalibration(numBuckets: Int = 256, iters: Int = 10): String =
    s"""WITH ${sqlClassifierCtes(numBuckets, iters)},
       |cal AS (
       |  SELECT LEAST(qc.score_micro // 100000, 9) AS bin,
       |    qc.score_micro, l.y
       |  FROM qc LEFT JOIN labels l USING (doc_id)),
       |calb AS (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(y) AS BIGINT) AS n_labeled,
       |    CAST(SUM(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN y IS NOT NULL THEN score_micro END) AS BIGINT)
       |      AS sp
       |  FROM cal GROUP BY bin)
       |SELECT bin, n_docs, n_labeled, n_pos,
       |  CASE WHEN n_labeled = 0 THEN NULL
       |       ELSE n_pos * 1000 // n_labeled END AS obs_pm,
       |  CASE WHEN n_labeled = 0 THEN NULL
       |       ELSE sp // (n_labeled * 1000) END AS pred_pm,
       |  abs(CASE WHEN n_labeled = 0 THEN NULL
       |       ELSE sp // (n_labeled * 1000) END -
       |      CASE WHEN n_labeled = 0 THEN NULL
       |       ELSE n_pos * 1000 // n_labeled END) AS gap_pm
       |FROM calb ORDER BY bin""".stripMargin

  /** DuckDB mirror of [[classify]] over `documents`: the full training
    * loop unrolled as `iters` CTE rounds (z → error → gradient → weight
    * update), then inference. Every intermediate is integer (or an
    * exact power-of-two floor), so the chain hash-matches bit-for-bit.
    * Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    * round references the previous round's weights twice, so inlining
    * re-expands the whole upstream chain ~2× per round — exponential
    * plan blowup (observed: minutes instead of milliseconds at 10
    * rounds). Materialization makes the oracle evaluate each round
    * once, like the engine does. */
  def sqlClassifier(numBuckets: Int = 256, iters: Int = 10,
                    lrNum: Long = 1L, lrDen: Long = 16L): String =
    s"""WITH ${sqlClassifierCtes(numBuckets, iters, lrNum, lrDen)}
       |SELECT doc_id, score_micro, keep FROM qc ORDER BY doc_id""".stripMargin

  /** The [[sqlClassifier]] chain WITHOUT the leading `WITH` or final
    * SELECT, ending in a `qc(doc_id, score_micro, keep)` CTE — so a
    * composed oracle (e.g. `corpus_clean_classified`) can prepend it to
    * its own chain and join `qc` as the gate, exactly as
    * [[CorpusClean.withClassifierGate]] composes [[classify]]. */
  def sqlClassifierCtes(numBuckets: Int = 256, iters: Int = 10,
                        lrNum: Long = 1L, lrDen: Long = 16L): String = {
    def sigma(z: String): String =
      s"LEAST(GREATEST(500000 + CAST(FLOOR(($z) / 4.0) AS BIGINT), 0), 1000000)"
    val head =
      s"""tok AS MATERIALIZED (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+') AS toks FROM documents),
         |bg AS MATERIALIZED (
         |  SELECT doc_id, UNNEST(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM tok),
         |u AS MATERIALIZED (SELECT w, COUNT(*) AS cu FROM (SELECT UNNEST(toks) AS w FROM tok) GROUP BY 1),
         |v AS MATERIALIZED (SELECT COUNT(*) AS v FROM u),
         |b AS MATERIALIZED (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY 1),
         |cost AS MATERIALIZED (
         |  SELECT b.bg,
         |    CAST(FLOOR(ln((u.cu + v.v)::DOUBLE / (b.cb + 1)::DOUBLE) * 1000000.0) AS BIGINT) AS c
         |  FROM b JOIN u ON u.w = split_part(b.bg, ' ', 1) CROSS JOIN v),
         |lm AS MATERIALIZED (
         |  SELECT bg.doc_id,
         |    CAST(SUM(cost.c) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avg_cost_micro
         |  FROM bg JOIN cost ON bg.bg = cost.bg GROUP BY 1),
         |cut AS MATERIALIZED (SELECT quantile_cont(avg_cost_micro, 0.5) AS cut FROM lm),
         |labels AS MATERIALIZED (
         |  SELECT lm.doc_id,
         |    CAST(CASE WHEN lm.avg_cost_micro <= cut.cut THEN 1000000 ELSE 0 END AS BIGINT) AS y
         |  FROM lm CROSS JOIN cut),
         |nl AS MATERIALIZED (SELECT COUNT(*) AS n FROM labels),
         |feats AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5(tok), 1, 8))::UBIGINT % $numBuckets AS BIGINT) AS j,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM (SELECT doc_id, UNNEST(toks) AS tok FROM tok)
         |  GROUP BY 1, 2),
         |w0 AS MATERIALIZED (SELECT CAST(UNNEST(range(0, $numBuckets)) AS BIGINT) AS j,
         |              CAST(0 AS BIGINT) AS w)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |z$k AS MATERIALIZED (SELECT f.doc_id, CAST(SUM(w.w * f.x) AS BIGINT) AS z
         |       FROM feats f JOIN w${k - 1} w ON f.j = w.j GROUP BY 1),
         |e$k AS MATERIALIZED (SELECT z.doc_id, ${sigma("z.z")} - l.y AS e
         |       FROM z$k z JOIN labels l ON z.doc_id = l.doc_id),
         |g$k AS MATERIALIZED (SELECT f.j, CAST(SUM(e.e * f.x) AS BIGINT) AS g
         |       FROM feats f JOIN e$k e ON f.doc_id = e.doc_id GROUP BY 1),
         |w$k AS MATERIALIZED (SELECT w.j,
         |         w.w + (GREATEST(-COALESCE(g.g, 0), 0) * $lrNum) // ($lrDen * nl.n)
         |             - (GREATEST(COALESCE(g.g, 0), 0) * $lrNum) // ($lrDen * nl.n) AS w
         |       FROM w${k - 1} w LEFT JOIN g$k g ON w.j = g.j CROSS JOIN nl)""".stripMargin
    }.mkString
    val tail =
      s""",
         |zf AS MATERIALIZED (SELECT f.doc_id, CAST(SUM(w.w * f.x) AS BIGINT) AS z
         |       FROM feats f JOIN w$iters w ON f.j = w.j GROUP BY 1),
         |qc AS MATERIALIZED (
         |  SELECT d.doc_id AS doc_id,
         |    ${sigma("COALESCE(zf.z, 0)")} AS score_micro,
         |    CAST(${sigma("COALESCE(zf.z, 0)")} >= 500000 AS INT) AS keep
         |  FROM documents d LEFT JOIN zf ON d.doc_id = zf.doc_id)""".stripMargin
    head + rounds + tail
  }
}
