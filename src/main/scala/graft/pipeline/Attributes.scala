package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{GopherRules, TextAnalysis}

/** [EXT] One-pass attribute sidecar — the Dolma-style tagger
  * architecture (Soldaini et al. 2024): per-document gate SIGNALS are
  * computed once and stored beside the corpus keyed by document id;
  * release policies are then cheap column predicates over the sidecar,
  * and changing a threshold re-filters without re-reading a byte of
  * text. The alternative — each policy iteration re-running its taggers
  * over the raw corpus — multiplies full-corpus scans by the number of
  * policy drafts, which is exactly the cost class the `refinedweb_funnel`
  * one-pass rework eliminated.
  *
  * Scale shape: [[sidecar]] is a single projection of per-row scalar
  * expressions — every tagger this repo owns as a `Column` builder
  * (token count, language ID, composite quality, dominant script,
  * bad-word hits, the Gopher rule conjunction) evaluated in ONE scan,
  * no join between taggers, no shuffle before the output sort
  * (plan-pinned in PlanQualitySpec). [[applyPolicy]] is one LEFT SEMI
  * join on the id — the corpus side never re-keys, and only ids cross
  * the exchange.
  */
object Attributes {

  /** All per-document tagger signals in one scan. Columns reuse the
    * standalone queries' names (`n_tokens`/`quality`/`lang_pred`/
    * `dominant_script`/`bad_hits`/`entropy_unats`/`flesch_micro`) so a
    * sidecar reader can cross-check any column against the dedicated
    * operator's output (AttributesSpec does, per column). */
  def sidecar(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text",
              th: GopherRules.Thresholds = GopherRules.Thresholds(),
              badWords: Seq[String] = C4Filters.BadWords): DataFrame = {
    val t = col(textCol)
    docs.select(Seq(col(idCol),
        TextAnalysis.tokenCount(t).as("n_tokens"),
        length(t).cast("long").as("n_chars"),
        TextAnalysis.langId(t).as("lang_pred"),
        TextAnalysis.qualityScore(t).as("quality"),
        TextAnalysis.dominantScript(t).as("dominant_script"),
        size(filter(regexp_extract_all(lower(t), lit("[a-z0-9]+"), lit(0)),
          w => w.isInCollection(badWords))).cast("long").as("bad_hits"),
        GopherRules.passExpr(t, th).as("gopher_pass"),
        org.apache.spark.sql.graft.ArrayFunctions.charEntropy(t)
          .as("entropy_unats")) ++
        TextAnalysis.fleschSignalCols(t): _*)
      .withColumn("flesch_micro", expr(TextAnalysis.FleschMicroOverSignals))
      .drop("__fl_w", "__fl_s", "__fl_y")
      .orderBy(col(idCol))
  }

  /** Keep the documents whose sidecar row satisfies `policy` — the
    * release-time composition: the predicate touches only sidecar
    * columns, so policy iteration never re-reads text. */
  def applyPolicy(docs: DataFrame, sidecarDf: DataFrame, policy: Column,
                  idCol: String = "doc_id"): DataFrame =
    docs.join(sidecarDf.filter(policy).select(col(idCol)), Seq(idCol),
      "left_semi")

  /** DuckDB mirror of [[sidecar]] over a relation exposing
    * (doc_id, text). */
  def sqlSidecar(from: String,
                 th: GopherRules.Thresholds = GopherRules.Thresholds(),
                 badWords: Seq[String] = C4Filters.BadWords): String =
    s"""SELECT doc_id,
       |  CAST(${TextAnalysis.sqlTokenCount("text")} AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  ${TextAnalysis.sqlLangId("text")} AS lang_pred,
       |  ${TextAnalysis.sqlQuality("text")} AS quality,
       |  ${TextAnalysis.sqlDominantScript("text")} AS dominant_script,
       |  CAST(${C4Filters.sqlBadHits("text", badWords)} AS BIGINT) AS bad_hits,
       |  ${GopherRules.sqlPassExpr("text", th)} AS gopher_pass,
       |  ${TextAnalysis.sqlCharEntropyExpr("text")} AS entropy_unats,
       |  ${TextAnalysis.sqlFleschMicroExpr("text")} AS flesch_micro
       |FROM $from
       |ORDER BY doc_id""".stripMargin

  /** The [[applyPolicy]] composition as SQL, for a policy given as a
    * predicate over the sidecar columns. */
  def sqlApplyPolicy(from: String, policySql: String,
                     th: GopherRules.Thresholds = GopherRules.Thresholds(),
                     badWords: Seq[String] = C4Filters.BadWords): String =
    s"""WITH sc AS (${sqlSidecar(from, th, badWords)})
       |SELECT d.doc_id, d.source
       |FROM $from d
       |WHERE d.doc_id IN (SELECT doc_id FROM sc WHERE $policySql)
       |ORDER BY d.doc_id""".stripMargin
}
