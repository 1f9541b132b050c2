package graft

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{RecentArticles, SourceDistribution, Timeline, Totals}
import graft.dedup.Dedup
import graft.ingest.{Dates, Ingest}
import graft.multimodal.Multimodal
import graft.relational.Relational
import graft.similarity.{FittedOracle, Ivf, Pq, Similarity}
import graft.streaming.EventWindows
import graft.text.{Stopwords, TextAnalysis, WordFrequencies}

import graft.EntryFixtures._

/** text statistics, normalization, language id, fingerprints — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesText {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- [EXT] text analysis ----
    "text_stats" -> ((s, dir) => TextAnalysis.stats(Tables.documents(s, dir))),
    // Flesch reading ease in exact integer micro-points — the classic
    // edu-quality feature; single-regex counts, truncating long DIVs.
    "readability_scores" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir))),
    // Unicode NFC canonicalization (r9) — the stage ahead of dedup keys
    // and tokenization: NFD suffixes are planted on odd doc ids (composed
    // NFC on even), and norm_md5 proves both engines collapse them to the
    // same canonical bytes while raw_md5 pins that they differed. Full
    // oracle via DuckDB's nfc_normalize; NormalizeSpec pins the dedup
    // catch (an NFD/NFC duplicate pair exact dedup misses raw and finds
    // post-normalization).
    "normalize_text" -> ((s, dir) => {
      val suffix = when(col("doc_id") % 2 === 0,
        lit(" café Ångström"))     // NFC: composed é, Å, ö
        .otherwise(lit(" café Ångström")) // NFD: combining marks
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(concat(col("text"), suffix)).as("raw_md5"),
          md5(org.apache.spark.sql.graft.ArrayFunctions.nfcNormalize(
            concat(col("text"), suffix))).as("norm_md5"))
        .orderBy(col("doc_id"))
    }),
    "lang_distribution" -> ((s, dir) => TextAnalysis.langDistribution(Tables.documents(s, dir))),
    // Writing-system profile over a planted multi-script corpus (the
    // ASCII fixture text stands in for latin docs; ids ≢ 0 mod 5 swap in
    // a non-latin sample so counts AND the dominant script vary).
    "script_mix" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(ScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.scriptMix(planted)
    }),
    // Character-diversity quality tagger (r10): unigram codepoint
    // entropy in integer micro-nats (per-term ⌊ln·1e6⌋ lift — the
    // LmScore discipline, so the transcendental never meets a float
    // sum). Fixture reuses the script samples so supplementary-plane
    // codepoints (𠀀, 😀) exercise the codepoint-vs-UTF-16 trap.
    "char_entropy" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(ScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.charEntropy(planted)
    }),
    "doc_fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir))),
    // Language-vs-script disagreement audit over a planted mix of
    // transliterated, mislabeled, consistent, and abstaining docs.
    // n-gram language ID over fitted per-language trigram profiles —
    // the Cavnar-Trenkle heuristic with the printed-constant oracle.
    "langid_ngram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val prof = TextAnalysis.fitLangProfiles(docs)
      FittedOracle.langIdProfiles = Some(prof)
      TextAnalysis.langIdNgram(docs, prof)
    }),
    "langid_confusion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val prof = TextAnalysis.fitLangProfiles(docs)
      FittedOracle.langConfusionProfiles = Some(prof)
      TextAnalysis.langIdConfusion(docs, prof)
    }),
    "lang_script_consistency" -> ((s, dir) => {
      val planted = Tables.documents(s, dir).withColumn("text",
        when(col("doc_id") % 5 === 0, col("text")).otherwise(
          element_at(array(LangScriptSamples.map(lit(_)): _*),
            (col("doc_id") % 5).cast("int"))))
      TextAnalysis.langScriptConsistency(planted)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "doc_fingerprints" ->
      """SELECT doc_id,
        |  CAST(('0x' || substring(md5(text), 1, 15))::UBIGINT AS BIGINT) AS doc_fp,
        |  list_min(list_transform(
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
        |    s -> CAST(('0x' || substring(md5(s), 1, 15))::UBIGINT AS BIGINT))) AS min_shingle_fp
        |FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "readability_scores" ->
      TextAnalysis.sqlReadability("documents"),
    "text_stats" ->
      s"""SELECT doc_id,
         |  ${TextAnalysis.sqlTokenCount("text")} AS n_tokens,
         |  ${TextAnalysis.sqlBpeishCount("text")} AS n_bpeish,
         |  round(${TextAnalysis.sqlMeanTokenLen("text")}, 4) AS mean_token_len,
         |  round(${TextAnalysis.sqlAlphaRatio("text")}, 4) AS alpha_ratio,
         |  round(${TextAnalysis.sqlStopRatio("text")}, 4) AS stop_ratio,
         |  ${TextAnalysis.sqlQuality("text")} AS quality,
         |  ${TextAnalysis.sqlLangId("text")} AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    // normalize_text: the NFC/NFD suffixes print as raw UTF-8 into the
    // SQL (composed on even ids, combining-mark decomposed on odd);
    // DuckDB's nfc_normalize is the oracle for the engine's NfcNormalize.
    // script_mix: RE2 range twins of the Java ranges; dominant via the
    // same greatest + first-in-order CASE chain.
    "char_entropy" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${ScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |${TextAnalysis.sqlCharEntropy("p", "doc_id", "t")}""".stripMargin
    },
    "script_mix" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${ScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      val counts = TextAnalysis.ScriptRangesSql.map { case (n, r) =>
        n -> TextAnalysis.sqlScriptCount("t", r)
      }
      val mx = s"greatest(${counts.map(c => s"n_${c._1}").mkString(", ")})"
      val dominant = counts.map { case (n, _) =>
        s"WHEN $mx > 0 AND n_$n = $mx THEN '$n'"
      }.mkString("CASE ", " ", " ELSE 'none' END")
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    ${counts.map { case (n, e) => s"CAST($e AS BIGINT) AS n_$n" }.mkString(",\n    ")}
         |  FROM p)
         |SELECT doc_id, ${counts.map(c => s"n_${c._1}").mkString(", ")},
         |  $dominant AS dominant_script
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "lang_script_consistency" -> {
      val planted = "CASE WHEN doc_id % 5 = 0 THEN text ELSE " +
        s"[${LangScriptSamples.map(s => s"'$s'").mkString(", ")}]" +
        "[CAST(doc_id % 5 AS INT)] END"
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents)
         |SELECT doc_id,
         |  ${TextAnalysis.sqlLangScriptConsistency("t")}
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "normalize_text" -> {
      val nfc = " café Ångström"
      val nfd = " café Ångström"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 2 = 0 THEN '$nfc' ELSE '$nfd' END AS raw
         |  FROM documents)
         |SELECT doc_id, md5(raw) AS raw_md5, md5(nfc_normalize(raw)) AS norm_md5
         |FROM t ORDER BY doc_id""".stripMargin
    },
    "lang_distribution" ->
      s"""SELECT ${TextAnalysis.sqlLangId("text")} AS lang_pred, COUNT(*) AS n
         |FROM documents GROUP BY 1 ORDER BY lang_pred""".stripMargin,
  )
}
