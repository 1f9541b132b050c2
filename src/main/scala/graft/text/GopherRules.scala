package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Gopher document-quality rules (`gopher_rules` /
  * `gopher_rules_edge` queries) — the rule-based quality gate of Rae et
  * al. 2021 (Gopher, Appendix A1.1), the heuristic filter every
  * large-scale web-text pipeline runs BEFORE model-based scoring
  * ([[LmScore]], [[graft.pipeline.QualityClassifier]]): cheap per-row
  * signals catch listings, navigation chrome, mangled encodings, and
  * word-salad that would waste classifier budget. Complements the
  * reference's length/stopword token filter (app.py:33-57) at document
  * granularity.
  *
  * Signals (each a pure per-row expression; ratios rounded to 4 — the
  * repo's cross-engine float discipline):
  *
  *  - `n_words`: `\S+` token count;
  *  - `mean_word_len`: non-whitespace characters per word;
  *  - `frac_alpha_words`: fraction of words containing >= 1 [a-zA-Z];
  *  - `symbol_ratio`: (# of '#' + # of '...') / n_words — the
  *    "symbol-to-word ratio" rule ('....' counts once: both engines
  *    replace non-overlapping leftmost-first);
  *  - `frac_bullet_lines` / `frac_ellipsis_lines`: fraction of
  *    '\n'-split lines starting with a bullet ('-', '*', '•', after
  *    optional space/tab) resp. ending in '...' (before optional
  *    space/tab); EVERY physical line counts in the denominator (>= 1:
  *    splitting '' yields one empty line);
  *  - `stop_hits`: how many DISTINCT words of the required-word list
  *    {the, be, to, of, and, that, have, with} appear (lowercased).
  *
  * `pass` is Gopher's conjunction: 50 <= n_words <= 100000,
  * 3 <= mean_word_len <= 10, symbol_ratio < 0.1,
  * frac_bullet_lines < 0.9, frac_ellipsis_lines < 0.3,
  * frac_alpha_words > 0.8, stop_hits >= 2. Thresholds compare ROUNDED
  * values, so the boundary is engine-exact.
  *
  * Scale shape: zero joins, zero shuffles before the output sort — the
  * whole operator is a projection over the scan and runs in whole-stage
  * codegen. At 100 TB it is the first, cheapest gate in the pipeline
  * (cf. [[graft.pipeline.CorpusClean]] ordering: rule gates before
  * model gates before dedup). */
object GopherRules {

  val RequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The rule bounds, parameterized: every production pipeline tunes
    * these (FineWeb, RefinedWeb, Dolma all ship adjusted cuts); the
    * defaults are Gopher's published values. Thresholds compare against
    * the ROUNDED signals, so any instance stays engine-exact. */
  final case class Thresholds(minWords: Long = 50L, maxWords: Long = 100000L,
                              minMeanWordLen: Double = 3.0,
                              maxMeanWordLen: Double = 10.0,
                              maxSymbolRatio: Double = 0.1,
                              maxBulletFrac: Double = 0.9,
                              maxEllipsisFrac: Double = 0.3,
                              minAlphaFrac: Double = 0.8,
                              minStopHits: Long = 2L)

  private val BulletRe = "^[ \t]*[-*•]"
  private val EllipsisRe = "[.][.][.][ \t]*$"

  private def occurrences(text: Column, lit_ : String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(lit_), ""))) /
      lit_.length).cast("long")

  /** The seven ROUNDED signal expressions over a text column, in output
    * order. Shared by [[signals]] and [[passExpr]] so a standalone gate
    * (e.g. [[graft.pipeline.Curation.curationFunnel]]) evaluates the
    * byte-identical rules without materializing the signal table. */
  private def signalCols(t: Column): Seq[(String, Column)] = {
    val toks = TextAnalysis.tokens(t)
    val nWords = size(toks).cast("long")
    val nWordsD = nullif(nWords, lit(0L)).cast("double")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("double")
    val fracLines = (re: String) =>
      round(size(filter(lines, l => l.rlike(re))).cast("double") / nLines, 4)
    val stopHits = size(array_intersect(
      array_distinct(TextAnalysis.tokens(lower(t))),
      array(RequiredWords.map(lit): _*))).cast("long")
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> round(TextAnalysis.meanTokenLenRaw(t), 4),
      "frac_alpha_words" ->
        round(size(filter(toks, w => w.rlike("[a-zA-Z]"))).cast("double") /
          nWordsD, 4),
      "symbol_ratio" ->
        round((occurrences(t, "#") + occurrences(t, "...")).cast("double") /
          nWordsD, 4),
      "frac_bullet_lines" -> fracLines(BulletRe),
      "frac_ellipsis_lines" -> fracLines(EllipsisRe),
      "stop_hits" -> stopHits)
  }

  /** The pass conjunction as a standalone per-row expression. */
  def passExpr(t: Column, th: Thresholds = Thresholds()): Column = {
    val s = signalCols(t).toMap
    s("n_words").between(th.minWords, th.maxWords) &&
      s("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
      s("symbol_ratio") < th.maxSymbolRatio &&
      s("frac_bullet_lines") < th.maxBulletFrac &&
      s("frac_ellipsis_lines") < th.maxEllipsisFrac &&
      s("frac_alpha_words") > th.minAlphaFrac &&
      s("stop_hits") >= th.minStopHits
  }

  /** Signal table: one row per document, ordered by id. */
  def signals(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text",
              th: Thresholds = Thresholds()): DataFrame = {
    val t = col(textCol)
    val sig = docs.select(
      col(idCol) +: signalCols(t).map { case (n, c) => c.as(n) }: _*)
    sig.withColumn("pass",
        col("n_words").between(th.minWords, th.maxWords) &&
        col("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
        col("symbol_ratio") < th.maxSymbolRatio &&
        col("frac_bullet_lines") < th.maxBulletFrac &&
        col("frac_ellipsis_lines") < th.maxEllipsisFrac &&
        col("frac_alpha_words") > th.minAlphaFrac &&
        col("stop_hits") >= th.minStopHits)
      .orderBy(col(idCol))
  }

  /** Documents surviving the gate (the composable form). */
  def gate(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text",
           th: Thresholds = Thresholds()): DataFrame =
    docs.join(signals(docs, idCol, textCol, th)
      .filter(col("pass")).select(col(idCol)), Seq(idCol))

  // ---- DuckDB mirror (RE2 \s excludes \x0B, so the token byte set is
  // pinned explicitly — same discipline as TextAnalysis.sqlToks). ----

  private def sqlToks(t: String) =
    s"regexp_extract_all($t, '[^ \\t\\n\\x0B\\f\\r]+')"

  /** The pass conjunction as inline DuckDB SQL over a text expression —
    * the 1:1 mirror of [[passExpr]] for composed oracles. */
  def sqlPassExpr(t: String, th: Thresholds = Thresholds()): String = {
    val req = RequiredWords.map(w => s"'$w'").mkString("[", ", ", "]")
    val nw = s"len(${sqlToks(t)})"
    val nwd = s"nullif($nw, 0)::DOUBLE"
    val lines = s"string_split($t, chr(10))"
    s"""($nw BETWEEN ${th.minWords} AND ${th.maxWords}
       | AND round(length(regexp_replace($t, '\\s', '', 'g'))::DOUBLE / $nwd, 4)
       |     BETWEEN ${th.minMeanWordLen} AND ${th.maxMeanWordLen}
       | AND round(((length($t) - length(replace($t, '#', ''))) +
       |            (length($t) - length(replace($t, '...', ''))) / 3)::DOUBLE /
       |           $nwd, 4) < ${th.maxSymbolRatio}
       | AND round(len(list_filter($lines, l -> regexp_matches(l, '^[ \\t]*[-*•]')))::DOUBLE /
       |           len($lines)::DOUBLE, 4) < ${th.maxBulletFrac}
       | AND round(len(list_filter($lines, l -> regexp_matches(l, '[.][.][.][ \\t]*$$')))::DOUBLE /
       |           len($lines)::DOUBLE, 4) < ${th.maxEllipsisFrac}
       | AND round(len(list_filter(${sqlToks(t)}, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE /
       |           $nwd, 4) > ${th.minAlphaFrac}
       | AND len(list_intersect(list_distinct(${sqlToks(s"lower($t)")}), $req)) >= ${th.minStopHits})""".stripMargin
  }

  /** Oracle SQL over a relation exposing (doc_id, text). `from` is the
    * source relation (a table name or a VALUES CTE alias). */
  def sqlSignals(from: String, th: Thresholds = Thresholds()): String = {
    val req = RequiredWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH sig AS (
       |  SELECT doc_id,
       |    len(${sqlToks("text")}) AS n_words,
       |    round(length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE /
       |          nullif(len(${sqlToks("text")}), 0)::DOUBLE, 4) AS mean_word_len,
       |    round(len(list_filter(${sqlToks("text")}, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE /
       |          nullif(len(${sqlToks("text")}), 0)::DOUBLE, 4) AS frac_alpha_words,
       |    round(((length(text) - length(replace(text, '#', ''))) +
       |           (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE /
       |          nullif(len(${sqlToks("text")}), 0)::DOUBLE, 4) AS symbol_ratio,
       |    round(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '^[ \\t]*[-*•]')))::DOUBLE /
       |          len(string_split(text, chr(10)))::DOUBLE, 4) AS frac_bullet_lines,
       |    round(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '[.][.][.][ \\t]*$$')))::DOUBLE /
       |          len(string_split(text, chr(10)))::DOUBLE, 4) AS frac_ellipsis_lines,
       |    len(list_intersect(list_distinct(${sqlToks("lower(text)")}), $req)) AS stop_hits
       |  FROM $from)
       |SELECT *,
       |  (n_words BETWEEN ${th.minWords} AND ${th.maxWords}
       |   AND mean_word_len BETWEEN ${th.minMeanWordLen} AND ${th.maxMeanWordLen}
       |   AND symbol_ratio < ${th.maxSymbolRatio}
       |   AND frac_bullet_lines < ${th.maxBulletFrac}
       |   AND frac_ellipsis_lines < ${th.maxEllipsisFrac}
       |   AND frac_alpha_words > ${th.minAlphaFrac}
       |   AND stop_hits >= ${th.minStopHits}) AS pass
       |FROM sig ORDER BY doc_id""".stripMargin
  }
}
