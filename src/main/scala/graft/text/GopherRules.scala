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

  private val BulletRe = "^[ \t]*[-*•]"
  private val EllipsisRe = "[.][.][.][ \t]*$"

  private def occurrences(text: Column, lit_ : String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(lit_), ""))) /
      lit_.length).cast("long")

  /** Signal table: one row per document, ordered by id. */
  def signals(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val t = col(textCol)
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
    val sig = docs.select(
      col(idCol),
      nWords.as("n_words"),
      round(TextAnalysis.meanTokenLenRaw(t), 4).as("mean_word_len"),
      round(size(filter(toks, w => w.rlike("[a-zA-Z]"))).cast("double") /
        nWordsD, 4).as("frac_alpha_words"),
      round((occurrences(t, "#") + occurrences(t, "...")).cast("double") /
        nWordsD, 4).as("symbol_ratio"),
      fracLines(BulletRe).as("frac_bullet_lines"),
      fracLines(EllipsisRe).as("frac_ellipsis_lines"),
      stopHits.as("stop_hits"))
    sig.withColumn("pass",
        col("n_words").between(50L, 100000L) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") < 0.1 &&
        col("frac_bullet_lines") < 0.9 &&
        col("frac_ellipsis_lines") < 0.3 &&
        col("frac_alpha_words") > 0.8 &&
        col("stop_hits") >= 2L)
      .orderBy(col(idCol))
  }

  /** Documents surviving the gate (the composable form). */
  def gate(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame =
    docs.join(signals(docs, idCol, textCol)
      .filter(col("pass")).select(col(idCol)), Seq(idCol))

  // ---- DuckDB mirror (RE2 \s excludes \x0B, so the token byte set is
  // pinned explicitly — same discipline as TextAnalysis.sqlToks). ----

  private def sqlToks(t: String) =
    s"regexp_extract_all($t, '[^ \\t\\n\\x0B\\f\\r]+')"

  /** Oracle SQL over a relation exposing (doc_id, text). `from` is the
    * source relation (a table name or a VALUES CTE alias). */
  def sqlSignals(from: String): String = {
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
       |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
       |   AND symbol_ratio < 0.1 AND frac_bullet_lines < 0.9
       |   AND frac_ellipsis_lines < 0.3 AND frac_alpha_words > 0.8
       |   AND stop_hits >= 2) AS pass
       |FROM sig ORDER BY doc_id""".stripMargin
  }
}
