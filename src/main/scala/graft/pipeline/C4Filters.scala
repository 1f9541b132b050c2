package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** [EXT] C4-style line/page cleaning (`c4_filters` query) — the
  * sentence-level heuristics of Raffel et al. 2020 (C4, §2.2) that turn
  * raw page text into prose-only training text. Where
  * [[graft.text.GopherRules]] KEEPS or DROPS whole documents, C4 edits
  * INSIDE the document — dropping navigation/menu/footer lines — then
  * drops pages left with too little prose. The reference joins every
  * `<p>` block unconditionally (crawl.py:85-86, chrome included); this
  * operator is the standard cleanup for exactly that output.
  *
  * Line rule (lines = '\n' split): a line is kept iff
  *  - its space-trimmed form ends in terminal punctuation (`[.!?"]`),
  *  - it has >= `minWordsPerLine` (default 5) `\S+` words, and
  *  - it does not contain 'javascript' (case-insensitive).
  *
  * Page rule: a page survives iff its ORIGINAL text contains neither
  * 'lorem ipsum' (case-insensitive) nor '{' (code/markup), and >=
  * `minLines` (default 3) lines were kept. Survivors emit the kept
  * lines rejoined with '\n' as `clean_text` plus `n_lines_kept`.
  *
  * Scale shape: identical to [[graft.text.GopherRules]] — pure per-row
  * array expressions (split → lambda filter → array_join), no explode,
  * no joins, no shuffle before the output sort; the whole operator
  * stays in whole-stage codegen and pushes nothing but the final
  * projection through the scan. */
object C4Filters {

  def clean(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", minWordsPerLine: Int = 5,
            minLines: Int = 3): DataFrame = {
    val t = col(textCol)
    val kept = filter(split(t, "\n"), l =>
      trim(l).rlike("[.!?\"]$") &&
        size(TextAnalysis.tokens(l)) >= minWordsPerLine &&
        !contains(lower(l), lit("javascript")))
    docs.select(col(idCol), t,
        array_join(kept, "\n").as("clean_text"),
        size(kept).cast("long").as("n_lines_kept"))
      .filter(!contains(lower(t), lit("lorem ipsum")) &&
        !contains(t, lit("{")) && col("n_lines_kept") >= minLines)
      .select(col(idCol), col("clean_text"), col("n_lines_kept"))
      .orderBy(col(idCol))
  }

  /** DuckDB mirror over a relation exposing (doc_id, text). Defaults
    * match [[clean]]. The token byte set is pinned explicitly (RE2 \s
    * excludes \x0B). */
  def sqlClean(from: String, minWordsPerLine: Int = 5,
               minLines: Int = 3): String =
    s"""WITH k AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, chr(10)), l ->
       |      regexp_matches(trim(l), '[.!?"]$$')
       |      AND len(regexp_extract_all(l, '[^ \\t\\n\\x0B\\f\\r]+')) >= $minWordsPerLine
       |      AND NOT contains(lower(l), 'javascript')) AS kept
       |  FROM $from)
       |SELECT doc_id,
       |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
       |  CAST(len(kept) AS BIGINT) AS n_lines_kept
       |FROM k
       |WHERE NOT contains(lower(text), 'lorem ipsum')
       |  AND NOT contains(text, '{') AND len(kept) >= $minLines
       |ORDER BY doc_id""".stripMargin

  /** Representative subset of the word blocklist C4 pages are dropped
    * on (Raffel et al. 2020 §2.2 cite the "List of Dirty, Naughty,
    * Obscene or Otherwise Bad Words"; production crawls add UT1-style
    * spam terms). Same vendored-subset discipline as the PSL
    * ([[graft.ingest.Psl]]) and the UT1 word subset
    * ([[graft.ingest.Urls.SpamWords]]): the SHAPE is exact — swap the
    * list, not the code, to deploy the full ~400-entry original. Entries
    * must be lowercase alphanumeric runs: matching is token-set
    * membership over `[a-z0-9]+` runs, which IS word-boundary semantics
    * (a listed word inside a larger token never matches). */
  val BadWords: Seq[String] = Seq(
    "porn", "erotic", "nude", "xxx", "viagra", "escort", "casino",
    "bukkake")

  /** C4's page-level bad-words gate (`c4_badwords` query): count listed
    * words appearing as whole tokens in the page, flag the page blocked
    * on any hit. C4 drops the page outright; emitting the decision as
    * a column keeps the gate auditable (the caller filters on
    * `blocked`) and the false-positive rate measurable.
    *
    * Token boundary = alphanumeric runs of the lowercased text, so
    * `porn-site` hits (hyphen splits) while `sextonbury` does not
    * (substring inside a larger run). Membership compiles to an InSet
    * hash probe inside a native array lambda — pure per-row scan-stage
    * work, no shuffle before the output sort. For a deny-list too big
    * to pin in the plan, explode tokens and LEFT ANTI a broadcast table
    * instead ([[graft.text.Stopwords.removeViaAntiJoin]]'s shape). */
  def badWords(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text",
               words: Seq[String] = BadWords): DataFrame = {
    require(words.nonEmpty && words.forall(_.matches("[a-z0-9]+")),
      "bad words must be lowercase alphanumeric runs")
    val toks = regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
    docs.select(col(idCol),
        size(filter(toks, t => t.isInCollection(words)))
          .cast("long").as("bad_hits"))
      .withColumn("blocked", col("bad_hits") > 0L)
      .orderBy(col(idCol))
  }

  /** DuckDB scalar twin of the [[badWords]] hit count over a text
    * expression. */
  def sqlBadHits(t: String, words: Seq[String] = BadWords): String = {
    val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(regexp_extract_all(lower($t), '[a-z0-9]+'), " +
      s"t -> list_contains($list, t)))"
  }

  /** DuckDB mirror of [[badWords]] over a relation exposing
    * (doc_id, text). */
  def sqlBadWords(from: String, words: Seq[String] = BadWords): String =
    s"""SELECT doc_id,
       |  CAST(${sqlBadHits("text", words)} AS BIGINT) AS bad_hits,
       |  ${sqlBadHits("text", words)} > 0 AS blocked
       |FROM $from
       |ORDER BY doc_id""".stripMargin
}
