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
}
