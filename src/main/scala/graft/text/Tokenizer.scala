package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word tokenization with the reference's exact semantics.
  *
  * Reference: `app.py:31` — `re.findall(r'\b[a-zA-Z]+\b', text.lower())`.
  * Maximal ASCII-letter runs only: digits, underscores, punctuation and
  * non-ASCII are all separators (so "don't" tokenizes to `don`, `t`). The
  * `\b` anchors are redundant around a maximal `[a-zA-Z]+` match, so
  * `regexp_extract_all` over `[a-zA-Z]+` is exactly equivalent.
  *
  * Everything here is built-in codegen'd expressions (no UDF), so the whole
  * tokenize→filter→count pipeline stays inside WholeStageCodegen.
  */
object Tokenizer {
  val WordPattern = "[a-zA-Z]+"

  /** Array of tokens for one text value (lowercased, letter-runs only). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(WordPattern), lit(0))

  /** One row per token. Null/empty text yields no rows (explode of empty
    * array), matching the reference's truthiness filter at `app.py:26`. */
  def explodeTokens(df: DataFrame, textCol: String, out: String = "word"): DataFrame =
    df.select(explode(tokens(col(textCol))).as(out))
}
