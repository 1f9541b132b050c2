package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-frequency top-k — the data behind the reference's word cloud.
  *
  * Reference semantics (`app.py:25-68`): tokenize all content (`app.py:31`),
  * drop stopwords and tokens of length <= 2 (`app.py:58`), count unigram
  * frequencies (`collocations=False`, `app.py:66`), keep the 150 most
  * frequent (`max_words=150`, `app.py:65`). The reference concatenates the
  * whole corpus into one string first (`app.py:30`) — an anti-pattern we do
  * NOT reproduce; per-document tokenization gives identical counts because
  * the token regex never matches across the `' '` join boundary.
  *
  * Tie order at rank k is library-internal in the reference; we pin
  * (count desc, word asc) for determinism (SURVEY §2.5 W3).
  *
  * Recorded divergence: WordCloud defaults `normalize_plurals=True`
  * (merges "word"/"words" into one bar before the top-150 cut); we count
  * surface forms verbatim — the oracle-checked contract is raw unigram
  * frequency, and a locale-blind plural merge would corrupt non-English
  * corpora the engine must also serve.
  *
  * Scale shape: explode → filter (codegen, stays in the scan stage) →
  * hash aggregate with map-side partial combine (one shuffle keyed by word)
  * → `TakeOrderedAndProject` top-k (per-partition heaps, no global sort).
  */
object WordFrequencies {
  def apply(docs: DataFrame, textCol: String = "text", k: Int = 150, minLen: Int = 3): DataFrame =
    Tokenizer.explodeTokens(docs, textCol)
      .filter(length(col("word")) >= minLen && Stopwords.keep(col("word")))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
}
