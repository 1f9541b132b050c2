package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's stopword set, copied verbatim from `app.py:33-57`.
  *
  * It is part of the query semantics (not tunable config): the word-frequency
  * results are defined as token counts AFTER removing exactly these words.
  * The reference applies the set twice (explicit filter `app.py:58` and again
  * as the WordCloud `stopwords=` param `app.py:67`) — idempotent, so we apply
  * it once.
  *
  * Scale note: at ~150 entries the predicate compiles to a Catalyst `InSet`
  * (O(1) hash probe per token, shipped with the plan — no shuffle, no join).
  * A broadcast anti-join only wins once the set itself is large enough to be
  * a table; that variant is `removeViaAntiJoin` below for the 100 TB-scale
  * story with big deny-lists.
  */
object Stopwords {
  // Verbatim from app.py:33-57 (Python set literal; duplicates collapse).
  val words: Seq[String] = Seq(
    "the", "and", "to", "of", "a", "in", "is", "it", "that", "for", "on", "with",
    "as", "at", "by", "this", "be", "are", "was", "were", "an", "or", "you", "your",
    "we", "our", "us", "they", "them", "their", "has", "have", "had", "but", "so",
    "if", "can", "will", "would", "should", "could", "about", "from", "how", "what",
    "when", "where", "which", "who", "whom", "why", "notion", "todoist", "evernote",
    "one", "two", "need", "get", "nothing", "day", "life", "all", "these", "just",
    "something", "isnt", "new", "off", "well", "back", "thing", "plus", "doing",
    "doesnt", "there", "every", "always", "somthimes", "anohter", "into", "join",
    "rather", "out",
    "i", "me", "my", "mine", "myself",
    "he", "him", "his", "himself",
    "she", "her", "hers", "herself",
    "its", "itself",
    "ourselves", "yourselves", "themselves",
    "am", "do", "does", "did",
    "up", "down", "over", "under", "again", "further", "then", "once",
    "here", "because", "while", "although", "even", "though",
    "before", "after", "during", "until", "within", "without", "across",
    "through", "between", "among", "both", "each", "few", "more", "most",
    "other", "some", "such", "no", "nor", "not", "only", "own", "same",
    "than", "too", "very", "s", "t", "don", "now",
    "also", "still", "yet", "many", "much", "way", "let", "maybe", "ok", "okay",
    "really", "actually", "ever", "often", "sometimes", "almost"
  ).distinct

  val set: Set[String] = words.toSet

  /** Predicate: token is NOT a stopword. Compiles to InSet (hash lookup). */
  def keep(word: Column): Column = !word.isInCollection(words)

  /** SQL `NOT IN (...)` list for DuckDB-oracle parity. */
  def sqlInList: String = words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** 100 TB variant: exploded tokens LEFT ANTI JOIN a broadcast deny-list
    * table. Equivalent result; use when the deny-list is itself big data. */
  def removeViaAntiJoin(tokens: org.apache.spark.sql.DataFrame, wordCol: String): org.apache.spark.sql.DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val stop = words.toDF(wordCol)
    tokens.join(broadcast(stop), Seq(wordCol), "left_anti")
  }
}
