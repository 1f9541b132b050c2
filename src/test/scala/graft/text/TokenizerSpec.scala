package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the reference tokenizer semantics (`app.py:31`,
  * `re.findall(r'\b[a-zA-Z]+\b', text.lower())`): maximal ASCII-letter
  * runs, everything else a separator. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("t").select(Tokenizer.tokens(col("t"))).as[Seq[String]].head()

  test("lowercases and splits on non-letters") {
    assert(tok("Hello, World!") == Seq("hello", "world"))
  }

  test("apostrophes split words (don't -> don, t)") {
    assert(tok("Don't stop") == Seq("don", "t", "stop"))
  }

  test("digits and underscores are separators") {
    assert(tok("abc123def x_y 42") == Seq("abc", "def", "x", "y"))
  }

  test("non-ASCII letters are separators (café -> caf)") {
    assert(tok("café über") == Seq("caf", "ber"))
  }

  test("empty and null text yield no tokens") {
    assert(tok("") == Seq.empty)
    assert(tok("  \n\t ") == Seq.empty)
    val fromNull = Seq((1, null: String)).toDF("id", "t")
    assert(Tokenizer.explodeTokens(fromNull, "t").count() == 0)
  }
}
