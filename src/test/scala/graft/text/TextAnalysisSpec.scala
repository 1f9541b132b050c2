package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins text-stats semantics (token counts, ratios, quality, lang-ID) and
  * the fingerprint contract (xxhash64 stability, min-shingle winnowing,
  * short-document null). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and bpeish counts") {
    val out = Seq("ab c1 -d").toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("nt"),
      TextAnalysis.bpeishCount(col("text")).as("nb")).head()
    assert(out.getLong(0) == 3)       // "ab","c1","-d"
    assert(out.getLong(1) == 5)       // ab | c | 1 | - | d
  }

  test("ratios and quality handle empty text as null, not NaN") {
    val out = Seq("").toDF("text").select(
      TextAnalysis.alphaRatioRaw(col("text")).as("a"),
      TextAnalysis.meanTokenLenRaw(col("text")).as("m"),
      TextAnalysis.qualityScore(col("text")).as("q")).head()
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2))
  }

  test("langId picks the dominant marker profile, 'und' when none hit") {
    val rows = Seq(
      ("the cat and the dog is here", "en"),
      ("le chat et la maison dans les rues", "fr"),
      ("der hund und die katze ist nicht hier", "de"),
      ("xyzzy qwerty 12345", "und"))
      .toDF("text", "expected")
    val got = rows.select(TextAnalysis.langId(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("shingles: 3-grams in order; short docs give empty array") {
    val s = Seq("a b c d").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(s == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("fingerprints are deterministic and min_shingle is null for short docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(df).collect()
    assert(out(0).getLong(1) == out(1).getLong(1))            // same text → same fp64
    assert(out(0).getLong(2) == out(1).getLong(2))            // and same min shingle
    assert(out(2).isNullAt(2))                                // < 3 tokens → null
  }
}
