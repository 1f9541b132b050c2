package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayFunctions

/** Pins the NFC normalization stage: canonical output, idempotence, and
  * the dedup catch it exists for — an NFD/NFC duplicate pair that exact
  * dedup misses on raw text and finds post-normalization. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café Ångström"
  private val decomposed =
    java.text.Normalizer.normalize(composed, java.text.Normalizer.Form.NFD)

  private def nfc(ss: String*): Seq[String] =
    ss.toDF("t").select(ArrayFunctions.nfcNormalize(col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("NFD input composes to the NFC form; NFC and ASCII are fixpoints") {
    assert(decomposed != composed) // the fixture really is decomposed
    assert(nfc(decomposed) == Seq(composed))
    assert(nfc(composed) == Seq(composed))
    assert(nfc("plain ascii text") == Seq("plain ascii text"))
  }

  test("normalization is idempotent and null-safe") {
    val once = nfc(decomposed, composed, "x")
    assert(nfc(once: _*) == once)
    val withNull = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(ArrayFunctions.nfcNormalize(col("t"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("exact dedup misses the NFD/NFC pair raw and catches it normalized") {
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val raw = graft.dedup.Dedup.exact(docs, "text", "doc_id").collect()
    assert(raw.length == 2) // visually identical, byte-different: missed
    val normed = graft.dedup.Dedup.exact(
      docs.withColumn("text", ArrayFunctions.nfcNormalize(col("text"))),
      "text", "doc_id").collect()
    assert(normed.length == 1 && normed.head.getLong(0) == 1L &&
      normed.head.getLong(1) == 2L) // one keeper, both copies found
  }

  test("interpreted eval matches codegen output") {
    val df = Seq(decomposed, composed, "ascii").toDF("t")
    val viaExpr = df.select(ArrayFunctions.nfcNormalize(col("t"))).collect().map(_.getString(0))
    val viaEval = Seq(decomposed, composed, "ascii").map(s =>
      org.apache.spark.sql.graft.NfcNormalize
        .normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaExpr.toSeq == viaEval)
  }
}
