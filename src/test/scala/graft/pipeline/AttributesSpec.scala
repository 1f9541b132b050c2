package graft.pipeline

import graft.SparkSpec
import graft.text.{GopherRules, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the one-pass attribute sidecar: every column equals the
  * standalone tagger it mirrors, and the policy composition equals the
  * manual filter. */
class AttributesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat and the dog sat on the mat in the sun and it was warm " +
      "that day for all of them", "s1"),
    (2L, "der hund und die katze das ist nicht ein mit", "s1"),
    (3L, "привет мир сегодня хорошо да", "s2"),
    (4L, "buy viagra and casino stuff now please because the it is", "s2"),
    (5L, "tiny.", "s3")
  ).toDF("doc_id", "text", "source")

  test("sidecar columns equal the standalone taggers") {
    val sc = Attributes.sidecar(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val stats = TextAnalysis.stats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val script = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    val bad = C4Filters.badWords(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gopher = GopherRules.signals(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.length - 1)).toMap
    val entropy = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val flesch = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    (1L to 5L).foreach { id =>
      val row = sc(id)
      assert(row.getAs[Long]("n_tokens") == stats(id).getAs[Long]("n_tokens"), s"doc $id tokens")
      assert(row.getAs[String]("lang_pred") == stats(id).getAs[String]("lang_pred"), s"doc $id lang")
      assert(row.getAs[Double]("quality") == stats(id).getAs[Double]("quality"), s"doc $id quality")
      assert(row.getAs[String]("dominant_script") == script(id), s"doc $id script")
      assert(row.getAs[Long]("bad_hits") == bad(id), s"doc $id bad_hits")
      assert(row.getAs[Boolean]("gopher_pass") == gopher(id), s"doc $id gopher")
      assert(row.getAs[Long]("entropy_unats") == entropy(id), s"doc $id entropy")
      assert(row.getAs[Long]("flesch_micro") == flesch(id), s"doc $id flesch")
    }
    // the internal flesch signal columns never leak into the sidecar
    assert(!sc(1L).schema.fieldNames.exists(_.startsWith("__fl_")))
    // the fixture discriminates every column
    assert(sc.values.map(_.getAs[String]("lang_pred")).toSet.size >= 3)
    assert(sc.values.map(_.getAs[String]("dominant_script")).toSet == Set("latin", "cyrillic"))
    assert(sc(4L).getAs[Long]("bad_hits") == 2L)
  }

  test("applyPolicy equals the manual filter; doc columns survive") {
    val sc = Attributes.sidecar(docs)
    val policy = col("bad_hits") === 0 && col("n_tokens") >= 5L
    val kept = Attributes.applyPolicy(docs, sc, policy)
    val expected = sc.filter(policy).select($"doc_id").as[Long].collect().toSet
    assert(kept.select($"doc_id").as[Long].collect().toSet == expected)
    assert(expected.nonEmpty && !expected.contains(4L) && !expected.contains(5L))
    assert(kept.columns.toSeq == docs.columns.toSeq) // semi join keeps shape
  }
}
