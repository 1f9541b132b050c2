package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the JSONL reader/writer: render∘parse identity over
  * escape-hostile content, the PERMISSIVE malformed-line posture, and
  * renderer determinism. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def nasty = Seq(
    (1L, "s1", "en", "plain text"),
    (2L, "s\"quoted\"", "en", "he said \"hi\""),
    (3L, "s1", "fr", "back\\slash and \\n literal"),
    (4L, "s2", "de", "line\nbreak\r\nand\ttab"),
    (5L, "s2", "zh", "unicode 你好 𠀀 émoji 😀"),
    (6L, "s3", "en", "{\"json\": [\"inside\"]}")
  ).toDF("doc_id", "source", "lang", "text")

  test("render then parse is the identity on escape-hostile rows") {
    val back = Jsonl.parse(Jsonl.render(nasty)).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(back == nasty.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("rendered lines are single lines (JSONL contract) and deterministic") {
    val lines = Jsonl.render(nasty).as[String].collect()
    assert(lines.forall(l => !l.contains("\n") && !l.contains("\r")))
    assert(lines.toSeq == Jsonl.render(nasty).as[String].collect().toSeq)
    // spot-check the escape bytes of the newline row
    val l4 = Jsonl.render(nasty.filter($"doc_id" === 4L)).as[String].head()
    assert(l4.contains("line\\nbreak\\r\\nand\\ttab"))
  }

  test("null fields null the whole rendered line (decide upstream, not silently)") {
    val withNull = Seq((1L, "s1", null.asInstanceOf[String], "ok"))
      .toDF("doc_id", "source", "lang", "text")
    val lines = Jsonl.render(withNull).collect()
    assert(lines.length == 1 && lines.head.isNullAt(0))
  }

  test("malformed lines parse to all-null rows, never kill the read") {
    val mixed = Seq(
      "{\"doc_id\": 7, \"source\": \"s\", \"lang\": \"en\", \"text\": \"ok\"}",
      "not json at all",
      "{\"doc_id\": oops").toDF("line")
    val out = Jsonl.parse(mixed).collect()
    assert(out.length == 3)
    assert(out.count(r => !r.isNullAt(0)) == 1)
    assert(out.filter(r => !r.isNullAt(0)).head.getString(3) == "ok")
  }
}
