package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mojibake repair + encoding-damage profiling: table integrity, repair
  * behavior, the one-round-per-pass contract, and the hygiene counters. */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("repair table is generated, ASCII-free, and encodes its own targets") {
    assert(Encoding.MojibakePairs.nonEmpty)
    Encoding.MojibakePairs.foreach { case (bad, good) =>
      // the table IS the cp1252 mis-decode of the target, not a hand copy
      assert(new String(good.getBytes("UTF-8"), "windows-1252") == bad)
      // ASCII-free corrupted forms are what make literal replace safe
      assert(bad.forall(_ > 0x7f), s"ASCII leaked into '$bad'")
      assert(bad.length > good.length)
    }
    // longest corrupted forms first: a 2-char pair must never run before
    // a 3-char pair (prefix capture would corrupt punctuation repairs)
    val lens = Encoding.MojibakePairs.map(_._1.length)
    assert(lens == lens.sortBy(-_))
  }

  test("fixMojibake repairs single-encoded text; clean text is untouched") {
    import Encoding.moj
    val corrupted = s"Caf${moj("é")} don${moj("’")}t ${moj("€")}5 ${moj("“")}ok${moj("‘")}"
    val d = Seq((1L, corrupted), (2L, "café already clean — naïve")).toDF("doc_id", "text")
    val out = Encoding.repair(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1 == "Café don’t €5 “ok‘")
    // five repairs: a 2-char form recovers 1 codepoint, 3-char forms 2
    assert(out(1L)._2 == 1L + 2L * 4L)
    assert(out(1L)._3)
    assert(out(2L) == (("café already clean — naïve", 0L, false)))
  }

  test("one repair round per pass: a crafted second-round form needs two passes") {
    // "Ã" + moj("«") repairs to "Ã«" in pass one (the « pair fires), which
    // is itself the corrupted form of "ë" — pass two finishes the job.
    // This pins the documented single-pass semantics rather than hiding it.
    import Encoding.moj
    val d = Seq((1L, "Ã" + moj("«"))).toDF("doc_id", "text")
    val once = Encoding.repair(d, "doc_id", "text").head().getString(1)
    assert(once == "Ã«")
    val twice = Encoding.repair(Seq((1L, once)).toDF("doc_id", "text"),
      "doc_id", "text").head().getString(1)
    assert(twice == "ë")
  }

  test("hygiene counts each damage class; tab/newline are not controls") {
    import Encoding.moj
    val d = Seq(
      (1L, "ok plain text"),
      (2L, "b�d byt�s"),
      (3L, "a\u0001b\tc\nd"),
      (4L, s"caf${moj("é")} here"),
      (5L, "naïve résumé")).toDF("doc_id", "text")
    val out = Encoding.hygiene(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 0L, false)))
    assert(out(2L) == ((2L, 0L, 0L, 2L, true)))   // U+FFFD is also non-ASCII
    assert(out(3L) == ((0L, 1L, 0L, 1L, true)))   // \t and \n don't count
    assert(out(4L)._3 == 1L && out(4L)._5)        // the Ã marker
    assert(out(5L) == ((0L, 0L, 0L, 3L, false)))  // non-ASCII alone is no flag
  }
}
