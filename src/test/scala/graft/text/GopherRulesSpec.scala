package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins the Gopher rule signals: hand-computed values on a tiny doc, one
  * planted failure per rule, the four-dot and empty-string edges, and
  * the gate's keep-set. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Row =
    GopherRules.signals(Seq((1L, text)).toDF("doc_id", "text")).head()

  test("hand-computed signals on a tiny doc") {
    // "the cat... sat\n- on #mats" : tokens = [the, cat..., sat, -, on, #mats]
    val r = sig("the cat... sat\n- on #mats")
    assert(r.getLong(1) == 6)                       // n_words
    // non-ws chars = 20, round(20/6, 4)
    assert(r.getDouble(2) == 3.3333)                // mean_word_len
    // words with alpha: all but "-" -> 5/6
    assert(r.getDouble(3) == 0.8333)                // frac_alpha_words
    // one '#' + one '...' over 6 words
    assert(r.getDouble(4) == 0.3333)                // symbol_ratio
    // line 2 of 2 starts with '- '
    assert(r.getDouble(5) == 0.5)                   // frac_bullet_lines
    // no line ENDS in ... ("sat" follows on line 1)
    assert(r.getDouble(6) == 0.0)                   // frac_ellipsis_lines
    // required words present: the, on is not in the list -> just "the"
    assert(r.getLong(7) == 1)                       // stop_hits
    assert(!r.getBoolean(8))                        // pass
  }

  test("each planted fixture doc fails exactly its rule; prose passes") {
    val docs = graft.GopherFixture.docs.toDF("doc_id", "text")
    val out = GopherRules.signals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8))                   // prose passes
    assert(out(2L).getDouble(5) >= 0.9)             // bullet wall
    assert(!out(2L).getBoolean(8))
    assert(out(3L).getDouble(6) >= 0.3)             // ellipsis wall
    assert(out(4L).getDouble(4) >= 0.1)             // symbol spam
    assert(out(5L).getLong(1) < 50)                 // too short
    assert(out(6L).getDouble(2) > 10.0)             // over-long tokens
    assert(out(7L).getDouble(3) <= 0.8)             // digit spam
    // four dots count as ONE '...' occurrence (leftmost non-overlap)
    val d8 = out(8L)
    assert(d8.getDouble(4) == 0.1)                  // 1 / 10 words
    // empty text: zero words, NULL ratios, pass = false (not null)
    val d9 = out(9L)
    assert(d9.getLong(1) == 0 && d9.isNullAt(2) && !d9.getBoolean(8))
  }

  test("gate keeps exactly the passing documents with original columns") {
    val docs = graft.GopherFixture.docs.toDF("doc_id", "text")
    val kept = GopherRules.gate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    assert(GopherRules.gate(docs).columns.toSeq == Seq("doc_id", "text"))
  }
}
