package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CharEntropy

/** Pins the integer micro-nat character entropy: hand-traced values,
  * the codepoint (not UTF-16) domain, degenerate inputs, and
  * codegen/interpreted agreement. */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def entropy(s: String): Long =
    CharEntropy.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("hand-traced values") {
    // "aab": n=3, a:2 b:1 -> (3*ln3 - 2*ln2)/3 in floored micro-nats
    // ln3*1e6 floors to 1098612, ln2*1e6 to 693147
    assert(entropy("aab") == (3L * 1098612L - 2L * 693147L) / 3L)
    assert(entropy("aab") == 636514L)
    // uniform 4-char alphabet: exactly floor(ln 4 * 1e6)
    assert(entropy("abcd") == 1386294L)
    // one repeated glyph (the spam signal): exactly 0
    assert(entropy("aaaaaaaaaa") == 0L)
    assert(entropy("a") == 0L)
    assert(entropy("") == 0L)
  }

  test("codepoint domain: surrogate pairs count once") {
    // two identical supplementary chars = one class, entropy 0
    assert(entropy("𠀀𠀀") == 0L)
    // 'a' + U+20000 = two equiprobable classes = floor(ln2 * 1e6)
    assert(entropy("a𠀀") == 693147L)
    // UTF-16 units would have seen 3 chars with counts (1,1,1) here
  }

  test("monotone: more balanced = higher, subset alphabet = lower") {
    assert(entropy("aabb") > entropy("aaab"))
    assert(entropy("abc") > entropy("ab"))
  }

  test("column form is total and agrees across codegen modes") {
    val df = Seq(
      Some("aab"), Some("abcd"), Some(""), None,
      Some("привет мир"), Some("𠀀 mixed 😀")
    ).toDF("text")
    def run(): Seq[Option[Long]] = df.select(
      org.apache.spark.sql.graft.ArrayFunctions.charEntropy(col("text")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val codegen = run()
    assert(codegen(0).contains(636514L) && codegen(1).contains(1386294L))
    assert(codegen(2).contains(0L) && codegen(3).isEmpty)
    val before = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() == codegen)
    } finally {
      before.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
