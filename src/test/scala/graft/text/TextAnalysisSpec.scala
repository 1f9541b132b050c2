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

  test("sourceOverlapMatrix: counts shared distinct shingles once per pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "s1"),
      (2L, "the quick brown fox jumps", "s2"),   // mirror of s1
      (3L, "the quick brown fox jumps", "s2"),   // dup inside s2: no double count
      (4L, "entirely different words here now", "s3")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlapMatrix(docs, "source", "text", 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // s1/s2 share the 3 shingles of the sentence; s3 shares nothing
    assert(out == Map(("s1", "s2") -> 3L))
  }

  test("sourceOverlapSampled: estimates track exact overlap on a planted corpus") {
    // Plant two sources sharing many shingles and a third sharing few:
    // the scaled estimate must rank the pairs like the exact matrix and
    // stay within sampling error of the exact counts.
    def sentence(seed: Int) =
      (0 until 12).map(i => s"w${(seed * 31 + i * 7) % 400}").mkString(" ")
    val shared = (1 to 120).map(i => sentence(i))
    val docs = (
      shared.map(t => ("a", t)) ++ shared.map(t => ("b", t)) ++
        shared.take(10).map(t => ("c", t)) ++
        (1 to 60).map(i => ("c", sentence(10000 + i))) ++
        (1 to 30).map(i => ("a", sentence(20000 + i)))
      ).zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val exact = TextAnalysis.sourceOverlapMatrix(docs, "source", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = TextAnalysis.sourceOverlapSampled(docs, "source", "text", 3, 2000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // 20% sample of >1000 shared shingles: relative error well under 50%.
    val ab = ("a", "b")
    assert(math.abs(est(ab) - exact(ab)).toDouble / exact(ab) < 0.5)
    // Ranking preserved: the heavy pair estimates far above the light ones.
    assert(est(ab) > est.getOrElse(("a", "c"), 0L))
    assert(est(ab) > est.getOrElse(("b", "c"), 0L))
    // Sampled pair keys never invent overlap the exact matrix lacks.
    assert(est.keySet.subsetOf(exact.keySet))
  }

  test("distinctiveTerms: rare-source gate kills common phrases, ranks by tf") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", "s1"), // "alpha beta" x2
      (2L, "alpha beta delta", "s1"),
      (3L, "alpha beta nu nu", "s2"),
      (4L, "alpha beta xi", "s3")
    ).toDF("doc_id", "text", "source")
    // "alpha beta" appears in all 3 sources -> gated at maxSources=2;
    // per-source ranking is (tf desc, term asc).
    val out = TextAnalysis.distinctiveTerms(docs, "source", "text", 2, 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(!out.exists(_._3 == "alpha beta"))
    val s1 = out.filter(_._1 == "s1").sortBy(_._2)
    assert(s1.map(t => (t._3, t._4)).toSeq ==
      Seq(("beta alpha", 1L), ("beta delta", 1L), ("beta gamma", 1L)))
    assert(out.filter(_._1 == "s2").map(_._3).toSeq == Seq("beta nu", "nu nu"))
    // NULL source folds into 'Unknown' (matches source_distribution)
    val withNull = docs.unionByName(
      Seq((5L, "omicron pi", null.asInstanceOf[String])).toDF("doc_id", "text", "source"))
    val u = TextAnalysis.distinctiveTerms(withNull, "source", "text", 2, 2, 10)
      .filter($"source" === "Unknown").collect()
    assert(u.map(_.getString(2)).toSeq == Seq("omicron pi"))
  }

  test("ngramNovelty: common fraction, unique doc, short doc nulls") {
    // "the quick brown fox" contributes trigrams "the quick brown" and
    // "quick brown fox" to docs 1-3; doc 4 shares nothing; doc 5 is too
    // short for any trigram.
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox sleeps"),
      (3L, "see the quick brown fox"),
      (4L, "completely unrelated text here"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3, 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    // doc 1: 3 trigrams, 2 of them in >= 3 docs
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === 2L)
    assert(out(1L)._3 === math.rint(2.0 * 100 / 3 * 1e4) / 1e4)
    // doc 3: same two common trigrams out of 3
    assert(out(3L)._2 === 2L)
    // doc 4: nothing shared
    assert(out(4L) === ((2L, 0L, 0.0)))
    // doc 5: no trigrams -> null fraction, still present
    assert(out(5L)._1 === 0L)
    assert(out(5L)._3.isNaN)
  }

  test("tokenSpectrum: hand-computed count-of-counts") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenSpectrum(docs, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // a:2 b:2 c:1 -> one singleton type (mass 1), two doubleton types (mass 4)
    assert(out === Seq((1L, 1L, 1L), (2L, 2L, 4L)))
  }

  test("ngramNoveltyFromCounts over merged batch partials == full recompute") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val history = docs.filter($"doc_id" < 25)
    val batch = docs.filter($"doc_id" >= 25)
    val state = TextAnalysis.mergeShingleCounts(
      TextAnalysis.shingleDfCounts(history, "text", 3),
      TextAnalysis.shingleDfCounts(batch, "text", 3))
    val inc = TextAnalysis.ngramNoveltyFromCounts(batch, "doc_id", "text", 3, 3L, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val full = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3, 3L)
      .filter($"doc_id" >= 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc === full)
  }

  test("ngramNovelty counts a doc once per distinct shingle") {
    // doc 1 repeats its phrase: df must stay 2 (docs 1 and 2), not 3.
    val docs = Seq(
      (1L, "a b c x a b c"),   // trigram "a b c" twice in one doc
      (2L, "a b c y"),
      (3L, "p q r s")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // only "a b c" reaches df >= 2; docs 1 and 2 each count it once
    assert(out(1L) === 1L)
    assert(out(2L) === 1L)
    assert(out(3L) === 0L)
  }

  test("scriptMix: per-script counts, dominance, ties and none") {
    val docs = Seq(
      (1L, "hello world"),            // latin only
      (2L, "привет мир"),             // cyrillic only
      (3L, "hi привет"),              // tie 2-6 -> cyrillic dominates
      (4L, "你好"),                    // cjk
      (5L, "12345 !!"),               // no script chars at all
      (6L, "ab яб")                   // exact 2-2 tie -> latin (canonical order)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getString(7))).toMap
    assert(out(1L) == ((10L, 0L, 0L, "latin")))
    assert(out(2L) == ((0L, 9L, 0L, "cyrillic")))
    assert(out(3L) == ((2L, 6L, 0L, "cyrillic")))
    assert(out(4L) == ((0L, 0L, 2L, "cjk")))
    assert(out(5L) == ((0L, 0L, 0L, "none")))
    assert(out(6L) == ((2L, 2L, 0L, "latin")))
  }

  test("scriptMix beyond the BMP: supplementary CJK counts as cjk, emoji as emoji (r10)") {
    // 𠀀 (U+20000, Ext B) and 😀 (U+1F600) counted "none" in the r9 BMP
    // ranges; both are ONE codepoint per char in both engines' length().
    val docs = Seq(
      (1L, "𠀀𠀁"),     // two Ext-B ideographs
      (2L, "😀😀❤"), // two emoji + BMP heavy heart (U+2764)
      (3L, "ok 😀")                // latin 2 vs emoji 1 -> latin
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(6), r.getString(7))).toMap
    assert(out(1L) == ((0L, 2L, 0L, "cjk")), out(1L).toString)
    assert(out(2L) == ((0L, 0L, 3L, "emoji")), out(2L).toString)
    assert(out(3L) == ((2L, 0L, 1L, "latin")), out(3L).toString)
  }

  test("n-gram language ID separates real languages; trigram edges (r10)") {
    val train = Seq(
      (1L, "de", "der schnelle braune fuchs springt über den faulen hund und die katze"),
      (2L, "de", "ich möchte heute nicht zur schule gehen weil es regnet draußen"),
      (3L, "en", "the quick brown fox jumps over the lazy dog and the cat"),
      (4L, "en", "i would rather not go to school today because it is raining"),
      (5L, "fr", "le renard brun rapide saute par dessus le chien paresseux et le chat"),
      (6L, "fr", "je ne veux pas aller à l'école aujourd'hui parce qu'il pleut dehors")
    ).toDF("doc_id", "lang", "text")
    val prof = TextAnalysis.fitLangProfiles(train, k = 40)
    assert(prof.map(_._1) == Seq("de", "en", "fr"))
    // held-out sentences classify correctly when text actually differs
    val test_ = Seq(
      (10L, "de", "der hund springt über die katze und den fuchs"),
      (11L, "en", "the dog jumps over the cat and the fox"),
      (12L, "fr", "le chien saute par dessus le chat et le renard")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgram(test_, prof).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(out(10L) == (("de", true)))
    assert(out(11L) == (("en", true)))
    assert(out(12L) == (("fr", true)))
    // trigram edges: texts shorter than 3 chars yield no features -> und
    val short = Seq((20L, "en", "ab"), (21L, "en", "")).toDF("doc_id", "lang", "text")
    val preds = TextAnalysis.langIdNgram(short, prof).collect()
      .map(_.getString(2)).toSet
    assert(preds == Set("und"))
    // confusion over the training set is diagonal
    val conf = TextAnalysis.langIdConfusion(train, prof).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.keys.forall { case (a, b) => a == b }, conf.toString)
  }

  test("langScriptConsistency: transliteration and mislabel flag, abstentions pass (r10)") {
    val docs = Seq(
      (1L, "shi bu wo ni zai hen ma ba"),      // zh prediction, latin script
      (2L, "the and of занимает большое количество текста здесь"), // en, cyrillic mass
      (3L, "der und das ist nicht ein mit"),   // de, latin: consistent
      (4L, "這是一個測試文本"),                 // no markers: und, vacuous
      (5L, "")                                 // und + none
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langScriptConsistency(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toMap
    assert(out(1L) == (("zh", "latin", "cjk", false)))
    assert(out(2L) == (("en", "cyrillic", "latin", false)))
    assert(out(3L) == (("de", "latin", "latin", true)))
    assert(out(4L) == (("und", "cjk", "none", true)))
    assert(out(5L) == (("und", "none", "none", true)))
  }

  test("readability: hand-traced Flesch micro-points; empty text scores null (r10)") {
    // doc 1: "See the dog. It runs!" -> W=5, S=2 ('.'+'!'), vowel groups:
    // see(e..) lowercased: "see the dog. it runs!" -> ee, e, o, i, u = 5
    // flesch = 206835000 - 1015000*5/2 - 84600000*5/5
    //        = 206835000 - 2537500 - 84600000 = 119697500
    val docs = Seq(
      (1L, "See the dog. It runs!"),
      (2L, "word"), // no terminal punct -> S=1; 1 vowel group 'o'
      (3L, "")      // W=0 -> null score
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 2L &&
      out(1L).getLong(3) == 5L)
    assert(out(1L).getLong(4) == 206835000L - (1015000L * 5 / 2) -
      (84600000L * 5 / 5))
    assert(out(1L).getLong(4) == 119697500L)
    // one word, one implicit sentence: 206835000 - 1015000 - 84600000
    assert(out(2L).getLong(4) == 121220000L)
    assert(out(3L).isNullAt(4))
    // monotonicity sanity: longer sentences + more syllables read harder
    val hard = TextAnalysis.readability(Seq(
      (1L, "Incomprehensibility characterizes multisyllabic terminological obfuscation")
    ).toDF("doc_id", "text")).collect().head.getLong(4)
    assert(hard < out(1L).getLong(4))
  }
}
