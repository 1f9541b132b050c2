package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The RefinedWeb preset end-to-end on a fixture where EVERY stage bites —
  * including the round's headline composition: an NFD-encoded duplicate
  * that escapes exact AND near dedup on raw bytes and collapses only
  * because NFC normalization runs ahead of the dedup keys. */
class RefinedWebPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val th = graft.text.GopherRules.Thresholds(minWords = 5L, minStopHits = 1L)
  private val composed = "the café menu lists nine warm drinks daily"
  private val decomposed =
    java.text.Normalizer.normalize(composed, java.text.Normalizer.Form.NFD)

  private def docs = Seq(
    (1L, composed, "https://a.site.com/1"),
    (2L, decomposed, "https://b.site.com/2"),             // NFC twin of 1
    (3L, "the blocked page content stays readable here", "https://x.foo.co.uk/3"),
    (4L, "der die das und ist nicht ein mit gut", "https://a.site.com/4"),
    (5L, "the end", "https://a.site.com/5"),              // < minWords
    (6L, "the spam spam spam spam spam spam spam spam spam spam",
      "https://a.site.com/6"),                            // repetition gate
    (7L, "the quick brown fox jumps over the lazy dog today", "https://a.site.com/7"),
    (8L, "the quick brown fox jumps over the lazy dog today", "https://b.site.com/8"),
    (9L, "the quick brown fox jumps over the lazy dog today extra", "https://a.site.com/9"),
    (10L, "the first capped domain doc reads fine", "https://x.otherdom.org/10"),
    (11L, "the second capped domain doc looks good", "https://x.otherdom.org/11"),
    (12L, "the third capped domain doc waits long", "https://y.otherdom.org/12")
  ).toDF("doc_id", "text", "url")

  test("every stage cuts its planted doc; NFC twin collapses; caps bind") {
    val out = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 7L, 10L, 11L),
      s"kept ${out.keySet.toSeq.sorted}")
    assert(out(1L) == "site.com" && out(10L) == "otherdom.org")
  }

  test("the NFD twin escapes both dedups on RAW bytes — NFC placement is load-bearing") {
    // exact: byte-different hashes
    assert(graft.dedup.Dedup.exact(
      Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text"),
      "text", "doc_id").count() == 2)
    // near-dup: the accented token differs -> J = 7/9 < 0.9
    val a = composed.toLowerCase.split("\\s+").distinct.toSet
    val b = decomposed.toLowerCase.split("\\s+").distinct.toSet
    val j = a.intersect(b).size.toDouble / a.union(b).size
    assert(j < 0.9, s"raw jaccard $j")
  }

  test("soft URL word-score gate cuts the spam URL at stage 1 (r10)") {
    // doc 1's twin at a spam URL: without spamWeights it survives as a
    // distinct domain; with them it is cut BEFORE any text stage (the
    // cheap-gate-first discipline — nothing about its text changed).
    val spam = docs.unionByName(Seq(
      (13L, "the casino page text itself reads perfectly fine here",
        "https://win.spamdom.net/casino-bonus")).toDF("doc_id", "text", "url"))
    val without = RefinedWebPipeline(spam, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2).select("doc_id").as[Long].collect().toSet
    assert(without.contains(13L), s"fixture drifted: $without")
    val withGate = RefinedWebPipeline(spam, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2,
      spamWeights = graft.ingest.Urls.SpamWords)
      .select("doc_id").as[Long].collect().toSet
    assert(withGate == without - 13L, s"gate must cut exactly doc 13: $withGate")
    val f = RefinedWebPipeline.funnel(spam, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2, spamWeights = graft.ingest.Urls.SpamWords)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("url_blocklist") == f("raw") - 2L,
      s"stage 1 must count the blocked-domain doc (3) AND the spam URL (13): $f")
  }

  test("encoding repair rejoins a mojibake twin ahead of the dedup keys (r10)") {
    // Doc 1's UTF-8-as-cp1252 corrupted twin at another domain: on raw
    // bytes it escapes exact dedup (different hashes) AND near dedup
    // (the corrupted token breaks Jaccard) — the same escape route the
    // NFD twin used, one layer lower. With repairEncoding the repair
    // runs BEFORE NFC, so the twin collapses in exact dedup.
    val corrupted = composed.replace("café", "caf" + graft.text.Encoding.moj("é"))
    assert(corrupted != composed && corrupted.contains("Ã©"))
    // its own domain, so the caps stage can't be the thing that cuts it
    val withTwin = docs.unionByName(Seq(
      (13L, corrupted, "https://t.fresh.org/13")).toDF("doc_id", "text", "url"))
    val off = RefinedWebPipeline(withTwin, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2).select("doc_id").as[Long].collect().toSet
    assert(off.contains(13L), s"un-repaired twin must survive as distinct: $off")
    val on = RefinedWebPipeline(withTwin, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2, repairEncoding = true)
      .select("doc_id").as[Long].collect().toSet
    assert(on == off - 13L, s"repair must collapse exactly the twin: $on")
  }

  test("output is invariant to the stage materializer (r10)") {
    // The default localCheckpoint(true) is single-JVM-correct but
    // fault-intolerant on a cluster (executor loss kills the lineage);
    // deployments pass persist(DISK_ONLY) instead. The materializer must
    // never change WHAT is computed — only where the frame lives.
    val persisted = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]
    val diskMat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
      df =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count() // eager, like the default — the funnel observations need it
        persisted += p
        p
    }
    try {
      val a = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2).collect().toSeq
      val b = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2, materialize = diskMat).collect().toSeq
      assert(a == b, "materializer changed the output")
      val fa = RefinedWebPipeline.funnel(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2).collect().toSeq
      val fb = RefinedWebPipeline.funnel(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2, materialize = diskMat).collect().toSeq
      assert(fa == fb, "materializer changed the funnel")
    } finally persisted.foreach(_.unpersist())
  }

  test("the F134 valve rides the preset and never binds at fixture scale (r13)") {
    // The production entry point now defaults maxBucket = 4096 — the
    // degenerate-corpus safeguard the m100 audit proved out. At any
    // driver fixture scale no band bucket approaches the cap, so the
    // default-capped preset must be BIT-identical to the uncapped one
    // (which is what keeps the exact-CC oracle valid for the preset
    // queries after the r13 plumbing).
    val capped = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2).collect().toSeq
    val uncapped = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2, maxBucket = Int.MaxValue).collect().toSeq
    assert(capped == uncapped, "default valve must not bind at fixture scale")
  }

  test("funnel counts the planted cuts stage by stage") {
    val f = RefinedWebPipeline.funnel(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("raw") == 12L)
    assert(f("url_blocklist") == 11L)   // -3 (blocked eTLD+1, subdomain)
    assert(f("language") == 10L)        // -4 (German)
    assert(f("gopher_gates") == 8L)     // -5 (short), -6 (repetition)
    assert(f("exact_dedup") == 6L)      // -2 (NFC twin), -8 (exact copy)
    assert(f("near_dedup") == 5L)       // -9 (J = 0.9 near-dup of 7)
    assert(f("domain_caps") == 4L)      // -12 (third doc of otherdom.org)
  }

  test("outcomes attribute every planted cut to its stage; kept == pipeline (r10)") {
    val o = RefinedWebPipeline.outcomes(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(o == Map(
      1L -> "kept", 2L -> "exact_dedup", 3L -> "url_blocklist",
      4L -> "language", 5L -> "gopher_rules", 6L -> "gopher_repetition",
      7L -> "kept", 8L -> "exact_dedup", 9L -> "near_dedup",
      10L -> "kept", 11L -> "kept", 12L -> "domain_caps"), o.toString)
    // kept ids == the shipped pipeline's ids (shared stage frames)
    val kept = RefinedWebPipeline(docs, blocked = Seq("foo.co.uk"),
      gopherTh = th, cap = 2).collect().map(_.getLong(0)).toSet
    assert(o.filter(_._2 == "kept").keySet == kept)
    // grouped outcomes reconcile to the funnel's stage deltas
    val f = RefinedWebPipeline.funnel(docs, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val byOutcome = o.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(byOutcome("url_blocklist") == f("raw") - f("url_blocklist"))
    assert(byOutcome("language") == f("url_blocklist") - f("language"))
    assert(byOutcome("gopher_rules") + byOutcome("gopher_repetition")
      == f("language") - f("gopher_gates"))
    assert(byOutcome("exact_dedup") == f("gopher_gates") - f("exact_dedup"))
    assert(byOutcome("near_dedup") == f("exact_dedup") - f("near_dedup"))
    assert(byOutcome("domain_caps") == f("near_dedup") - f("domain_caps"))
    assert(byOutcome("kept") == f("domain_caps"))
  }

  test("outcomes: null text attributes to the language gate, not dedup (r10)") {
    // langId(NULL) === lang is NULL; the pipeline's filter drops the doc
    // there, so the attribution must say 'language' (a bare when(!NULL)
    // would fall through to a wrong 'exact_dedup').
    val withNull = docs.unionByName(
      Seq((13L, null.asInstanceOf[String], "https://a.site.com/13"))
        .toDF("doc_id", "text", "url"))
    val o = RefinedWebPipeline.outcomes(withNull, blocked = Seq("foo.co.uk"),
        gopherTh = th, cap = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(o(13L) == "language", o.toString)
    assert(o.filter(_._2 == "kept").keySet == Set(1L, 7L, 10L, 11L))
  }
}
