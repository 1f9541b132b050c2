package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing: window-min selection, the containment guarantee MinHash
  * lacks, and the boilerplate-bucket cap. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("winnowMins selects distinct window minima (hand-checked)") {
    val df = Seq(Tuple1(Seq(9L, 3L, 7L, 5L, 8L, 2L, 6L))).toDF("hs")
    val got = df.select(org.apache.spark.sql.graft.ArrayFunctions
      .winnowMins($"hs", 3)).as[Seq[Long]].head()
    // windows of 3: [9,3,7]->3 [3,7,5]->3 [7,5,8]->5 [5,8,2]->2 [8,2,6]->2
    assert(got.toSet == Set(3L, 5L, 2L))
  }

  test("winnowMins: short arrays use one full-array window; empty -> empty") {
    val df = Seq(Tuple1(Seq(4L, 1L)), Tuple1(Seq.empty[Long])).toDF("hs")
    val got = df.select(org.apache.spark.sql.graft.ArrayFunctions
      .winnowMins($"hs", 5)).as[Seq[Long]].collect()
    assert(got(0) == Seq(1L) && got(1).isEmpty)
  }

  test("containment: a doc pasted into a larger doc is detected; MinHash-style whole-set Jaccard would miss it") {
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val fillerB = (1 to 100).map(i => s"b$i").mkString(" ")
    val fillerC = (1 to 100).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, small),                      // the contained doc
      (2L, s"$fillerB $small"),         // contains doc 1 verbatim
      (3L, fillerC)                     // unrelated
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlaps(docs, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((1L, 2L)), s"containment missed: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // whole-set Jaccard of (1, 2) is tiny — the signal winnowing adds
    val j = docs.filter($"doc_id" =!= 3L)
      .select(Dedup.tokenSet($"text").as("t"))
      .collect().map(_.getSeq[String](0).toSet)
    val jac = j(0).intersect(j(1)).size.toDouble / j(0).union(j(1)).size
    assert(jac < 0.2, s"fixture not containment-shaped: jaccard $jac")
  }

  test("degenerate boilerplate fingerprints are capped out of pair generation") {
    // 80 docs sharing one boilerplate phrase: the shared fingerprint's
    // bucket exceeds maxBucket=8 and generates NO pairs.
    val docs = (1 to 80).map(i =>
      (i.toLong, s"shared boiler plate phrase here u$i v$i w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val pairs = Winnow.overlaps(docs, "doc_id", "text", minShared = 1L, maxBucket = 8)
    assert(pairs.count() == 0)
  }
}
