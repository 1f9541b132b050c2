package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Winnowing-based partial-overlap detection — the CONTAINMENT
  * complement to whole-document MinHash: a document pasted inside a much
  * larger one barely moves whole-set Jaccard (MinHash misses it) but any
  * shared run of ≥ `window + n − 1` tokens is GUARANTEED to share a
  * winnowed fingerprint ([[org.apache.spark.sql.graft.WinnowMins]]).
  *
  * Pipeline: per doc, hash the n-gram shingle stream → select the
  * window-min fingerprints (one native pass) → explode → group by
  * fingerprint (singleton fingerprints drop — the common case) → generate
  * doc pairs per bucket (the same typed-flatMap generator discipline as
  * the MinHash/SimHash paths: tiny buckets, plain JVM pair loop, a pair
  * surfaces once per bucket) → count shared fingerprints per pair →
  * threshold.
  *
  * At 100 TB: fingerprint density is ~2/(window+1) of the shingle stream,
  * the bucket exchange carries (fp, doc_id) only, and `maxBucket` guards
  * against degenerate fingerprints (boilerplate shared by thousands of
  * docs — those pairs belong to [[graft.text.TextAnalysis.frequentShingles]]
  * removal, not pairwise comparison; dropped buckets are the standard
  * winnowing practice and only lose already-boilerplate matches).
  *
  * Fingerprints are the md5-prefix hash (first 15 hex digits → a 60-bit
  * non-negative long — the repo's engine-reproducible primitive widened
  * past the bucket modulus), so winnowing replays relationally and the
  * `winnow_overlaps` query carries a FULL oracle: the window-min SET is
  * tie-rule-independent, and DuckDB computes the same sliding minima
  * with `list_min(list_slice(...))`. WinnowSpec pins the containment
  * guarantee and the boilerplate-bucket cap.
  */
object Winnow {

  /** Distinct winnowed fingerprints of the lowercased n-gram stream. */
  def fingerprints(text: org.apache.spark.sql.Column, n: Int, window: Int) =
    org.apache.spark.sql.graft.ArrayFunctions.winnowMins(
      transform(graft.text.TextAnalysis.shingles(text, n),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")),
      window)

  /** Pairs of documents sharing ≥ `minShared` winnowed fingerprints:
    * (id_a, id_b, n_shared), id_a < id_b, ordered. */
  def overlaps(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 3, window: Int = 4, minShared: Long = 3L,
               maxBucket: Int = 64): DataFrame = {
    val spark0 = docs.sparkSession
    import spark0.implicits._
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(fingerprints(col(textCol), n, window)).as("fp"))
      .groupBy(col("fp"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(col("ids"))
      .as[Seq[Long]]
      .flatMap { ids =>
        val arr = ids.sorted.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var i = 0
        while (i < arr.length) {
          var j = i + 1
          while (j < arr.length) {
            if (arr(i) != arr(j)) out += ((arr(i), arr(j)))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("id_a", "id_b")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
  }
}
