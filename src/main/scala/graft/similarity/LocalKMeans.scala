package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Similarity.asDouble

/** Seeded in-memory k-means over a bounded distributed sample — the shared
  * quantizer-fit discipline of [[Ivf]] and [[Pq]] (the FAISS approach:
  * coarse/product quantizers are trained on a subset that fits in memory,
  * never on the full corpus).
  *
  * Why not Spark-ML `KMeans.fit`: each fit costs multi-second scheduler /
  * pipeline-init overhead INDEPENDENT of data size (measured ~3-5 s for a
  * 16-centroid fit over 50 k vectors at local[32]; 25 s for PQ's m=8
  * per-subspace fits over 500 vectors). With the sample bounded at
  * `maxFitRows` anyway, a driver-side Lloyd loop over the collected sample
  * is strictly less work than one distributed iteration's overhead — and
  * deterministic across partitionings, which Spark-ML's distributed
  * aggregation order is not (float sums). At 100 TB the shape is unchanged:
  * exactly one Spark job (sample + collect of ≤ maxFitRows rows), then
  * milliseconds of local math.
  */
private[similarity] object LocalKMeans {

  /** Sample ~maxFitRows vectors of `vecCol` to the driver (one job).
    *
    * Bernoulli `df.sample` bounds the count in EXPECTATION only — the
    * collected sample can overshoot by a few percent — so the hard
    * driver-memory bound is enforced after the collect: the array is
    * truncated to maxFitRows rows (round-4 advice). Truncation order is
    * the collect order (partition order), which is stable for a fixed
    * input/partitioning, so fits stay deterministic run-to-run. */
  def sampleRows(candidates: DataFrame, vecCol: String, maxFitRows: Long,
                 seed: Long): Array[Array[Double]] = {
    val vecs = candidates.select(asDouble(col(vecCol)).as("arr"))
    val total = vecs.count()
    val sampled =
      if (total > maxFitRows) vecs.sample(withReplacement = false,
        fraction = maxFitRows.toDouble / total, seed = seed)
      else vecs
    sampled.collect()
      .take(math.min(maxFitRows, Int.MaxValue.toLong).toInt)
      .map(_.getSeq[Double](0).toArray)
  }

  /** Seeded Lloyd's k-means on in-memory rows: deterministic shuffled
    * init, empty clusters keep their previous center. */
  def lloyd(rows: Array[Array[Double]], k: Int, maxIter: Int,
            seed: Long): Array[Array[Double]] = {
    require(rows.nonEmpty, "cannot fit k-means on an empty sample")
    val n = rows.length
    val d = rows.head.length
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle((0 until n).toVector).take(math.min(k, n))
      .map(i => rows(i).clone).toArray.padTo(k, rows(0).clone)
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val r = rows(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0
          var t = 0
          while (t < d) { val x = r(t) - centers(c)(t); d2 += x * x; t += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        var t = 0
        while (t < d) { sums(best)(t) += r(t); t += 1 }
        counts(best) += 1
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var t = 0
          while (t < d) { centers(c)(t) = sums(c)(t) / counts(c); t += 1 }
        }
        c += 1
      }
      iter += 1
    }
    centers
  }
}
