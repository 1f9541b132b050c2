package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: code shape/compression contract, ADC recall vs
  * exact L2 on a clustered corpus, determinism. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 120 vectors in 3 tight 8-dim clusters (+ small deterministic jitter):
  // PQ codebooks must separate the clusters, so true neighbors (same
  // cluster) dominate ADC top-k.
  private def corpus = {
    val rows = (0 until 120).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 5.0f else 0.0f)
      val jit = Array.tabulate(8)(d => ((i * 31 + d * 7) % 10) / 20.0f)
      (i.toLong, base.zip(jit).map { case (b, j) => b + j })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes: m entries, each within [0, ksub)") {
    val books = Pq.fitCodebooks(corpus, m = 4, ksub = 8)
    assert(books.length == 4 && books.forall(_.length == 8) &&
      books.forall(_.forall(_.length == 2))) // 8 dims / 4 subspaces
    val enc = Pq.encode(corpus, books)
    val codes = enc.select($"codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 8)))
  }

  test("ADC top-k recalls exact L2 neighbors on clustered data") {
    val probes = corpus.filter($"vec_id" % 40 === 0) // 3 probes, one per cluster
    val approx = Pq.knnPq(corpus, probes, k = 10, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 top-10 per probe
    val v = corpus.select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    val exact = v.as("p").join(v.as("c"), col("p.vec_id") =!= col("c.vec_id"))
      .filter(col("p.vec_id") % 40 === 0)
      .select(col("p.vec_id").as("pid"), col("c.vec_id").as("cid"),
        aggregate(zip_with(col("p.v"), col("c.v"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (s, x) => s + x).as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"pid")
          .orderBy($"d2".asc, $"cid".asc)))
      .filter($"rk" <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { pid =>
      (approx(pid) intersect exact(pid)).size.toDouble / exact(pid).size
    }
    assert(recalls.nonEmpty && recalls.sum / recalls.size >= 0.6,
      s"mean recall ${recalls.sum / recalls.size}")
  }

  test("IVF-PQ: equi-join on list, results are a high-recall subset path") {
    val probes = corpus.filter($"vec_id" % 40 === 0)
    val full = Pq.knnPq(corpus, probes, k = 10, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pruned = Pq.knnIvfPq(corpus, probes, k = 10,
        nlist = 6, nprobe = 3, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // list pruning can only drop candidates; on 3 tight clusters with
    // nprobe=3 the own-cluster neighbors survive, so overlap stays high
    val overlaps = full.keys.toSeq.map { pid =>
      (pruned.getOrElse(pid, Set.empty) intersect full(pid)).size.toDouble / full(pid).size
    }
    assert(overlaps.sum / overlaps.size >= 0.5,
      s"mean ivfpq-vs-pq overlap ${overlaps.sum / overlaps.size}")
  }

  test("fit + encode + search is deterministic across runs") {
    val probes = corpus.filter($"vec_id" === 0)
    val a = Pq.knnPq(corpus, probes, 5, m = 4, ksub = 8).collect().map(_.toSeq).toSeq
    val b = Pq.knnPq(corpus, probes, 5, m = 4, ksub = 8).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("distortion report: more centroids strictly help; exact-fit corpus reads zero (r10)") {
    // A corpus of exactly ksub rows: the shuffled-row init picks ALL of
    // them (take(min(k, n)) with n == k), so every vector is its own
    // centroid and every subspace's error is 0 to the rounding unit.
    // (More rows than ksub would NOT guarantee zero even with few
    // distinct values — random-row init can duplicate a point and leave
    // another uncovered, and Lloyd never splits the duplicate.)
    val exact = (0 until 4).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d % 4 == i) 5.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val zb = Pq.fitCodebooks(exact, m = 4, ksub = 4)
    val zr = Pq.distortionReport(exact, zb).collect()
    assert(zr.length == 4)
    assert(zr.forall(r => r.getAs[Double]("mean_sq_err") == 0.0 &&
      r.getAs[Double]("max_sq_err") == 0.0), zr.mkString(","))
    // On the jittered corpus, growing ksub cannot increase mean error.
    def meanErr(ksub: Int): Double =
      Pq.distortionReport(corpus, Pq.fitCodebooks(corpus, m = 4, ksub = ksub))
        .agg(sum($"mean_sq_err")).collect().head.getDouble(0)
    val coarse = meanErr(2)
    val fine = meanErr(16)
    assert(fine < coarse, s"ksub=16 ($fine) not better than ksub=2 ($coarse)")
  }
}
