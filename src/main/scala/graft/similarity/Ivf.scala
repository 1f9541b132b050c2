package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{asDouble, dot, norm}

/** [EXT] IVF (inverted-file) approximate kNN — the second scale path next
  * to [[Similarity.knnLsh]]:
  *
  *  1. fit a coarse quantizer (KMeans, `nlist` centroids, fixed seed) on
  *     the candidate corpus — one-time, sampled at 100 TB;
  *  2. assign every candidate to its nearest centroid (its "list") — a
  *     broadcast argmin against `nlist` rows, narrow and shuffle-free;
  *  3. per probe, search the `nprobe` nearest lists only, exact-cosine
  *     re-rank inside them.
  *
  * Scan fraction ≈ nprobe/nlist of the corpus per probe (vs 100% for
  * brute force); recall depends on how well lists capture the metric's
  * neighborhoods. Assignment and search are plain equi-joins on the list
  * id — at scale the corpus is written bucketed/partitioned BY list id,
  * so a probe reads only its nprobe partitions (partition pruning does
  * the work storage-side).
  */
object Ivf {

  /** Centroid table (cid, center, cnorm2) from a seeded KMeans fit. */
  def fitCentroids(candidates: DataFrame, nlist: Int,
                   vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val feats = candidates
      .select(array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cid", "center")
      .withColumn("cnorm2", dot(col("center"), col("center")))
  }

  /** Rank of each (row, centroid) pair by L2 distance; rank 1 = own list.
    * dist² = |v|² − 2·v·c + |c|² (|v|² is constant per row → dropped). */
  private def centroidRanks(rows: DataFrame, centroids: DataFrame,
                            idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").asc, col("cid").asc)
    rows.crossJoin(broadcast(centroids))
      .withColumn("score", col("cnorm2") - lit(2.0) * dot(col(vecCol), col("center")))
      .withColumn("crank", row_number().over(w))
      .drop("center", "cnorm2", "score")
  }

  /** IVF approximate kNN. Returns (probe_id, rk, cand_id, cosine) like
    * the brute-force and LSH variants. */
  def knnIvf(candidates: DataFrame, probes: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = fitCentroids(candidates, nlist, vecCol)
    val cand = centroidRanks(
      candidates.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
        .withColumn("cn", norm(col("cv"))),
      centroids, "cand_id", "cv")
      .filter(col("crank") === 1)                 // own list
      .withColumnRenamed("cid", "list")
    val prob = centroidRanks(
      probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
        .withColumn("pn", norm(col("pv"))),
      centroids, "probe_id", "pv")
      .filter(col("crank") <= nprobe)             // nprobe nearest lists
      .withColumnRenamed("cid", "list")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    cand.join(broadcast(prob), Seq("list"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(dot(col("pv"), col("cv")) / (col("pn") * col("cn")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rk"))
  }
}
