package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{asDouble, dot, norm}

/** [EXT] IVF (inverted-file) approximate kNN — the second scale path next
  * to [[Similarity.knnLsh]]:
  *
  *  1. fit a coarse quantizer (KMeans, `nlist` centroids, fixed seed) on a
  *     bounded SAMPLE of the candidate corpus — the fit cost is capped by
  *     `maxFitRows`, independent of corpus size;
  *  2. assign every candidate to its nearest centroid (its "list") via a
  *     per-row argmin expression over the broadcast centroid matrix
  *     ([[org.apache.spark.sql.graft.NearestCentroids]]) — narrow,
  *     shuffle-free, no row blow-up;
  *  3. per probe, search the `nprobe` nearest lists only, exact-cosine
  *     re-rank inside them.
  *
  * Scan fraction ≈ nprobe/nlist of the corpus per probe (vs 100% for
  * brute force); recall depends on how well lists capture the metric's
  * neighborhoods. Search is a plain equi-join on the list id — at scale
  * the corpus is written bucketed/partitioned BY list id, so a probe reads
  * only its nprobe partitions (partition pruning does the work
  * storage-side).
  */
object Ivf {

  /** Centroid matrix (row index = centroid/list id) from a seeded k-means
    * fit over at most `maxFitRows` sampled candidate vectors.
    *
    * The sample bound is what makes the quantizer viable at 100 TB: the
    * fit touches ≤ maxFitRows vectors no matter the corpus size (the
    * sizing `count` is a column-pruned metadata-cheap pass), and `maxIter`
    * caps the pass count. The Lloyd loop itself runs driver-side on the
    * collected sample via [[LocalKMeans]] — an earlier draft used Spark-ML
    * `KMeans.fit`, whose scheduler overhead cost multi-seconds per fit
    * regardless of sample size. Centroids are engine-specific — downstream
    * checks are rows-only plus the recall spec — so sampling does not
    * affect any oracle. The centroid matrix lives on the driver; its size
    * is bounded by nlist (a config), never by data scale.
    */
  def fitCentroids(candidates: DataFrame, nlist: Int,
                   vecCol: String = "embedding", seed: Long = 42L,
                   maxFitRows: Long = 100000L,
                   maxIter: Int = 10): IndexedSeq[IndexedSeq[Double]] = {
    val rows = LocalKMeans.sampleRows(candidates, vecCol, maxFitRows, seed)
    LocalKMeans.lloyd(rows, nlist, maxIter, seed)
      .map(_.toIndexedSeq).toIndexedSeq
  }

  /** Write the candidate corpus PARTITIONED BY its IVF list id — the
    * storage layout that makes probe-time pruning a metadata operation:
    * a probe touching `nprobe` of `nlist` lists reads only those
    * directories, so the scan fraction is enforced by the filesystem
    * listing, not by post-scan filtering. The per-row fields (cand_id,
    * cv as array<double>, cn) are exactly what [[knnIvfStored]] needs —
    * no re-normalization at read time. */
  def writeListPartitioned(candidates: DataFrame,
                           centers: IndexedSeq[IndexedSeq[Double]],
                           path: String,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): Unit =
    graft.Par.widen(candidates)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list",
        element_at(org.apache.spark.sql.graft.VectorFunctions
          .nearestCentroids(col("cv"), centers, 1), 1))
      .write.mode("overwrite").partitionBy("list").parquet(path)

  /** kNN over a [[writeListPartitioned]] store. The probes' nprobe list
    * ids are collected (probes are small by contract — they broadcast)
    * and pushed as an `IN` partition filter, so only the needed list
    * directories are scanned — PlanQualitySpec pins the partition-filter
    * shape. Same output contract as [[knnIvf]]. */
  def knnIvfStored(spark: org.apache.spark.sql.SparkSession, path: String,
                   centers: IndexedSeq[IndexedSeq[Double]],
                   probes: DataFrame, k: Int, nprobe: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def nearest(v: org.apache.spark.sql.Column, n: Int) =
      org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(v, centers, n)
    val prob = probes
      .select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
      .select(col("probe_id"), col("pv"), col("pn"),
        explode(nearest(col("pv"), nprobe)).as("list"))
      .localCheckpoint(true)
    val neededLists = prob.select(col("list")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = spark.read.parquet(path)
      .filter(col("list").isin(neededLists.toSeq.map(Integer.valueOf): _*))
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

  /** IVF approximate kNN. Returns (probe_id, rk, cand_id, cosine) like
    * the brute-force and LSH variants. */
  def knnIvf(candidates: DataFrame, probes: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxFitRows: Long = 100000L): DataFrame = {
    val centers = fitCentroids(candidates, nlist, vecCol, maxFitRows = maxFitRows)
    def nearest(v: org.apache.spark.sql.Column, n: Int) =
      org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(v, centers, n)
    // Own list = argmin over the centroid matrix — one expression per row.
    val cand = graft.Par.widen(candidates)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list", element_at(nearest(col("cv"), 1), 1))
    // nprobe nearest lists per probe: one expression + explode (probe side
    // is tiny and broadcast below, so the fan-out is |probes| × nprobe).
    val prob = probes
      .select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
      .select(col("probe_id"), col("pv"), col("pn"),
        explode(nearest(col("pv"), nprobe)).as("list"))
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
