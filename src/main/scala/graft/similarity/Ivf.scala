package graft.similarity

import graft.Mat.Pinnable

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
      .pinned
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
             maxFitRows: Long = 100000L): DataFrame =
    knnIvfWith(fitCentroids(candidates, nlist, vecCol, maxFitRows = maxFitRows),
      candidates, probes, k, nprobe, idCol, vecCol)

  /** [[knnIvf]] over an already-fitted centroid matrix — split out so the
    * registered query can stash the fit in [[FittedOracle]] (the printed
    * constants make the DuckDB oracle replayable) and so a production
    * caller can reuse one quantizer across batches. */
  def knnIvfWith(centers: IndexedSeq[IndexedSeq[Double]],
                 candidates: DataFrame, probes: DataFrame, k: Int,
                 nprobe: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
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

  /** DuckDB mirror of [[knnIvfWith]] for the fixture probe convention
    * (`vec_id % 50 == 0`) — the FULL oracle for `knn_ivf` (r9): the
    * fitted centroids print as exact `Double.toString` constants
    * ([[FittedOracle]]), assignment replays the native
    * [[org.apache.spark.sql.graft.NearestCentroids]] score
    * (`|c|² − 2·v·c`, dot accumulated left-to-right = `list_reduce`,
    * |c|² itself a printed constant), ties broken by lower centroid id
    * exactly like the expression's strictly-less insertion sort, and the
    * cosine re-rank is the `knn_bruteforce` oracle tail restricted to the
    * nprobe-list candidates. */
  def sqlKnnIvf(centers: IndexedSeq[IndexedSeq[Double]], k: Int,
                nprobe: Int): String =
    s"""WITH cent AS (
       |  FROM (VALUES
       |    ${FittedOracle.centroidValues(centers)}) cent(cid, n2, cv)),
       |n AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
       |                     (a,b) -> a+b)) AS nv
       |  FROM embeddings),
       |sc0 AS (
       |  SELECT n.vec_id, cent.cid,
       |    cent.n2 - 2.0 * list_reduce(
       |      list_transform(range(1, len(n.v)+1), i -> n.v[i] * cent.cv[i]),
       |      (a,b) -> a+b) AS sco
       |  FROM n CROSS JOIN cent),
       |sc AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY sco ASC, cid ASC) AS rn
       |  FROM sc0),
       |asg AS (SELECT vec_id AS cand_id, cid AS list FROM sc WHERE rn = 1),
       |pl AS (SELECT vec_id AS probe_id, cid AS list FROM sc
       |       WHERE rn <= $nprobe AND vec_id % 50 = 0),
       |cand AS (
       |  SELECT pl.probe_id, asg.cand_id
       |  FROM pl JOIN asg ON pl.list = asg.list
       |  WHERE asg.cand_id <> pl.probe_id),
       |s2 AS (
       |  SELECT cand.probe_id, cand.cand_id,
       |    round(list_reduce(list_transform(range(1, len(x.v)+1), i -> x.v[i]*y.v[i]),
       |                      (a,b) -> a+b) / (x.nv * y.nv), 6) AS cosine
       |  FROM cand JOIN n x ON cand.probe_id = x.vec_id
       |            JOIN n y ON cand.cand_id = y.vec_id),
       |r AS (SELECT probe_id, cand_id, cosine,
       |        row_number() OVER (PARTITION BY probe_id
       |                           ORDER BY cosine DESC, cand_id ASC) AS rk
       |      FROM s2)
       |SELECT probe_id, rk, cand_id, cosine FROM r WHERE rk <= $k
       |ORDER BY probe_id, rk""".stripMargin

  /** DuckDB mirror of the `ann_recall_report` query: the proven
    * brute-force and printed-centroid IVF mirrors as whole subqueries
    * (DuckDB allows WITH inside a derived table), joined per (probe,
    * candidate), recall in exact integer basis points. */
  def sqlAnnRecall(centers: IndexedSeq[IndexedSeq[Double]], k: Int,
                   nprobe: Int, probeWhere: String): String =
    s"""WITH exact AS (
       |  FROM (${Similarity.sqlKnnBruteForce(probeWhere, k)})),
       |approx AS (
       |  FROM (${sqlKnnIvf(centers, k, nprobe)}))
       |SELECT e.probe_id, count(*) AS n_exact, count(a.cand_id) AS hits,
       |  CAST(count(a.cand_id) * 10000 // count(*) AS BIGINT) AS recall_bp
       |FROM exact e LEFT JOIN approx a
       |  ON e.probe_id = a.probe_id AND e.cand_id = a.cand_id
       |GROUP BY 1
       |ORDER BY e.probe_id""".stripMargin
}
