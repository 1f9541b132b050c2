package graft.similarity

import graft.Mat.Pinnable

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Append a batch to a [[writeListPartitioned]] store under a FROZEN
    * quantizer — how IVF indexes grow in production (the FAISS `add`
    * path): new vectors are assigned to the EXISTING lists, never moved,
    * never refit, so the store stays queryable mid-append and history
    * files are untouched (each append only creates new files inside the
    * list directories it hits — O(batch), independent of history size).
    * The price of freezing is drift: as the corpus distribution moves
    * away from the fitted sample, lists skew — [[listStats]] is the
    * audit that says when to refit. Search over the appended store needs
    * no new code: assignment is a pure function of (vector, centers), so
    * [[knnIvfStored]] with the SAME frozen centers returns exactly what
    * the in-memory [[knnIvfWith]] computes over the union corpus
    * (`knn_ivf_append`'s printed-centroid oracle enforces this). */
  def appendToStore(batch: DataFrame,
                    centers: IndexedSeq[IndexedSeq[Double]],
                    path: String,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit =
    graft.Par.widen(batch)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list",
        element_at(org.apache.spark.sql.graft.VectorFunctions
          .nearestCentroids(col("cv"), centers, 1), 1))
      .write.mode("append").partitionBy("list").parquet(path)

  /** [EXT] Compact a grown [[appendToStore]] store IN PLACE
    * (`knn_ivf_compacted` query) — the maintenance action
    * [[listStats]]'s file-count half motivates: every append adds new
    * files inside the list directories it hits, so a store that has
    * absorbed many batches reads as many small files per list (the
    * classic small-files tax: per-file open/footer cost dominates the
    * scan). Compaction rewrites each list as ONE file: hash-repartition
    * by the list id (all rows of a list land in one task) + partitioned
    * write — content identical, layout minimal. The rewrite goes to a
    * sibling temp dir first and swaps in only after it is fully
    * written, so a crash mid-compact leaves the original store intact
    * (the read-your-own-overwrite hazard is structural: Spark cannot
    * overwrite a path it is still reading). Search identity is the
    * spec's job and the shared printed-centroid oracle's — compaction
    * changes WHERE bytes live, never WHAT a probe returns. */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   path: String): Unit = {
    val tmp = path + "__compacting"
    spark.read.parquet(path)
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(tmp)
    swapStore(path, tmp)
  }

  /** Backup-first store swap (shared by [[compactStore]] / [[refit]]):
    * live → `path__old`, tmp → live, delete the backup. At NO point is
    * the data only in a temp sibling — a crash before the second move
    * leaves the complete store at `path__old` (restore = rename it
    * back; the next maintenance run also clears a stale backup), a
    * crash after it leaves the new store live plus a deletable backup.
    * `Files.move` raises a diagnosed error instead of `renameTo`'s
    * silent false; ATOMIC_MOVE pins the same-filesystem contract this
    * layout relies on (the tmp sibling lives beside the store
    * precisely so the moves are renames — a store on a mount where
    * directory rename is a copy should use a transactional table
    * format instead). */
  private def swapStore(path: String, tmp: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val live = Paths.get(path)
    val bak = Paths.get(path + "__old")
    if (Files.exists(bak)) // stale backup from an interrupted swap
      org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    Files.move(live, bak, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(tmp), live, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.io.IOException =>
        Files.move(bak, live, StandardCopyOption.ATOMIC_MOVE) // restore
        throw e
    }
    org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
  }

  /** [EXT] Refit the quantizer from the GROWN corpus and rewrite the
    * store under the new centers (`knn_ivf_refit` query) — the FAISS
    * retrain loop that closes the freeze-drift story: [[appendToStore]]
    * grows lists under frozen centers, [[listStats]] measures the skew,
    * and when the occupancy says the corpus moved, THIS re-fits
    * (seeded, bounded-sample — [[fitCentroids]] on the store's own
    * vectors), re-assigns every vector, and rewrites list-partitioned
    * (same temp-dir swap discipline as [[compactStore]]; the rewrite is
    * also a compaction — one file per list). Returns the new centroid
    * matrix: assignment is a pure function of (vector, centers), so
    * search over the refit store under the returned centers equals the
    * in-memory search over the same corpus — the printed-centroid
    * oracle enforces it. */
  def refit(spark: org.apache.spark.sql.SparkSession, path: String,
            nlist: Int, seed: Long = 42L,
            maxFitRows: Long = 100000L): IndexedSeq[IndexedSeq[Double]] = {
    val cur = spark.read.parquet(path)
      .select(col("cand_id").as("vec_id"), col("cv").as("embedding"))
    val centers = fitCentroids(cur, nlist, "embedding", seed, maxFitRows)
    val tmp = path + "__refitting"
    graft.Par.widen(cur)
      .select(col("vec_id").as("cand_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("list",
        element_at(org.apache.spark.sql.graft.VectorFunctions
          .nearestCentroids(col("cv"), centers, 1), 1))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(tmp)
    swapStore(path, tmp)
    centers
  }

  /** [EXT] IVF list-occupancy audit (`ivf_list_stats` query) — the
    * drift/imbalance signal a team reads before trusting a frozen
    * quantizer ([[appendToStore]]): per list, how many history vs
    * batch vectors landed there and the list's share of the corpus in
    * integer ppm. A healthy index reads ≈10⁶/nlist per list; a hot
    * list caps nprobe-search gains (its scan cost dominates) and a
    * batch share concentrating in few lists says the corpus moved —
    * refit. EVERY list gets a row (empty ones read 0 — an empty list
    * is the other half of the skew story), via a driver-literal list
    * spine; one assignment scan + one nlist-row aggregate, broadcast
    * total join. */
  def listStats(candidates: DataFrame,
                centers: IndexedSeq[IndexedSeq[Double]],
                batchFlag: Column,
                vecCol: String = "embedding"): DataFrame = {
    val spark = candidates.sparkSession
    val g = graft.Par.widen(candidates)
      .select(
        element_at(org.apache.spark.sql.graft.VectorFunctions
          .nearestCentroids(asDouble(col(vecCol)), centers, 1), 1).as("list"),
        when(batchFlag, 1L).otherwise(0L).as("is_batch"))
      .groupBy(col("list"))
      .agg(count(lit(1)).as("n_total"), sum(col("is_batch")).as("n_batch"))
    val spine = spark.range(centers.length).select(col("id").cast("int").as("list"))
    val total = g.agg(sum(col("n_total")).as("corpus_total"))
    spine.join(g, Seq("list"), "left")
      .select(col("list"),
        coalesce(col("n_total") - col("n_batch"), lit(0L)).as("n_history"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        coalesce(col("n_total"), lit(0L)).as("n_total"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_total * 1000000L DIV corpus_total"))
      .drop("corpus_total")
      .orderBy(col("list"))
  }

  /** DuckDB mirror of [[listStats]] over printed centroids: the
    * assignment CTE is [[sqlKnnIvf]]'s proven replay; the spine is
    * `range(nlist)` so empty lists appear with zero counts. */
  def sqlListStats(centers: IndexedSeq[IndexedSeq[Double]],
                   batchWhere: String): String =
    s"""WITH cent AS (
       |  FROM (VALUES
       |    ${FittedOracle.centroidValues(centers)}) cent(cid, n2, cv)),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sc0 AS (
       |  SELECT n.vec_id, cent.cid,
       |    cent.n2 - 2.0 * list_reduce(
       |      list_transform(range(1, len(n.v)+1), i -> n.v[i] * cent.cv[i]),
       |      (a,b) -> a+b) AS sco
       |  FROM n CROSS JOIN cent),
       |asg AS (
       |  SELECT vec_id, cid AS list FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id
       |                         ORDER BY sco ASC, cid ASC) AS rn
       |    FROM sc0) WHERE rn = 1),
       |g AS (
       |  SELECT list, COUNT(*) AS n_total,
       |    SUM(CASE WHEN $batchWhere THEN 1 ELSE 0 END) AS n_batch
       |  FROM asg GROUP BY 1),
       |spine AS (SELECT CAST(range AS INT) AS list FROM range(${centers.length})),
       |t AS (SELECT SUM(n_total) AS corpus_total FROM g)
       |SELECT spine.list,
       |  CAST(COALESCE(g.n_total - g.n_batch, 0) AS BIGINT) AS n_history,
       |  CAST(COALESCE(g.n_batch, 0) AS BIGINT) AS n_batch,
       |  CAST(COALESCE(g.n_total, 0) AS BIGINT) AS n_total,
       |  CAST(COALESCE(g.n_total, 0) * 1000000 // t.corpus_total AS BIGINT)
       |    AS share_ppm
       |FROM spine LEFT JOIN g ON spine.list = g.list CROSS JOIN t
       |ORDER BY spine.list""".stripMargin

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
