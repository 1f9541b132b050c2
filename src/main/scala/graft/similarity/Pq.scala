package graft.similarity

import graft.Mat.Pinnable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.asDouble

/** [EXT] Product quantization (PQ) — the memory-compression scale path for
  * ANN (Jégou et al., "Product Quantization for Nearest Neighbor Search"):
  *
  *  1. split each d-dim vector into `m` contiguous subvectors of d/m dims;
  *  2. per subspace, fit a small KMeans codebook (`ksub` centroids) on a
  *     bounded sample (same cap discipline as [[Ivf.fitCentroids]]);
  *  3. ENCODE every vector as m byte-sized codes — the stored corpus
  *     shrinks from d·4 float bytes to m bytes per row (32x at d=64, m=8),
  *     which is what lets a 100 TB embedding corpus sit in cluster RAM;
  *  4. search by ADC (asymmetric distance): the probe stays exact; its
  *     squared distance to each sub-centroid is tabulated ONCE per probe
  *     (an m x ksub lookup table), and a candidate's approximate L2² is m
  *     table lookups summed — no float vector is ever read at query time.
  *
  * Scale shape: encoding is a per-row expression over broadcast codebooks
  * (narrow, shuffle-free); search is a broadcast join of the tiny
  * probe-LUT table against the encoded corpus + a per-probe top-k window.
  * Probes are small by contract (the same assumption [[Ivf.knnIvfStored]]
  * makes when it collects probe list ids), so building their LUTs
  * driver-side is |probes| · m · ksub doubles — independent of corpus
  * size. Compose with IVF lists for the full IVF-PQ layout: list-pruned
  * scan, then ADC inside the surviving lists.
  *
  * Quantized distances are engine-specific (KMeans codebooks) — rows-only
  * driver check; PqSpec pins recall vs exact brute force and the
  * compression contract.
  */
object Pq {

  /** Per-subspace codebooks: result(s)(j) = centroid j of subspace s.
    *
    * The SAMPLE is distributed-bounded (≤ maxFitRows rows leave the
    * executors — the FAISS training discipline: PQ codebooks are trained
    * on a subset, in memory), then all m sub-quantizers run seeded local
    * Lloyd's iterations on the driver. One Spark job total — an earlier
    * draft ran m Spark-ML `KMeans.fit`s and paid multi-second scheduler/
    * init overhead PER SUBSPACE, independent of data size (measured 25 s
    * for 500 vectors); the whole local fit is milliseconds. */
  def fitCodebooks(candidates: DataFrame, m: Int, ksub: Int,
                   vecCol: String = "embedding", seed: Long = 42L,
                   maxFitRows: Long = 20000L,
                   maxIter: Int = 10): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val rows = LocalKMeans.sampleRows(candidates, vecCol, maxFitRows, seed)
    require(rows.nonEmpty, "cannot fit PQ codebooks on an empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map { s =>
      val sub = rows.map(r => java.util.Arrays.copyOfRange(r, s * dsub, (s + 1) * dsub))
      LocalKMeans.lloyd(sub, ksub, maxIter, seed + s)
        .map(_.toIndexedSeq).toIndexedSeq
    }
  }

  /** Encode to (idCol, codes array<int> of length m): per subspace, the
    * argmin sub-centroid via the broadcast-literal
    * [[org.apache.spark.sql.graft.NearestCentroids]] expression — one
    * narrow projection, no shuffle, no fan-out. */
  def encode(candidates: DataFrame,
             codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val codeCols = (0 until m).map { s =>
      element_at(org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(
        slice(asDouble(col(vecCol)), s * dsub + 1, dsub), codebooks(s), 1), 1)
    }
    graft.Par.widen(candidates)
      .select(col(idCol).as("cand_id"), array(codeCols: _*).as("codes"))
  }

  /** Probe LUT table (probe_id, lut) built driver-side (probes are small
    * by contract): lut[s·ksub + j] = ||q_s − codebook[s][j]||². */
  private def lutTable(probes: DataFrame,
                       codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                       idCol: String, vecCol: String): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    val probeRows = probes.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    probeRows.toSeq.map { case (pid, pv) =>
      val lut = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < ksub) {
          var d2 = 0.0
          var t = 0
          while (t < dsub) {
            val diff = pv(s * dsub + t) - codebooks(s)(j)(t)
            d2 += diff * diff
            t += 1
          }
          lut(s * ksub + j) = d2
          j += 1
        }
        s += 1
      }
      (pid, lut.toSeq)
    }.toDF("probe_id", "lut")
  }

  /** ADC score = Σ_s lut[s·ksub + codes[s]] — m array lookups per
    * (cand, probe) pair, summed by a bounded fold over subspace ids. */
  private def adcScore(m: Int, ksub: Int): org.apache.spark.sql.Column =
    aggregate(
      sequence(lit(0), lit(m - 1)),
      lit(0.0),
      (acc, s) => acc +
        element_at(col("lut"), s * ksub + element_at(col("codes"), s + 1) + 1))

  /** ADC kNN over an encoded corpus: (probe_id, rk, cand_id, adc_dist) —
    * adc_dist is the approximate squared L2, ascending. */
  def knnPqAdc(encoded: DataFrame, probes: DataFrame,
               codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
               k: Int, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val luts = lutTable(probes, codebooks, idCol, vecCol)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
    encoded.join(broadcast(luts), col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(adcScore(m, ksub), 6).as("adc_dist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("adc_dist"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** Fit + encode + search in one call (the `knn_pq` query). */
  def knnPq(candidates: DataFrame, probes: DataFrame, k: Int,
            m: Int = 8, ksub: Int = 16,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    knnPqWith(fitCodebooks(candidates, m, ksub, vecCol),
      candidates, probes, k, idCol, vecCol)

  /** [[knnPq]] over already-fitted codebooks — split out so the registered
    * query can stash the fit in [[FittedOracle]] for the printed-constant
    * DuckDB replay, and so one codebook set can price many batches. */
  def knnPqWith(books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                candidates: DataFrame, probes: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    knnPqAdc(encode(candidates, books, idCol, vecCol), probes, books, k, idCol, vecCol)

  /** IVF-PQ (`knn_ivf_pq` query) — the standard billion-scale ANN layout:
    * a coarse IVF quantizer prunes the corpus to `nprobe` of `nlist`
    * inverted lists per probe, and PQ/ADC scores only the survivors from
    * their m-byte codes. Plan shape: candidates carry (list, codes) — one
    * narrow projection; the probe side explodes to (probe, list) pairs and
    * broadcasts with its LUT; the join is an EQUI-join on the list id
    * (hash-joinable, unlike [[knnPqAdc]]'s full-scan nested loop), so scan
    * fraction ≈ nprobe/nlist of the code table per probe. At storage
    * scale, write the codes partitioned by list id (the
    * [[Ivf.writeListPartitioned]] layout) and the pruning becomes a
    * filesystem listing. */
  def knnIvfPq(candidates: DataFrame, probes: DataFrame, k: Int,
               nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    knnIvfPqWith(Ivf.fitCentroids(candidates, nlist, vecCol),
      fitCodebooks(candidates, m, ksub, vecCol),
      candidates, probes, k, nprobe, idCol, vecCol)

  /** [[knnIvfPq]] over an already-fitted coarse quantizer + codebooks —
    * the [[FittedOracle]] stash point (see [[knnPqWith]]). */
  def knnIvfPqWith(centers: IndexedSeq[IndexedSeq[Double]],
                   books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                   candidates: DataFrame, probes: DataFrame, k: Int,
                   nprobe: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head.length
    def nearest(v: org.apache.spark.sql.Column, n: Int) =
      org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(v, centers, n)
    val codeCols = (0 until m).map { s =>
      element_at(org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(
        slice(col("cv"), s * dsub + 1, dsub), books(s), 1), 1)
    }
    val cand = graft.Par.widen(candidates)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list", element_at(nearest(col("cv"), 1), 1))
      .select(col("cand_id"), col("list"), array(codeCols: _*).as("codes"))
    // Probe side: LUTs driver-side as in knnPqAdc, plus the nprobe lists.
    val luts = lutTable(probes, books, idCol, vecCol)
    val prob = probes
      .select(col(idCol).cast("long").as("probe_id"),
        explode(nearest(asDouble(col(vecCol)), nprobe)).as("list"))
      .join(luts, Seq("probe_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
    cand.join(broadcast(prob), Seq("list"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(adcScore(m, ksub), 6).as("adc_dist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("adc_dist"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** Write the PQ-encoded corpus PARTITIONED BY its IVF list id — the
    * stored IVF-PQ layout (what FAISS's IVFPQ is on disk): each row
    * carries only (cand_id, codes) — m small ints, NOT the float vector
    * — under directories keyed by list. A probe's nprobe lists are then
    * a filesystem listing away, and the bytes read per probe are
    * ≈ (nprobe∕nlist) · m-bytes-per-row of the corpus: both pruning
    * dimensions (rows via lists, bytes via codes) enforced by storage. */
  def writeIvfPqStore(candidates: DataFrame,
                      centers: IndexedSeq[IndexedSeq[Double]],
                      codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                      path: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val codeCols = (0 until m).map { s =>
      element_at(org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(
        slice(col("cv"), s * dsub + 1, dsub), codebooks(s), 1), 1)
    }
    graft.Par.widen(candidates)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("list",
        element_at(org.apache.spark.sql.graft.VectorFunctions
          .nearestCentroids(col("cv"), centers, 1), 1))
      .select(col("cand_id"), col("list"), array(codeCols: _*).as("codes"))
      .write.mode("overwrite").partitionBy("list").parquet(path)
  }

  /** kNN over a [[writeIvfPqStore]] store: the probes' nprobe list ids
    * are collected (probes are small by contract) and pushed as an `IN`
    * partition filter — only those list directories are scanned
    * (SimilaritySpec pins the PartitionFilters plan shape) — then ADC
    * scores the surviving code rows. Identical output to [[knnIvfPq]]
    * when given the same (seeded, deterministic) centers/codebooks. */
  def knnIvfPqStored(spark: org.apache.spark.sql.SparkSession, path: String,
                     centers: IndexedSeq[IndexedSeq[Double]],
                     codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                     probes: DataFrame, k: Int, nprobe: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val luts = lutTable(probes, codebooks, idCol, vecCol)
    val prob = probes
      .select(col(idCol).cast("long").as("probe_id"),
        explode(org.apache.spark.sql.graft.VectorFunctions.nearestCentroids(
          asDouble(col(vecCol)), centers, nprobe)).as("list"))
      .join(luts, Seq("probe_id"))
      .pinned
    val neededLists = prob.select(col("list")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = spark.read.parquet(path)
      .filter(col("list").isin(neededLists.toSeq.map(Integer.valueOf): _*))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
    cand.join(broadcast(prob), Seq("list"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(adcScore(m, ksub), 6).as("adc_dist"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("adc_dist"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** Shared WITH-fragments of the PQ oracles: the printed codebook table,
    * double-cast vectors, per-(vector, subspace) assignment scores
    * (replaying the native `NearestCentroids` |c|²−2·v·c form over the
    * subvector, left-assoc), per-vector code lists, and per-probe flat
    * ADC LUTs (the exact full-L2² driver loop of [[lutTable]], `ORDER BY
    * s, j` giving the same `s·ksub+j` flat layout). */
  private def sqlPqCommon(books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): String = {
    val dsub = books.head.head.length
    s"""cb AS (
       |  FROM (VALUES
       |    ${FittedOracle.codebookValues(books)}) cb(s, j, n2, cv)),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |psc AS (
       |  SELECT n.vec_id, cb.s, cb.j,
       |    cb.n2 - 2.0 * list_reduce(
       |      list_transform(range(1, $dsub + 1), t -> n.v[cb.s*$dsub + t] * cb.cv[t]),
       |      (a,b) -> a+b) AS sco
       |  FROM n CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, list(j ORDER BY s) AS codes FROM (
       |    SELECT vec_id, s, j,
       |      row_number() OVER (PARTITION BY vec_id, s
       |                         ORDER BY sco ASC, j ASC) AS rn
       |    FROM psc) WHERE rn = 1 GROUP BY vec_id),
       |lut0 AS (
       |  SELECT n.vec_id AS probe_id, cb.s, cb.j,
       |    list_reduce(
       |      list_transform(range(1, $dsub + 1),
       |        t -> (n.v[cb.s*$dsub + t] - cb.cv[t]) * (n.v[cb.s*$dsub + t] - cb.cv[t])),
       |      (a,b) -> a+b) AS d2
       |  FROM n CROSS JOIN cb WHERE n.vec_id % 50 = 0),
       |lutl AS (SELECT probe_id, list(d2 ORDER BY s, j) AS lut
       |         FROM lut0 GROUP BY probe_id)""".stripMargin
  }

  /** The ADC fold as a SQL expression: Σ_s lut[s·ksub + codes[s] ] with
    * the same ascending-subspace left-assoc order as [[adcScore]]. */
  private def sqlAdc(m: Int, ksub: Int): String =
    s"""round(list_reduce(
       |      list_transform(range(0, $m), u -> l.lut[u*$ksub + c.codes[u+1] + 1]),
       |      (a,b) -> a+b), 6)""".stripMargin

  /** DuckDB mirror of [[knnPqWith]] for the fixture probe convention
    * (`vec_id % 50 == 0`) — the FULL oracle for `knn_pq` (r9): fitted
    * codebooks print as exact `Double.toString` constants
    * ([[FittedOracle]]); encoding, the probe LUTs, and the ADC fold all
    * replay with the engine's exact float-op order, so the quantized
    * distances hash-match bit-for-bit. */
  def sqlKnnPq(books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], k: Int): String = {
    val m = books.length
    val ksub = books.head.length
    s"""WITH ${sqlPqCommon(books)},
       |adc AS (
       |  SELECT l.probe_id, c.vec_id AS cand_id,
       |    ${sqlAdc(m, ksub)} AS adc_dist
       |  FROM lutl l CROSS JOIN codes c WHERE c.vec_id <> l.probe_id),
       |r AS (SELECT probe_id, cand_id, adc_dist,
       |        row_number() OVER (PARTITION BY probe_id
       |                           ORDER BY adc_dist ASC, cand_id ASC) AS rk
       |      FROM adc)
       |SELECT probe_id, rk, cand_id, adc_dist FROM r WHERE rk <= $k
       |ORDER BY probe_id, rk""".stripMargin
  }

  /** DuckDB mirror of [[knnIvfPqWith]] — the FULL oracle for `knn_ivf_pq`
    * (r9): [[Ivf.sqlKnnIvf]]'s printed-centroid list assignment + nprobe
    * probe lists compose with [[sqlKnnPq]]'s code/LUT replay; the join is
    * on the list id exactly like the engine's equi-join, and each
    * (probe, cand) pair is unique by construction (one list per
    * candidate), so no DISTINCT is needed. */
  def sqlKnnIvfPq(centers: IndexedSeq[IndexedSeq[Double]],
                  books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                  k: Int, nprobe: Int): String = {
    val m = books.length
    val ksub = books.head.length
    s"""WITH cent AS (
       |  FROM (VALUES
       |    ${FittedOracle.centroidValues(centers)}) cent(cid, n2, cv)),
       |${sqlPqCommon(books)},
       |csc AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |                       ORDER BY sco ASC, cid ASC) AS rn
       |  FROM (
       |    SELECT n.vec_id, cent.cid,
       |      cent.n2 - 2.0 * list_reduce(
       |        list_transform(range(1, len(n.v)+1), i -> n.v[i] * cent.cv[i]),
       |        (a,b) -> a+b) AS sco
       |    FROM n CROSS JOIN cent)),
       |asg AS (SELECT vec_id AS cand_id, cid AS list FROM csc WHERE rn = 1),
       |pl AS (SELECT vec_id AS probe_id, cid AS list FROM csc
       |       WHERE rn <= $nprobe AND vec_id % 50 = 0),
       |adc AS (
       |  SELECT pl.probe_id, asg.cand_id,
       |    ${sqlAdc(m, ksub)} AS adc_dist
       |  FROM pl JOIN asg ON pl.list = asg.list
       |          JOIN codes c ON c.vec_id = asg.cand_id
       |          JOIN lutl l ON l.probe_id = pl.probe_id
       |  WHERE asg.cand_id <> pl.probe_id),
       |r AS (SELECT probe_id, cand_id, adc_dist,
       |        row_number() OVER (PARTITION BY probe_id
       |                           ORDER BY adc_dist ASC, cand_id ASC) AS rk
       |      FROM adc)
       |SELECT probe_id, rk, cand_id, adc_dist FROM r WHERE rk <= $k
       |ORDER BY probe_id, rk""".stripMargin
  }

  /** [EXT] Quantization distortion audit (`pq_distortion` query) — the
    * OTHER half of ANN QA beside recall ([[Similarity.recallReport]]):
    * per subspace, how much squared error the chosen sub-centroids
    * carry. A team reads this before raising m/ksub — recall tells you
    * the index misses, distortion tells you WHY.
    *
    * Per (vector, subspace): err = min_j ||v_s − c_{s,j}||², computed
    * as a left-to-right fold over the broadcast-literal codebook (the
    * engine-exact order DuckDB's list_reduce replays), rounded to 6
    * decimals and LIFTED ×10⁶ to a long BEFORE aggregation — sums are
    * order-independent integer arithmetic, so the corpus-level means
    * hash-match (the domainQuality discipline). One narrow projection +
    * one m-row aggregate; nothing shuffles but (s, err_fp) pairs. */
  def distortionReport(candidates: DataFrame,
                       books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val dsub = books.head.head.length
    def errFp(s: Int) = {
      val sub = slice(asDouble(col(vecCol)), s * dsub + 1, dsub)
      val cents = array(books(s).map(c => array(c.map(lit): _*)): _*)
      val err = array_min(transform(cents, c =>
        aggregate(zip_with(c, sub, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)))
      round(round(err, 6) * 1000000).cast("long")
    }
    graft.Par.widen(candidates)
      .select(posexplode(array((0 until m).map(errFp): _*)))
      .select(col("pos").as("subspace"), col("col").as("err_fp"))
      .groupBy(col("subspace"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("err_fp")).cast("double") / (count(lit(1)) * 1000000.0), 6)
          .as("mean_sq_err"),
        round(max(col("err_fp")).cast("double") / 1000000.0, 6).as("max_sq_err"))
      .orderBy(col("subspace"))
  }

  /** DuckDB mirror of [[distortionReport]] over printed codebooks. */
  def sqlDistortionReport(books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): String = {
    val m = books.length
    val dsub = books.head.head.length
    s"""WITH cb AS (
       |  FROM (VALUES
       |    ${FittedOracle.codebookValues(books)}) cb(s, j, n2, cv)),
       |n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (
       |  SELECT n.vec_id, cb.s,
       |    min(list_reduce(
       |      list_transform(range(1, $dsub + 1),
       |        t -> (cb.cv[t] - v[cb.s*$dsub + t]) * (cb.cv[t] - v[cb.s*$dsub + t])),
       |      (a, b) -> a + b)) AS err
       |  FROM n CROSS JOIN cb GROUP BY 1, 2),
       |f AS (SELECT s, CAST(round(round(err, 6) * 1000000) AS BIGINT) AS err_fp
       |      FROM e)
       |SELECT s AS subspace, count(*) AS n_vectors,
       |  round(SUM(err_fp)::DOUBLE / (count(*) * 1000000.0), 6) AS mean_sq_err,
       |  round(MAX(err_fp)::DOUBLE / 1000000.0, 6) AS max_sq_err
       |FROM f GROUP BY 1 ORDER BY subspace""".stripMargin
  }
}
