package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Approximate-nearest-neighbor / similarity search over an embedding
  * column (north star, SURVEY.md §2.3 J3).
  *
  * Shapes:
  *  - brute-force top-k: probes × candidates nested-loop with the probe
  *    side broadcast — exact, the correctness baseline. At 100 TB the
  *    candidate side streams partition-parallel and never shuffles; cost
  *    is O(|probes| · |candidates| · dim) flops, fine for small probe sets.
  *  - cosine near-dup pairs: all-pairs within id order — audit tool,
  *    quadratic; the LSH variant below is the scale path.
  *  - random-hyperplane LSH: sign-bucket each vector (16 bits), equi-join
  *    on bucket, exact re-rank — linear-ish, recall tunable by band count.
  *
  * Dot/norm arithmetic is `zip_with`/`aggregate` over array<double> with a
  * left-to-right fold, which DuckDB's `list_transform`/`list_reduce`
  * reproduces exactly — so cosine values are bit-identical across engines
  * and safe to hash-compare after round(…, 6).
  */
object Similarity {

  /** Cast array<float> → array<double> BEFORE any arithmetic so both
    * engines multiply doubles (float×float would also match, but mixed
    * promotion orders would not). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each probe row (`knn_bruteforce` query).
    * Pre-computes norms once per side; probe side is broadcast so the
    * candidate scan is shuffle-free; ranking is a window partitioned by
    * probe (shuffle on probe id — |probes|·|cands| rows but tiny payload).
    */
  def knnBruteForce(candidates: DataFrame, probes: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val prob = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("cand_id").asc)
    cand.join(broadcast(prob), col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(dot(col("pv"), col("cv")) / (col("pn") * col("cn")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rk"))
  }

  /** All-pairs cosine ≥ threshold (`cosine_pairs` query) — embedding-space
    * near-dup audit. Quadratic: keep for bounded id ranges / samples. */
  def cosinePairs(emb: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val t = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val a = t.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = t.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic pseudo-random hyperplanes (unit-free — only the sign of
    * the projection matters). Fixed seed: buckets are stable across runs. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id: bit j = [v · h_j > 0]. One long per vector. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit(_)): _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate kNN (`knn_lsh` query): candidates sharing the
    * probe's exact bucket are re-ranked exactly. Misses neighbors that land
    * in adjacent buckets — recall/cost is tuned by numPlanes (fewer planes
    * → bigger buckets → higher recall, more re-rank work). */
  def knnLsh(candidates: DataFrame, probes: DataFrame, k: Int, numPlanes: Int = 8,
             dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val cand = candidates.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val prob = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
      .withColumn("bucket", lshBucket(col("pv"), planes))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("cand_id").asc)
    cand.join(broadcast(prob), Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        round(dot(col("pv"), col("cv")) / (col("pn") * col("cn")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rk"))
  }
}
