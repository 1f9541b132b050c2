package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Engine-reproducible HyperLogLog (A8's sketch path, rebuilt on
  * the md5-prefix discipline — `hll_distinct_users` query).
  *
  * Spark's own `approx_count_distinct` is an HLL++ whose hash and bias
  * tables are engine-internal, so the `approx_distinct_users` query is a
  * rows-only check by declared design. THIS operator is the same sketch
  * idea built from primitives BOTH engines compute identically, so the
  * estimate itself carries a full DuckDB oracle (the r7 recipe that
  * upgraded SimHash/winnowing/fingerprints, applied to a cardinality
  * sketch):
  *
  *  - hash: 60-bit md5 prefix of the key string (the repo's
  *    engine-reproducible primitive) — bucket = top `P` bits, rho =
  *    leading-zero count of the remaining bits + 1 via an integer
  *    comparison chain (no float log2);
  *  - sketch: max(rho) per bucket — associative and commutative, so the
  *    sketch is MERGEABLE: per-partition partials, per-batch partials,
  *    and historical sketch tables all combine with a groupBy-max
  *    ([[merge]]), the property that makes distinct-counting incremental
  *    at 100 TB (persist the ≤ m-row sketch per source/day; never
  *    re-scan history — HllSpec pins sketch(a ∪ b) == merge(sketch(a),
  *    sketch(b)));
  *  - estimate: alpha·m² / (zeros + Σ 2^(−M_j)): each 2^(−M_j) is an
  *    exact dyadic double (1 / (1 << M_j), never `pow`), summed in
  *    bucket order by a left fold — the association both engines
  *    replay; the alpha·m² constant is computed once in Scala and
  *    printed via Double.toString (exact round-trip). The small-range
  *    linear-counting branch (raw ≤ 2.5 m ∧ zeros > 0) selects on
  *    identically-computed values, and its m·ln(m∕zeros) follows the
  *    [[graft.pipeline.Dsir]] precedent that ln() agrees across engines
  *    on a hash-checked oracle.
  *
  * Scale shape: one map-side-combined aggregate to (group, bucket)
  * partials — the only exchange is keyed by (group, bucket), carrying
  * two longs; the per-group finishing fold touches ≤ m = 2^P rows. The
  * 2-4% error regime (P = 9 → rsd ≈ 1.04∕√512 ≈ 4.6%) matches the
  * dashboard-cardinality use; raise P for tighter bounds.
  */
object Hll {

  /** Bucket-count exponent: m = 2^P buckets. */
  val P: Int = 9
  val M: Int = 1 << P
  private val restBits = 60 - P // hash bits left after the bucket prefix
  private val rhoMax = restBits + 1

  /** alpha_m · m² for the raw estimate, computed once and printed into
    * both engines' expressions (Double.toString round-trips exactly). */
  val alphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble

  /** (bucket, rho) for one key expression. The key is hashed as its
    * STRING form — cast ids explicitly so both engines stringify
    * identically. */
  private def hashCols(key: Column): (Column, Column) = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val bucket = shiftright(h, restBits)
    val rest = h.bitwiseAND(lit((1L << restBits) - 1L))
    // leading zeros of the restBits-wide remainder + 1, by integer
    // threshold chain: rho = k iff rest >= 2^(restBits-k) first at k.
    val rho = (1 to restBits).foldLeft(null: Column) { (acc, k) =>
      val cond = rest >= lit(1L << (restBits - k))
      if (acc == null) when(cond, lit(k)) else acc.when(cond, lit(k))
    }.otherwise(lit(rhoMax))
    (bucket, rho.cast("long"))
  }

  /** The sketch table: (groupCols..., bucket, mj) — ≤ m rows per group,
    * built by one map-side-combined aggregate. This is the PERSISTABLE
    * incremental state: union any number of sketch tables and [[merge]]
    * restores a valid sketch of the union of their key sets. */
  def sketch(df: DataFrame, keyCol: String, groupCols: String*): DataFrame = {
    val (bucket, rho) = hashCols(col(keyCol))
    graft.Par.widen(df)
      .select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Merge sketch tables (same group/bucket schema): groupBy-max — the
    * associativity that makes the sketch incremental. */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionByName _)
    val groupCols = all.columns.filterNot(Set("bucket", "mj")).toSeq
    all.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("mj")).as("mj"))
  }

  /** Estimate per group from a sketch table: (groupCols..., n_hll). */
  def estimate(sk: DataFrame, groupCols: String*): DataFrame = {
    val g = sk.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("bucket"), col("mj")))).as("arr"),
        count(lit(1)).as("n_obs"))
    val zeros = (lit(M.toLong) - col("n_obs"))
    // S = zeros·2^0 + Σ 2^(−mj), folded in bucket order; each term is an
    // exact dyadic looked up from a precomputed 2^(−k) literal array
    // (1∕(1L << k) — exact in doubles), so the only rounding is the
    // ordered accumulation both engines share.
    val inv2 = array((0 to rhoMax).map(k => lit(1.0 / (1L << k).toDouble)): _*)
    val s = zeros.cast("double") +
      aggregate(col("arr"), lit(0.0),
        (acc, x) => acc + element_at(inv2, (x.getField("mj") + 1).cast("int")))
    val raw = lit(alphaM2) / s
    val corrected = when(raw <= lit(2.5 * M) && zeros > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    g.select(groupCols.map(col) :+ floor(corrected).cast("long").as("n_hll"): _*)
  }

  /** One-shot per-group estimate beside the exact count
    * (`hll_distinct_users` query): (group, n_exact, n_hll), ordered. */
  def distinctWithExact(df: DataFrame, keyCol: String,
                        groupCol: String): DataFrame = {
    val est = estimate(sketch(df, keyCol, groupCol), groupCol)
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
      .join(est, Seq(groupCol))
      .orderBy(col(groupCol))
  }

  /** DuckDB mirror of [[distinctWithExact]] over a relation `from`
    * exposing (groupCol, keyCol). */
  def sqlDistinctWithExact(from: String, keyCol: String,
                           groupCol: String): String = {
    val rhoChain = (1 to restBits)
      .map(k => s"WHEN rest >= ${1L << (restBits - k)} THEN $k")
      .mkString(" ")
    s"""WITH h AS (
       |  SELECT $groupCol,
       |    ('0x' || substring(md5(CAST($keyCol AS VARCHAR)), 1, 15))::UBIGINT::BIGINT AS hv
       |  FROM $from),
       |br AS (
       |  SELECT $groupCol, hv >> $restBits AS bucket,
       |    CASE $rhoChain ELSE $rhoMax END AS rho
       |  FROM (SELECT $groupCol, hv, hv & ${(1L << restBits) - 1L} AS rest FROM h)),
       |sk AS (SELECT $groupCol, bucket, MAX(rho) AS mj FROM br GROUP BY 1, 2),
       |g AS (
       |  SELECT $groupCol,
       |    list(mj ORDER BY bucket) AS arr,
       |    COUNT(*) AS n_obs
       |  FROM sk GROUP BY 1),
       |est AS (
       |  SELECT $groupCol,
       |    CAST($M - n_obs AS DOUBLE)
       |      + list_reduce(list_prepend(0.0,
       |          list_transform(arr, x -> 1.0 / CAST(1::BIGINT << x AS DOUBLE))),
       |          (a, b) -> a + b) AS s,
       |    $M - n_obs AS zeros
       |  FROM g),
       |fin AS (
       |  SELECT $groupCol,
       |    CASE WHEN $alphaM2 / s <= ${2.5 * M} AND zeros > 0
       |         THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
       |         ELSE $alphaM2 / s END AS est
       |  FROM est),
       |ex AS (SELECT $groupCol, COUNT(DISTINCT $keyCol) AS n_exact FROM $from GROUP BY 1)
       |SELECT ex.$groupCol, ex.n_exact,
       |       CAST(FLOOR(fin.est) AS BIGINT) AS n_hll
       |FROM ex JOIN fin USING ($groupCol)
       |ORDER BY ex.$groupCol""".stripMargin
  }
}
