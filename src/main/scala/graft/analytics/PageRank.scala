package graft.analytics

import graft.Mat.Pinnable

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** [EXT] PageRank in integer fixed-point arithmetic (`part_pagerank`
  * query) — graph centrality for catalog/link analysis, built so the
  * result is EXACTLY reproducible across engines and therefore carries a
  * full DuckDB oracle (rare for an iterative float algorithm).
  *
  * Why integers: float PageRank sums in-neighbor contributions, and
  * float addition is non-associative — a different partition/reduce
  * order produces a different last bit, which a hash-compare oracle
  * would flag. Here every rank is a fixed-point long (`scale` = 1e12
  * units = rank 1.0 spread over the graph), contributions use long
  * division, and integer addition IS associative — any reduce order,
  * any partitioning, any engine gives bit-identical ranks.
  *
  * Per iteration (damping d as an integer percentage):
  *   contrib(u→v) = (r(u)·d ∕ 100) ∕ outdeg(u)        (long division)
  *   r'(v)        = teleport + Σ contrib(u→v),
  *   teleport     = (scale·(100−d) ∕ 100) ∕ |V|
  * Truncation leaks a few units per node per round — bounded by
  * |V|·iterations units total (≈1e-7 of the mass here), deterministic,
  * and identical in the oracle, which replays the same divisions.
  *
  * Execution shape: the GraphX-style genuine-iterative RDD exception
  * (see [[graft.dedup.Dedup.clusterKeepers]] for the rationale — a
  * DataFrame loop would pay Catalyst replanning per round). Adjacency
  * and node RDDs are hash-partitioned ONCE and persisted; each round's
  * adjacency⋈ranks join is then narrow (zero shuffle) and the only
  * per-round movement is the reduceByKey of contributions — one
  * exchange per iteration, the irreducible PageRank cost. Dangling
  * nodes cannot occur on a symmetrized graph (every node has out-edges);
  * for general edge lists the mass of dangling nodes simply leaks,
  * matching the oracle's replay.
  *
  * Scale: |E| edges per round through one exchange; partition count
  * follows the graph size, not the corpus-scan shuffle width.
  */
object PageRank {

  val Scale: Long = 1000000000000L

  /** Ranks over the node set of `edges` (directed (src, dst) pairs;
    * duplicates are deduplicated per node while building the adjacency,
    * so callers may emit multi-edges freely): (node, rank_fp) with
    * rank_fp in `Scale` fixed-point units, ordered by node. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int = 10, dampingPct: Int = 85): DataFrame =
    iterate(edges, srcCol, dstCol, None, iterations, dampingPct)

  /** [EXT] Convergence-driven early stop (r13, the F130 curves put to
    * work): iterate until the round's L1 residual Σ|r_k − r_{k−1}| drops
    * below `tolFp` (in `Scale` fixed-point units) or `maxIterations` is
    * hit, whichever first. Returns (ranks, stop round); the vector is
    * BIT-identical to `ranks(iterations = stop)` — the loop arithmetic
    * is the same code path, tolerance mode only adds the per-round
    * residual action (PageRankSpec pins the identity, and pins the stop
    * round against the measured F130 curve).
    *
    * Cost of stopping: unlike [[ranks]]' one-lineage-one-evaluation
    * shape, a data-dependent stop NEEDS a per-round action, so each
    * round's vector is persisted and the residual is one narrow
    * co-partitioned join + sum over node-scale data — the same
    * discipline [[hits]] already pays for its normalization totals.
    * Worth it exactly when rounds are expensive and the curve is steep:
    * the measured fixture curve drops 4 decades in 6 rounds, so a
    * tolerance stop saves 30-40% of the |E|-shuffle rounds at any scale
    * where the graph dwarfs the node-vector bookkeeping. */
  def ranksUntil(edges: DataFrame, srcCol: String, dstCol: String,
                 tolFp: Long, maxIterations: Int = 50,
                 dampingPct: Int = 85): (DataFrame, Int) =
    iterateUntil(edges, srcCol, dstCol, None, tolFp, maxIterations, dampingPct)

  /** [[ranksUntil]] for the TrustRank teleport (seeded) variant — same
    * core, same bit-identity contract vs [[seededRanks]]. */
  def seededRanksUntil(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, seedCol: String,
                       tolFp: Long, maxIterations: Int = 50,
                       dampingPct: Int = 85): (DataFrame, Int) =
    iterateUntil(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast("long"))), tolFp, maxIterations,
      dampingPct)

  /** [EXT] TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): PageRank
    * with teleport restricted to a trusted SEED set — trust flows out of
    * the seeds along edges and decays with distance; nodes unreachable
    * from any seed rank 0. Initial mass and per-round teleport are
    * `Scale ∕ |S∩V|` and `Scale·(100−d) ∕ 100 ∕ |S∩V|` on seeds, 0
    * elsewhere, so total trust mass matches [[ranks]]'s total rank mass
    * and the two are directly comparable (the spam-mass premise). Seeds
    * outside the node set are ignored; at least one must be in it. */
  def seededRanks(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, seedCol: String,
                  iterations: Int = 10, dampingPct: Int = 85): DataFrame =
    iterate(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast("long"))), iterations, dampingPct)

  /** ONE rank round over the prepared graph — the arithmetic shared
    * STRUCTURALLY by the fixed loop ([[iterate]]), the residual curve
    * ([[convergence]]) and the tolerance loop ([[iterateUntil]]), so
    * their bit-identity contracts hold by construction instead of by
    * hand-mirrored code (r13 review). Zero-rank sources contribute
    * nothing; no-in-edge nodes fall back to teleport alone (the left
    * join is narrow — both sides share `part`). */
  private def rankRound(adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
                        tele: org.apache.spark.rdd.RDD[(Long, (Long, Long))],
                        part: HashPartitioner, dampingPct: Int)(
                        ranks: org.apache.spark.rdd.RDD[(Long, Long)])
      : org.apache.spark.rdd.RDD[(Long, Long)] = {
    val contribs = adj.join(ranks)
      .flatMap { case (_, (dsts, r)) =>
        if (r == 0L) Iterator.empty
        else {
          val c = r * dampingPct / 100L / dsts.length
          dsts.iterator.map(d => (d, c))
        }
      }
      .reduceByKey(part, _ + _)
    tele.leftOuterJoin(contribs)
      .mapValues { case ((t, _), c) => t + c.getOrElse(0L) }
  }

  /** The prepared iterative-graph state shared by every rank loop over
    * one edge frame: edges persisted, adjacency hash-partitioned with
    * per-node dedup, node set co-partitioned, |V| counted. Extracted
    * (r16) so the spam-mass faces prepare the graph ONCE for their two
    * rank chains — the former shape rebuilt the edge decode, adjacency
    * groupByKey and node-set shuffle per chain (guide §2.4: remove
    * shuffles outright). Callers own [[PreparedGraph.unpersistAll]] once
    * their results materialize. */
  private final case class PreparedGraph(
      e: DataFrame, part: HashPartitioner,
      adj: org.apache.spark.rdd.RDD[(Long, Array[Long])],
      nodes: org.apache.spark.rdd.RDD[(Long, Unit)], n: Long) {
    def unpersistAll(): Unit = {
      e.unpersist(false); adj.unpersist(false); nodes.unpersist(false); ()
    }
  }

  private def prepareGraph(edges: DataFrame, srcCol: String,
                           dstCol: String): PreparedGraph = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Materialize the (possibly expensive) edge derivation once as a
    // cached DataFrame — the columnar InMemoryRelation costs a build pass
    // but stays compressed off the GC's back (an RDD-of-tuples persist
    // was measured 2× slower end-to-end from allocation pressure alone).
    // persist (not localCheckpoint) so the blocks can be dropped
    // explicitly once the result materializes — leaked blocks measurably
    // starve whatever runs next in the session.
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(lvl)
    val nParts = graft.Par.graphParts(e, e.count())
    val part = new HashPartitioner(nParts)
    // Adjacency dedups multi-edges per node (a sorted primitive array —
    // cheaper than a corpus-wide DISTINCT exchange, and the sort makes
    // the flatMap's emission order deterministic, though integer sums
    // wouldn't care).
    val adj = e.as[(Long, Long)].rdd
      .groupByKey(part)
      .mapValues(ds => ds.toArray.distinct.sorted)
      .persist(lvl)
    val nodes = graft.Par.nodeSet(e, part).persist(lvl)
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty graph")
    PreparedGraph(e, part, adj, nodes, n)
  }

  /** Per-node (teleport, initial rank), persisted: uniform over all
    * nodes for PageRank, restricted to the in-graph seed set for
    * TrustRank. Partitioned like the adjacency, so each round's final
    * join stays narrow. Caller owns the unpersist. */
  private def teleOf(g: PreparedGraph, seedsOpt: Option[DataFrame],
                     dampingPct: Int)
      : org.apache.spark.rdd.RDD[(Long, (Long, Long))] = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    seedsOpt match {
      case None =>
        val t = Scale * (100L - dampingPct) / 100L / g.n
        val r0 = Scale / g.n
        g.nodes.mapValues(_ => (t, r0)).persist(lvl)
      case Some(seeds) =>
        val spark = seeds.sparkSession
        import spark.implicits._
        val seedRdd = seeds.filter(col(seeds.columns.head).isNotNull)
          .distinct().as[Long].rdd.map(v => (v, ())).partitionBy(g.part)
        val inGraph = g.nodes.join(seedRdd).mapValues(_ => ())
        val s = inGraph.count()
        require(s > 0, "TrustRank needs at least one seed inside the graph")
        val t = Scale * (100L - dampingPct) / 100L / s
        val r0 = Scale / s
        g.nodes.leftOuterJoin(inGraph)
          .mapValues { case (_, m) => if (m.isDefined) (t, r0) else (0L, 0L) }
          .persist(lvl)
    }
  }

  /** The fixed-round rank chain over a prepared graph — one lazy
    * lineage, evaluated when the caller materializes it. */
  private def fixedRanks(g: PreparedGraph,
                         tele: org.apache.spark.rdd.RDD[(Long, (Long, Long))],
                         iterations: Int, dampingPct: Int)
      : org.apache.spark.rdd.RDD[(Long, Long)] = {
    var ranks = tele.mapValues(_._2)
    for (_ <- 1 to iterations)
      ranks = rankRound(g.adj, tele, g.part, dampingPct)(ranks)
    ranks
  }

  private def rankDf(ranks: org.apache.spark.rdd.RDD[(Long, Long)],
                     spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("rank_fp", LongType, nullable = false)))
    spark.createDataFrame(ranks.map { case (v, r) => Row(v, r) }, schema)
  }

  private def iterate(edges: DataFrame, srcCol: String, dstCol: String,
                      seedsOpt: Option[DataFrame],
                      iterations: Int, dampingPct: Int): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val g = prepareGraph(edges, srcCol, dstCol)
    val tele = teleOf(g, seedsOpt, dampingPct)
    val ranks = fixedRanks(g, tele, iterations, dampingPct)
    // Materialize the (node-set-sized, small) result eagerly, then drop
    // every block the iteration pinned: the operator leaves the session
    // as clean as it found it.
    val out = rankDf(ranks, edges.sparkSession)
      .orderBy(col("node"))
      .pinned
    g.unpersistAll()
    tele.unpersist(false)
    out
  }

  /** Tolerance-mode twin of [[iterate]] — identical per-round
    * arithmetic (the bit-identity contract of [[ranksUntil]] rests on
    * this), plus the per-round residual action the data-dependent stop
    * requires. Each round's vector is persisted BEFORE the residual
    * action so the next round's vote join reads blocks instead of
    * re-walking the chain; the round-k vector is unpersisted as soon as
    * round k+1 is materialized (two vectors live at any moment, the
    * power-iteration memory floor). */
  /** The tolerance-stopped rank chain over a prepared graph — returns
    * the PERSISTED final vector (caller unpersists after materializing
    * its result) and the stop round. */
  private def untilRanks(g: PreparedGraph,
                         tele: org.apache.spark.rdd.RDD[(Long, (Long, Long))],
                         tolFp: Long, maxIterations: Int, dampingPct: Int)
      : (org.apache.spark.rdd.RDD[(Long, Long)], Int) = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    var ranks = tele.mapValues(_._2).persist(lvl)
    var stop = maxIterations
    var k = 0
    var converged = false
    while (k < maxIterations && !converged) {
      k += 1
      val prev = ranks
      val next = rankRound(g.adj, tele, g.part, dampingPct)(prev).persist(lvl)
      // The residual action also materializes `next`'s blocks — one
      // evaluation serves both the stop decision and the next round.
      val l1 = next.join(prev)
        .map { case (_, (a, b)) => math.abs(a - b) }.fold(0L)(_ + _)
      prev.unpersist(false)
      ranks = next
      if (l1 < tolFp) { converged = true; stop = k }
    }
    (ranks, stop)
  }

  private def iterateUntil(edges: DataFrame, srcCol: String, dstCol: String,
                           seedsOpt: Option[DataFrame], tolFp: Long,
                           maxIterations: Int, dampingPct: Int)
      : (DataFrame, Int) = {
    require(tolFp >= 0L, "tolFp is a non-negative fixed-point residual")
    require(maxIterations >= 1, "need maxIterations >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val g = prepareGraph(edges, srcCol, dstCol)
    val tele = teleOf(g, seedsOpt, dampingPct)
    val (ranks, stop) = untilRanks(g, tele, tolFp, maxIterations, dampingPct)
    val out = rankDf(ranks, edges.sparkSession)
      .orderBy(col("node"))
      .pinned
    g.unpersistAll()
    tele.unpersist(false); ranks.unpersist(false)
    (out, stop)
  }

  /** F130: convergence residuals for the fixed-iteration contract
    * (`part_pagerank_convergence` query) — every rank operator here runs
    * a FIXED round count ([[ranks]], [[seededRanks]], [[hits]],
    * [[graft.analytics.Lpa]]), defended until now by argument
    * ("converged here"). This emits the per-round L1/L∞ residuals and
    * changed-node counts, so "10 rounds suffice" is a measured decay
    * curve: round k's row is Σ|r_k − r_{k−1}|, max|r_k − r_{k−1}|, and
    * #{v : r_k(v) ≠ r_{k−1}(v)}, all in the same `Scale` fixed-point
    * units as the ranks themselves — integer arithmetic end-to-end, so
    * the full curve hash-matches the oracle's unrolled replay.
    *
    * Execution shape: the [[ranks]] loop plus one narrow co-partitioned
    * join per round (r_k ⋈ r_{k−1}, both hash-partitioned by `part`) —
    * NO extra action per round: per-round delta triples reduce by their
    * round tag and the whole curve materializes in ONE job whose
    * shuffle outputs are shared with the rank chain. Output is
    * `iterations` rows — config-scale, never node-scale. */
  def convergence(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int = 10, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    val spark = edges.sparkSession
    val g = prepareGraph(edges, srcCol, dstCol)
    val (adj, part) = (g.adj, g.part)
    val tele = teleOf(g, None, dampingPct)
    var ranks = tele.mapValues(_._2)
    var deltas = List.empty[org.apache.spark.rdd.RDD[(Long, (Long, Long, Long))]]
    for (k <- 1 to iterations) {
      val prev = ranks
      val next = rankRound(adj, tele, part, dampingPct)(prev)
      deltas ::= next.join(prev).map { case (_, (a, b)) =>
        val d = math.abs(a - b)
        (k.toLong, (d, d, if (d != 0L) 1L else 0L))
      }
      ranks = next
    }
    val curve = spark.sparkContext.union(deltas.reverse)
      .reduceByKey((a, b) => (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3))
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("l1_delta_fp", LongType, nullable = false),
      StructField("linf_delta_fp", LongType, nullable = false),
      StructField("n_changed", LongType, nullable = false)))
    val out = spark.createDataFrame(
        curve.map { case (k, (s, m, c)) => Row(k, s, m, c) }, schema)
      .orderBy(col("round"))
      .pinned
    g.unpersistAll()
    tele.unpersist(false)
    out
  }

  /** [EXT] Spam mass (Gyöngyi et al. 2006, `trust_propagation` query):
    * how much of a node's PageRank is NOT accounted for by trust flowing
    * from the seed set. Both rank vectors carry total mass ≈ `Scale`
    * (matched teleport totals), so the comparison is direct:
    * spam_mass_ppm = max(0, pr − tr)·10⁶ ∕ pr in integer parts-per-
    * million — near 10⁶ means the node's rank comes almost entirely from
    * outside the trusted neighborhood (the spam signal); trusted hubs
    * sit near 0. Long arithmetic end-to-end (pr ≤ Scale = 10¹², ×10⁶
    * stays far under Long.Max), bit-identical in the oracle.
    *
    * This fixed-round face is the ORACLE twin (an unrolled SQL chain
    * needs a static round count); the production default is
    * [[spamMassUntil]], whose two chains each stop on their own
    * measured residual curve (r14, the r13 verdict's #2). */
  def spamMass(edges: DataFrame, srcCol: String, dstCol: String,
               seeds: DataFrame, seedCol: String,
               iterations: Int = 10, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    // Both rank vectors iterate over the same graph — prepare it ONCE
    // (r16): the former shape pinned the edge derivation and then called
    // ranks()/seededRanks() back-to-back, each rebuilding the edge
    // persist, the adjacency groupByKey and the node-set shuffle over
    // the same pinned edges (guide §2.4 — the two chains share every
    // piece of that state; only their teleport vectors differ).
    // prepareGraph's own persist now materializes the derivation once,
    // so the former extra localCheckpoint pass is gone too.
    val g = prepareGraph(edges.select(col(srcCol), col(dstCol)),
      srcCol, dstCol)
    val telePr = teleOf(g, None, dampingPct)
    val teleTr = teleOf(g,
      Some(seeds.select(col(seedCol).cast("long"))), dampingPct)
    val pr = rankDf(fixedRanks(g, telePr, iterations, dampingPct),
      edges.sparkSession).pinned
    val tr = rankDf(fixedRanks(g, teleTr, iterations, dampingPct),
      edges.sparkSession).pinned
    g.unpersistAll()
    telePr.unpersist(false); teleTr.unpersist(false)
    pr.select(col("node"), col("rank_fp").as("pr_fp"))
      .join(tr.select(col("node"), col("rank_fp").as("tr_fp")), Seq("node"))
      // DIV, not `/`: Spark's `/` on longs is double division — the
      // truncating integer quotient is what the oracle replays.
      .withColumn("spam_mass_ppm",
        expr("CASE WHEN pr_fp > 0 THEN " +
          "greatest(pr_fp - tr_fp, 0L) * 1000000L DIV pr_fp ELSE 0L END"))
      .orderBy(col("node"))
  }

  /** PRODUCTION face of the spam-mass triple (r14, the r13 verdict's
    * #2): both rank vectors tolerance-stopped, each on its OWN residual
    * curve (open PageRank spreads mass everywhere, seeded trust
    * concentrates — they decay at different rates, so the two stop
    * rounds are independent). Defaults from the measured F130/F137
    * curves: tolFp = 10⁶ fp units = one millionth of either vector's
    * total mass — the family tolerance every earlystop oracle pins;
    * `maxIterations` is a safety rail. Output (node, pr_fp, tr_fp,
    * spam_mass_ppm, pr_stop, tr_stop); each vector is BIT-identical to
    * its fixed-round twin at `iterations = *_stop` (the shared
    * [[rankRound]] body). Fixed-round twin: [[spamMass]]. */
  def spamMassUntil(edges: DataFrame, srcCol: String, dstCol: String,
                    seeds: DataFrame, seedCol: String,
                    tolFp: Long = 1000000L, maxIterations: Int = 50,
                    dampingPct: Int = 85): DataFrame = {
    require(tolFp >= 0L, "tolFp is a non-negative fixed-point residual")
    require(maxIterations >= 1, "need maxIterations >= 1")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct is a percentage")
    // Both rank vectors iterate over the same graph — prepare it once
    // for both tolerance chains (r16, see [[spamMass]]).
    val g = prepareGraph(edges.select(col(srcCol), col(dstCol)),
      srcCol, dstCol)
    val telePr = teleOf(g, None, dampingPct)
    val teleTr = teleOf(g,
      Some(seeds.select(col(seedCol).cast("long"))), dampingPct)
    val (prR, kPr) = untilRanks(g, telePr, tolFp, maxIterations, dampingPct)
    val pr = rankDf(prR, edges.sparkSession).pinned
    val (trR, kTr) = untilRanks(g, teleTr, tolFp, maxIterations, dampingPct)
    val tr = rankDf(trR, edges.sparkSession).pinned
    g.unpersistAll()
    telePr.unpersist(false); teleTr.unpersist(false)
    prR.unpersist(false); trR.unpersist(false)
    pr.select(col("node"), col("rank_fp").as("pr_fp"))
      .join(tr.select(col("node"), col("rank_fp").as("tr_fp")), Seq("node"))
      // DIV, not `/`: Spark's `/` on longs is double division — the
      // truncating integer quotient is what the oracle replays.
      .withColumn("spam_mass_ppm",
        expr("CASE WHEN pr_fp > 0 THEN " +
          "greatest(pr_fp - tr_fp, 0L) * 1000000L DIV pr_fp ELSE 0L END"))
      .select(col("node"), col("pr_fp"), col("tr_fp"),
        col("spam_mass_ppm"),
        lit(kPr.toLong).as("pr_stop"), lit(kTr.toLong).as("tr_stop"))
      .orderBy(col("node"))
  }

  /** [EXT] HITS hubs & authorities (Kleinberg 1999) in the same
    * integer fixed-point discipline as [[ranks]] — the OTHER classic
    * link-analysis pair next to PageRank/TrustRank: authority(v) =
    * Σ hub(u) over in-edges u→v, hub(u) = Σ auth(v) over out-edges,
    * each vector L1-normalized to `Scale` after its half-step (the
    * sum-normalized HITS variant — rankings are normalization-
    * invariant, and an L1 step is exact integer arithmetic where L2
    * would need a square root). The normalizing multiply x·Scale runs
    * in BigInt (x ≤ ΣX can exceed Long·Scale) and floors — DuckDB's
    * HUGEINT `//` replays it exactly, so the query carries a full
    * oracle like the rest of the rank family.
    *
    * Same execution shape as [[ranks]]: adjacency hash-partitioned
    * once, one exchange per half-step; the per-half-step L1 total is
    * one action over the node-set-sized vector. On a SYMMETRIC graph
    * hub == auth every round (each half-step sees identical
    * neighborhoods) — run it on a DIRECTED graph, e.g. the bipartite
    * order→part projection ([[orderPartHits]]). */
  /** ONE HITS half-step over the prepared graph — the raw-sum /
    * L1-total / BigInt-normalize arithmetic shared STRUCTURALLY by
    * [[hits]], [[hitsConvergence]] and [[hitsUntil]] (r13 review: the
    * bit-identity contracts hold by construction). Returns (raw sums —
    * persisted, the caller owns the drop —, normalized vector — LAZY;
    * tolerance callers persist it themselves). The total is one action
    * over the persisted raw frame. */
  private def hitsHalfStep(nodes: org.apache.spark.rdd.RDD[(Long, Unit)],
                           part: HashPartitioner, lvl: StorageLevel)(
                           vec: org.apache.spark.rdd.RDD[(Long, Long)],
                           along: org.apache.spark.rdd.RDD[(Long, Array[Long])])
      : (org.apache.spark.rdd.RDD[(Long, Long)],
         org.apache.spark.rdd.RDD[(Long, Long)]) = {
    val raw = along.join(vec)
      .flatMap { case (_, (outs, x)) =>
        if (x == 0L) Iterator.empty else outs.iterator.map(d => (d, x))
      }
      .reduceByKey(part, _ + _)
      .persist(lvl)
    val total = raw.map(_._2).fold(0L)(_ + _)
    val normed = nodes.leftOuterJoin(raw).mapValues { case (_, o) =>
      val x = o.getOrElse(0L)
      if (total == 0L || x == 0L) 0L
      else (BigInt(x) * Scale / total).toLong
    }
    (raw, normed)
  }

  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(lvl)
    val nParts = graft.Par.graphParts(e, e.count())
    val part = new HashPartitioner(nParts)
    val adj = e.as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val radj = e.select(col("dst"), col("src")).as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val nodes = graft.Par.nodeSet(e, part).persist(lvl)
    val n = nodes.count()
    require(n > 0, "HITS needs a non-empty graph")
    // Each half-step takes an ACTION (the L1 total), so unlike [[ranks]]
    // — one lineage, one evaluation — the raw sums MUST be persisted:
    // an unpersisted chain would recompute every earlier round at every
    // total, O(iterations²) passes. One action per half-step (the
    // fold); the normalized vector itself stays lazy — the NEXT step's
    // fold evaluates it once from the persisted raw frame. Blocks drop
    // in one sweep at the end (they are node-set-sized, tiny next to
    // the corpus).
    val pinnedRaws = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, Long)]]
    def halfStep(vec: org.apache.spark.rdd.RDD[(Long, Long)],
                 along: org.apache.spark.rdd.RDD[(Long, Array[Long])])
        : org.apache.spark.rdd.RDD[(Long, Long)] = {
      val (raw, normed) = hitsHalfStep(nodes, part, lvl)(vec, along)
      pinnedRaws += raw
      normed
    }
    var hub = nodes.mapValues(_ => Scale / n)
    var auth = hub
    for (_ <- 1 to iterations) {
      auth = halfStep(hub, adj)   // auth(v) = Σ hub over in-edges
      hub = halfStep(auth, radj)  // hub(u) = Σ auth over out-edges
    }
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("hub_fp", LongType, nullable = false),
      StructField("auth_fp", LongType, nullable = false)))
    val out = spark.createDataFrame(
        hub.join(auth).map { case (v, (h, a)) => Row(v, h, a) }, schema)
      .orderBy(col("node"))
      .pinned
    e.unpersist(false); adj.unpersist(false); radj.unpersist(false)
    nodes.unpersist(false); pinnedRaws.foreach(_.unpersist(false))
    out
  }

  /** [EXT] Convergence-driven early stop for HITS (r13): iterate until
    * the round's COMBINED L1 residual — Σ|h_k − h_{k−1}| +
    * Σ|a_k − a_{k−1}| over the normalized vectors, the two columns the
    * F136 curve measures — drops below `tolFp`, or `maxIterations`.
    * Returns ((node, hub_fp, auth_fp), stop round), bit-identical to
    * `hits(iterations = stop)` (spec-pinned): the half-step arithmetic
    * is the same code, and the delta joins are read-only over the
    * persisted normalized vectors. HITS already pays one action per
    * half-step for its L1 normalization totals, so the stop adds only
    * the two narrow node-scale delta sums per round. */
  def hitsUntil(edges: DataFrame, srcCol: String, dstCol: String,
                tolFp: Long, maxIterations: Int = 50): (DataFrame, Int) = {
    require(tolFp >= 0L, "tolFp is a non-negative fixed-point residual")
    require(maxIterations >= 1, "need maxIterations >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(lvl)
    val nParts = graft.Par.graphParts(e, e.count())
    val part = new HashPartitioner(nParts)
    val adj = e.as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val radj = e.select(col("dst"), col("src")).as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val nodes = graft.Par.nodeSet(e, part).persist(lvl)
    val n = nodes.count()
    require(n > 0, "HITS needs a non-empty graph")
    // Tolerance mode persists each round's NORMALIZED vectors (the
    // delta joins and the next half-step both read them) and drops the
    // previous round's blocks as soon as the round's residual actions
    // complete — like [[iterateUntil]], only the current pair stays
    // live (r13 review: the former keep-everything pin grew by four
    // node-vectors per round to function exit).
    var hub = nodes.mapValues(_ => Scale / n).persist(lvl)
    var auth = hub
    var stop = maxIterations
    var k = 0
    var converged = false
    while (k < maxIterations && !converged) {
      k += 1
      val prevHub = hub
      val prevAuth = auth
      val (rawA, auth0) = hitsHalfStep(nodes, part, lvl)(hub, adj)
      auth = auth0.persist(lvl)
      val (rawH, hub0) = hitsHalfStep(nodes, part, lvl)(auth, radj)
      hub = hub0.persist(lvl)
      val dh = hub.join(prevHub)
        .map { case (_, (a, b)) => math.abs(a - b) }.fold(0L)(_ + _)
      val da = auth.join(prevAuth)
        .map { case (_, (a, b)) => math.abs(a - b) }.fold(0L)(_ + _)
      // the folds materialized this round's normed blocks — raws and
      // the previous vectors are no longer needed (round 1's prevAuth
      // IS prevHub; the duplicate unpersist is a no-op)
      rawA.unpersist(false); rawH.unpersist(false)
      prevHub.unpersist(false); prevAuth.unpersist(false)
      if (dh + da < tolFp) { converged = true; stop = k }
    }
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("hub_fp", LongType, nullable = false),
      StructField("auth_fp", LongType, nullable = false)))
    val out = spark.createDataFrame(
        hub.join(auth).map { case (v, (h, a)) => Row(v, h, a) }, schema)
      .orderBy(col("node"))
      .pinned
    e.unpersist(false); adj.unpersist(false); radj.unpersist(false)
    nodes.unpersist(false); hub.unpersist(false); auth.unpersist(false)
    (out, stop)
  }

  /** F136: HITS convergence residuals (`order_part_hits_convergence`) —
    * the [[convergence]] contract for the double half-step: per round,
    * L1 deltas of BOTH normalized vectors (hub and authority, in the
    * same `Scale` fixed-point units), so the registered 5-round choice
    * is a measured decay curve across all three iterative families
    * (rank F130, labels F135, HITS here). Same loop as [[hits]] — the
    * per-half-step L1-total actions and raw-persist discipline are
    * inherited — plus one narrow co-partitioned delta join per vector
    * per round; the delta triples reduce by round tag in ONE final job
    * over the persisted raws. Output is `iterations` rows. Round 1's
    * authority delta is measured against the uniform start (hub and
    * auth begin equal), mirroring the oracle's h0 join. */
  def hitsConvergence(edges: DataFrame, srcCol: String, dstCol: String,
                      iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "need iterations >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(lvl)
    val nParts = graft.Par.graphParts(e, e.count())
    val part = new HashPartitioner(nParts)
    val adj = e.as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val radj = e.select(col("dst"), col("src")).as[(Long, Long)].rdd
      .groupByKey(part).mapValues(_.toArray.distinct.sorted).persist(lvl)
    val nodes = graft.Par.nodeSet(e, part).persist(lvl)
    val n = nodes.count()
    require(n > 0, "HITS needs a non-empty graph")
    val pinnedRaws = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[(Long, Long)]]
    def halfStep(vec: org.apache.spark.rdd.RDD[(Long, Long)],
                 along: org.apache.spark.rdd.RDD[(Long, Array[Long])])
        : org.apache.spark.rdd.RDD[(Long, Long)] = {
      val (raw, normed) = hitsHalfStep(nodes, part, lvl)(vec, along)
      pinnedRaws += raw
      normed
    }
    var hub = nodes.mapValues(_ => Scale / n)
    var auth = hub
    var deltas = List.empty[org.apache.spark.rdd.RDD[(Long, (Long, Long))]]
    for (k <- 1 to iterations) {
      val prevHub = hub
      val prevAuth = auth
      auth = halfStep(hub, adj)
      hub = halfStep(auth, radj)
      val dh = hub.join(prevHub).map { case (_, (a, b)) =>
        (k.toLong, (math.abs(a - b), 0L))
      }
      val da = auth.join(prevAuth).map { case (_, (a, b)) =>
        (k.toLong, (0L, math.abs(a - b)))
      }
      deltas = da :: dh :: deltas
    }
    val curve = spark.sparkContext.union(deltas.reverse)
      .reduceByKey((x, y) => (x._1 + y._1, x._2 + y._2))
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("l1_hub_delta_fp", LongType, nullable = false),
      StructField("l1_auth_delta_fp", LongType, nullable = false)))
    val out = spark.createDataFrame(
        curve.map { case (k, (h, a)) => Row(k, h, a) }, schema)
      .orderBy(col("round"))
      .pinned
    e.unpersist(false); adj.unpersist(false); radj.unpersist(false)
    nodes.unpersist(false); pinnedRaws.foreach(_.unpersist(false))
    out
  }

  /** [[hitsConvergence]] on the standing order→part bipartite fixture
    * (the [[orderPartHits]] 2k/2k+1 encoding). */
  def orderPartHitsConvergence(lineitem: DataFrame,
                               iterations: Int = 10): DataFrame =
    hitsConvergence(graft.Par.widen(lineitem)
        .select((col("l_orderkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst")),
        "src", "dst", iterations)

  /** `order_part_hits_earlystop` query (r13): [[hitsUntil]] on the
    * standing bipartite fixture — the F136 curve put to work. The
    * default tolerance (3·10⁹ fp units combined hub+auth residual,
    * ~0.3% of the two Scale-normalized masses) is crossed at round 5 of
    * the 8-round budget on the measured curve. Output decodes like
    * [[orderPartHits]] plus the stop round; oracle derives the stop
    * from the same combined-residual rule over the unrolled chain. */
  def orderPartHitsEarlyStop(lineitem: DataFrame,
                             tolFp: Long = 3000000000L,
                             maxIterations: Int = 8): DataFrame = {
    val (df, stop) = hitsUntil(graft.Par.widen(lineitem)
        .select((col("l_orderkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst")),
        "src", "dst", tolFp, maxIterations)
    df.select(
        when(col("node") % 2 === 0, "order").otherwise("part").as("kind"),
        expr("node DIV 2").as("id"), col("hub_fp"), col("auth_fp"),
        lit(stop.toLong).as("stop_round"))
      .orderBy(col("kind"), col("id"))
  }

  /** `order_part_hits` query: HITS on the DIRECTED bipartite
    * order→part graph — orders are pure hubs (good baskets point at
    * good parts), parts pure authorities. The two id spaces interleave
    * via the reversible 2k / 2k+1 encoding so they can never collide;
    * the output decodes. */
  def orderPartHits(lineitem: DataFrame, iterations: Int = 10): DataFrame =
    hits(graft.Par.widen(lineitem)
        .select((col("l_orderkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst")),
        "src", "dst", iterations)
      .select(
        when(col("node") % 2 === 0, "order").otherwise("part").as("kind"),
        expr("node DIV 2").as("id"), col("hub_fp"), col("auth_fp"))
      .orderBy(col("kind"), col("id"))

  /** DuckDB mirror of [[orderPartHits]]: the double half-step unrolls
    * into one CTE chain per round (raw sum → L1 total → normalized
    * vector, HUGEINT `//` replaying the BigInt floor). Every CTE is
    * `AS MATERIALIZED`: per round, the raw-sum and vector CTEs are
    * each referenced TWICE (total + normalize; join + next round), and
    * DuckDB's default inlining would expand the reference tree
    * 2^iterations-fold — observed as an fd-exhaustion storm of
    * re-opened parquet scans, not just slowness. */
  def sqlOrderPartHits(iterations: Int = 10): String = {
    val iters = (1 to iterations).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS v, SUM(h.r) AS s
         |  FROM e JOIN h${k - 1} h ON e.src = h.v WHERE h.r > 0 GROUP BY 1),
         |at$k AS MATERIALIZED (SELECT SUM(s) AS t FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(ar.s, 0) = 0
         |      THEN 0 ELSE ar.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN at$k t LEFT JOIN ar$k ar ON n.v = ar.v),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS v, SUM(a.r) AS s
         |  FROM e JOIN a$k a ON e.dst = a.v WHERE a.r > 0 GROUP BY 1),
         |ht$k AS MATERIALIZED (SELECT SUM(s) AS t FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(hr.s, 0) = 0
         |      THEN 0 ELSE hr.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN ht$k t LEFT JOIN hr$k hr ON n.v = hr.v)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM lineitem),
       |nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT v, CAST($Scale // n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT CASE WHEN n.v % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
       |  CAST(n.v // 2 AS BIGINT) AS id, h.r AS hub_fp, a.r AS auth_fp
       |FROM nodes n JOIN h$iterations h ON n.v = h.v
       |     JOIN a$iterations a ON n.v = a.v
       |ORDER BY kind, id""".stripMargin
  }

  /** DuckDB mirror of [[orderPartHitsConvergence]]: the
    * [[sqlOrderPartHits]] chain (all CTEs MATERIALIZED — the extra
    * delta references would otherwise compound the 2^iterations
    * inlining), then one L1-delta aggregate per round for each vector;
    * round 1's authority delta joins h0 (the shared uniform start). */
  def sqlOrderPartHitsConvergence(iterations: Int = 10): String = {
    val iters = (1 to iterations).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS v, SUM(h.r) AS s
         |  FROM e JOIN h${k - 1} h ON e.src = h.v WHERE h.r > 0 GROUP BY 1),
         |at$k AS MATERIALIZED (SELECT SUM(s) AS t FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(ar.s, 0) = 0
         |      THEN 0 ELSE ar.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN at$k t LEFT JOIN ar$k ar ON n.v = ar.v),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS v, SUM(a.r) AS s
         |  FROM e JOIN a$k a ON e.dst = a.v WHERE a.r > 0 GROUP BY 1),
         |ht$k AS MATERIALIZED (SELECT SUM(s) AS t FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(hr.s, 0) = 0
         |      THEN 0 ELSE hr.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN ht$k t LEFT JOIN hr$k hr ON n.v = hr.v)"""
        .stripMargin
    }.mkString(",\n")
    val curve = (1 to iterations).map { k =>
      val prevA = if (k == 1) "h0" else s"a${k - 1}"
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  (SELECT CAST(SUM(ABS(x.r - y.r)) AS BIGINT)
         |   FROM h$k x JOIN h${k - 1} y ON x.v = y.v) AS l1_hub_delta_fp,
         |  (SELECT CAST(SUM(ABS(x.r - y.r)) AS BIGINT)
         |   FROM a$k x JOIN $prevA y ON x.v = y.v) AS l1_auth_delta_fp"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM lineitem),
       |nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT v, CAST($Scale // n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iters
       |$curve
       |ORDER BY round""".stripMargin
  }

  /** DuckDB mirror of [[orderPartHitsEarlyStop]]: the
    * [[sqlOrderPartHits]] chain to the round budget (all MATERIALIZED),
    * the combined hub+auth residual per round (round 1's authority
    * delta joins h0, the shared uniform start — the engine's
    * `auth = hub` initialization), the stop round, and a CASE over the
    * per-round vector pairs. */
  def sqlOrderPartHitsEarlyStop(tolFp: Long = 3000000000L,
                                maxIterations: Int = 8): String = {
    val iters = (1 to maxIterations).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS v, SUM(h.r) AS s
         |  FROM e JOIN h${k - 1} h ON e.src = h.v WHERE h.r > 0 GROUP BY 1),
         |at$k AS MATERIALIZED (SELECT SUM(s) AS t FROM ar$k),
         |a$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(ar.s, 0) = 0
         |      THEN 0 ELSE ar.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN at$k t LEFT JOIN ar$k ar ON n.v = ar.v),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS v, SUM(a.r) AS s
         |  FROM e JOIN a$k a ON e.dst = a.v WHERE a.r > 0 GROUP BY 1),
         |ht$k AS MATERIALIZED (SELECT SUM(s) AS t FROM hr$k),
         |h$k AS MATERIALIZED (
         |  SELECT n.v,
         |    CAST(CASE WHEN COALESCE(t.t, 0) = 0 OR COALESCE(hr.s, 0) = 0
         |      THEN 0 ELSE hr.s::HUGEINT * $Scale // t.t END AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN ht$k t LEFT JOIN hr$k hr ON n.v = hr.v)"""
        .stripMargin
    }.mkString(",\n")
    val curve = (1 to maxIterations).map { k =>
      val prevA = if (k == 1) "h0" else s"a${k - 1}"
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  (SELECT CAST(SUM(ABS(x.r - y.r)) AS BIGINT)
         |   FROM h$k x JOIN h${k - 1} y ON x.v = y.v) +
         |  (SELECT CAST(SUM(ABS(x.r - y.r)) AS BIGINT)
         |   FROM a$k x JOIN $prevA y ON x.v = y.v) AS l1""".stripMargin
    }.mkString("\nUNION ALL\n")
    val hubCases = (1 to maxIterations).map(k => s"WHEN $k THEN xh$k.r").mkString(" ")
    val authCases = (1 to maxIterations).map(k => s"WHEN $k THEN xa$k.r").mkString(" ")
    val joins = (1 to maxIterations)
      .map(k => s"JOIN h$k xh$k ON n.v = xh$k.v JOIN a$k xa$k ON n.v = xa$k.v")
      .mkString("\n|")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM lineitem),
       |nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |h0 AS MATERIALIZED (SELECT v, CAST($Scale // n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iters,
       |curve AS ($curve),
       |stopr AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM curve WHERE l1 < $tolFp)
       |SELECT CASE WHEN n.v % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
       |  CAST(n.v // 2 AS BIGINT) AS id,
       |  CAST(CASE stopr.k $hubCases END AS BIGINT) AS hub_fp,
       |  CAST(CASE stopr.k $authCases END AS BIGINT) AS auth_fp,
       |  stopr.k AS stop_round
       |FROM nodes n CROSS JOIN stopr
       |$joins
       |ORDER BY kind, id""".stripMargin
  }

  /** Co-purchase part graph: parts sharing an order are linked (both
    * directions) — the symmetric projection of the order–part bipartite
    * graph. ONE exchange keyed by the order: `collect_set` gathers each
    * order's distinct parts, then the pair fan-out is a per-row double
    * explode — measured ~3× cheaper than the equivalent self-join, which
    * paid a distinct + sort-merge + corpus-wide distinct. Per-order
    * fan-out is quadratic in the order's DISTINCT part count, which
    * TPC-H-style data bounds at a handful. Cross-order duplicate pairs
    * are left in (deduplicated per node inside [[ranks]]). */
  def copurchaseEdges(lineitem: DataFrame): DataFrame = {
    val byOrder = graft.Par.widen(lineitem)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .filter(size(col("ps")) >= 2)
    byOrder
      .select(explode(col("ps")).as("s"), col("ps"))
      .select(col("s"), explode(col("ps")).as("d"))
      .filter(col("s") =!= col("d"))
      .select(col("s").cast("long").as("src"), col("d").cast("long").as("dst"))
  }

  /** `part_pagerank` query: centrality of parts in the co-purchase
    * graph — (part_id, rank_fp). */
  def copurchaseParts(lineitem: DataFrame, iterations: Int = 10): DataFrame =
    ranks(copurchaseEdges(lineitem), "src", "dst", iterations)
      .select(col("node").as("part_id"), col("rank_fp"))

  /** `part_pagerank_convergence` query: [[convergence]] residual curve
    * on the standing co-purchase graph fixture. */
  def copurchaseConvergence(lineitem: DataFrame,
                            iterations: Int = 10): DataFrame =
    convergence(copurchaseEdges(lineitem), "src", "dst", iterations)

  /** `part_pagerank_earlystop` query (r13): [[ranksUntil]] on the
    * standing co-purchase fixture — the F130 curve put to work. The
    * default tolerance (10⁶ fp units = one millionth of the total rank
    * mass) is crossed at round 7 of the registered 10 on the measured
    * curve, so the loop ships three rounds early with a sub-tolerance
    * residual. Output: (part_id, rank_fp, stop_round) — both the
    * early-stopped VECTOR and the data-dependent stop round are
    * hash-checked: the oracle replays the unrolled chain, derives the
    * stop round from the same residual rule, and selects that round's
    * vector. */
  def copurchaseEarlyStop(lineitem: DataFrame, tolFp: Long = 1000000L,
                          maxIterations: Int = 10): DataFrame = {
    val (df, stop) = ranksUntil(copurchaseEdges(lineitem), "src", "dst",
      tolFp, maxIterations)
    df.select(col("node").as("part_id"), col("rank_fp"),
      lit(stop.toLong).as("stop_round"))
  }

  /** `trust_propagation` query: PageRank vs TrustRank vs spam mass on
    * the co-purchase part graph, seeds = part ids ≡ 0 (mod seedMod) —
    * the host-graph anti-spam triple demonstrated on the repo's standing
    * graph fixture. Output: (part_id, pr_fp, tr_fp, spam_mass_ppm). */
  def copurchaseSpamMass(lineitem: DataFrame, seedMod: Int = 50,
                         iterations: Int = 10): DataFrame = {
    val edges = copurchaseEdges(lineitem)
    val seeds = lineitem.select(col("l_partkey").cast("long").as("v"))
      .filter(col("v") % seedMod === 0).distinct()
    spamMass(edges, "src", "dst", seeds, "v", iterations)
      .select(col("node").as("part_id"), col("pr_fp"), col("tr_fp"),
        col("spam_mass_ppm"))
  }

  /** `trust_propagation_earlystop` query (r13): the spam-mass triple
    * with BOTH rank vectors tolerance-stopped — F137 completed across
    * the fourth iterative family at query level. Each loop stops on its
    * OWN residual curve (the two decay at different rates: open
    * PageRank spreads mass everywhere, seeded trust concentrates), so
    * the output carries two independent data-dependent stop rounds,
    * both derived by the oracle from the same rules over the two
    * unrolled chains. The ppm division runs on the early-stopped
    * vectors — the production composition a tolerance-mode deployment
    * would ship. */
  def copurchaseSpamMassEarlyStop(lineitem: DataFrame,
                                  tolFp: Long = 1000000L,
                                  maxIterations: Int = 10,
                                  seedMod: Int = 50): DataFrame = {
    val seeds = lineitem.select(col("l_partkey").cast("long").as("v"))
      .filter(col("v") % seedMod === 0).distinct()
    spamMassUntil(copurchaseEdges(lineitem), "src", "dst", seeds, "v",
        tolFp, maxIterations)
      .select(col("node").as("part_id"), col("pr_fp"), col("tr_fp"),
        col("spam_mass_ppm"), col("pr_stop"), col("tr_stop"))
      .orderBy(col("part_id"))
  }

  /** DuckDB mirror of [[copurchaseSpamMassEarlyStop]]: both unrolled
    * chains MATERIALIZED (each round frame now has three readers), one
    * residual curve and stop round PER chain, CASE-selected vectors,
    * then the same ppm division. */
  def sqlCopurchaseSpamMassEarlyStop(tolFp: Long = 1000000L,
                                     maxIterations: Int = 10,
                                     seedMod: Int = 50,
                                     dampingPct: Int = 85): String = {
    def chain(pfx: String, teleExpr: String): String =
      (1 to maxIterations).map { k =>
        s"""$pfx$k AS MATERIALIZED (
           |  SELECT n.v AS v, CAST($teleExpr + COALESCE(c.s, 0) AS BIGINT) AS r
           |  FROM nodes n $teleJoins LEFT JOIN (
           |    SELECT e.dst AS v,
           |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
           |    FROM e JOIN $pfx${k - 1} r ON e.src = r.v JOIN deg dg ON dg.src = e.src
           |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
      }.mkString(",\n")
    def curve(pfx: String): String =
      (1 to maxIterations).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS round,
           |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1
           |FROM $pfx$k a JOIN $pfx${k - 1} b ON a.v = b.v""".stripMargin
      }.mkString("\nUNION ALL\n")
    def cases(pfx: String, stop: String): String =
      s"CASE $stop.k " +
        (1 to maxIterations).map(k => s"WHEN $k THEN x$pfx$k.r").mkString(" ") +
        " END"
    def joins(pfx: String): String =
      (1 to maxIterations)
        .map(k => s"JOIN $pfx$k x$pfx$k ON n.v = x$pfx$k.v").mkString("\n|")
    s"""WITH ${sqlGraphCtes(dampingPct)},
       |seeds AS (SELECT v FROM nodes WHERE v % $seedMod = 0),
       |ns AS (SELECT COUNT(*) AS n FROM seeds),
       |stp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM ns),
       |r0 AS MATERIALIZED (
       |  SELECT v, CAST($Scale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |t0 AS MATERIALIZED (
       |  SELECT n.v,
       |    CAST(CASE WHEN s.v IS NOT NULL THEN $Scale // ns.n ELSE 0 END AS BIGINT) AS r
       |  FROM nodes n CROSS JOIN ns LEFT JOIN seeds s ON n.v = s.v),
       |${chain("r", "tp.t")},
       |${chain("t", "CASE WHEN s.v IS NOT NULL THEN stp.t ELSE 0 END")},
       |cr AS (${curve("r")}),
       |ct AS (${curve("t")}),
       |stopr AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM cr WHERE l1 < $tolFp),
       |stopt AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM ct WHERE l1 < $tolFp),
       |pick AS (
       |  SELECT n.v AS part_id,
       |    CAST(${cases("r", "stopr")} AS BIGINT) AS pr_fp,
       |    CAST(${cases("t", "stopt")} AS BIGINT) AS tr_fp,
       |    stopr.k AS pr_stop, stopt.k AS tr_stop
       |  FROM nodes n CROSS JOIN stopr CROSS JOIN stopt
       |${joins("r")}
       |${joins("t")})
       |SELECT part_id, pr_fp, tr_fp,
       |  CAST(CASE WHEN pr_fp > 0
       |    THEN greatest(pr_fp - tr_fp, 0) * 1000000 // pr_fp ELSE 0 END AS BIGINT)
       |    AS spam_mass_ppm,
       |  pr_stop, tr_stop
       |FROM pick
       |ORDER BY part_id""".stripMargin
  }

  /** Shared graph CTEs for the co-purchase oracles (li, e, deg, nodes,
    * nn, tp). */
  private def sqlGraphCtes(dampingPct: Int): String =
    s"""li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.p AS src, b.p AS dst
       |  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS v FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |tp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM nn)""".stripMargin

  /** One unrolled iteration chain `<pfx>1..<pfx>iterations` over a base
    * CTE `<pfx>0`: per-node rank = its teleport + the damped in-neighbor
    * contribution sum, exact long divisions. `teleExpr` references n
    * (node alias) and may reference seeds/stp. */
  private def sqlIterChain(pfx: String, teleExpr: String, iterations: Int,
                           dampingPct: Int): String =
    (1 to iterations).map { k =>
      s"""$pfx$k AS (
         |  SELECT n.v AS v, CAST($teleExpr + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n $teleJoins LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM e JOIN $pfx${k - 1} r ON e.src = r.v JOIN deg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")

  // Every chain row needs the uniform teleport (tp), and the trust chain
  // additionally probes seed membership (seeds, stp) — joining all three
  // in both chains keeps the builder uniform; the PageRank chain's
  // tele-expr simply ignores the seed columns.
  private val teleJoins =
    "CROSS JOIN tp CROSS JOIN stp LEFT JOIN seeds s ON n.v = s.v"

  /** DuckDB mirror of [[copurchaseSpamMass]]: TWO unrolled chains (r* =
    * PageRank, t* = TrustRank with teleport and initial mass restricted
    * to seeds) over the shared graph CTEs, then the same ppm division. */
  def sqlCopurchaseSpamMass(seedMod: Int = 50, iterations: Int = 10,
                            dampingPct: Int = 85): String = {
    s"""WITH ${sqlGraphCtes(dampingPct)},
       |seeds AS (SELECT v FROM nodes WHERE v % $seedMod = 0),
       |ns AS (SELECT COUNT(*) AS n FROM seeds),
       |stp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM ns),
       |r0 AS (SELECT v, CAST($Scale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |t0 AS (
       |  SELECT n.v,
       |    CAST(CASE WHEN s.v IS NOT NULL THEN $Scale // ns.n ELSE 0 END AS BIGINT) AS r
       |  FROM nodes n CROSS JOIN ns LEFT JOIN seeds s ON n.v = s.v),
       |${sqlIterChain("r", "tp.t", iterations, dampingPct)},
       |${sqlIterChain("t", "CASE WHEN s.v IS NOT NULL THEN stp.t ELSE 0 END", iterations, dampingPct)}
       |SELECT pr.v AS part_id, pr.r AS pr_fp, tr.r AS tr_fp,
       |  CAST(CASE WHEN pr.r > 0
       |    THEN greatest(pr.r - tr.r, 0) * 1000000 // pr.r ELSE 0 END AS BIGINT)
       |    AS spam_mass_ppm
       |FROM r$iterations pr JOIN t$iterations tr ON pr.v = tr.v
       |ORDER BY part_id""".stripMargin
  }

  /** DuckDB mirror of [[copurchaseConvergence]]: the
    * [[sqlCopurchaseParts]] chain, then one delta aggregate per
    * consecutive round pair, UNION ALL'd into the curve. Same exact
    * long divisions; ABS/MAX/SUM over BIGINTs replay bit-identically. */
  def sqlCopurchaseConvergence(iterations: Int = 10,
                               dampingPct: Int = 85): String = {
    val iters = (1 to iterations).map { k =>
      s"""r$k AS (
         |  SELECT n.v AS v, CAST(tp.t + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN tp LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM e JOIN r${k - 1} r ON e.src = r.v JOIN deg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")
    val curve = (1 to iterations).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1_delta_fp,
         |  CAST(MAX(ABS(a.r - b.r)) AS BIGINT) AS linf_delta_fp,
         |  CAST(SUM(CASE WHEN a.r <> b.r THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
         |FROM r$k a JOIN r${k - 1} b ON a.v = b.v""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.p AS src, b.p AS dst
       |  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS v FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |tp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM nn),
       |r0 AS (SELECT v, CAST($Scale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |$iters
       |$curve
       |ORDER BY round""".stripMargin
  }

  /** DuckDB mirror of [[copurchaseParts]]: the iteration unrolls into a
    * WITH-chain (one CTE per round) replaying the exact long divisions —
    * `//` floors and all quantities are non-negative, so it agrees with
    * the JVM's truncating division everywhere. */
  def sqlCopurchaseParts(iterations: Int = 10, dampingPct: Int = 85): String = {
    val iters = (1 to iterations).map { k =>
      s"""r$k AS (
         |  SELECT n.v AS v, CAST(tp.t + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN tp LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM e JOIN r${k - 1} r ON e.src = r.v JOIN deg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.p AS src, b.p AS dst
       |  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS v FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |tp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM nn),
       |r0 AS (SELECT v, CAST($Scale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT v AS part_id, r AS rank_fp FROM r$iterations ORDER BY part_id""".stripMargin
  }

  /** DuckDB mirror of [[copurchaseEarlyStop]]: the unrolled chain (each
    * round MATERIALIZED — every r_k is referenced three times here:
    * next round, residual curve, final vector pick — the
    * `order_part_hits` inlining lesson), the residual curve, the stop
    * round as `MIN(round) WHERE l1 < tol` (falling back to the round
    * budget, exactly the engine's loop exit), and a CASE over the
    * per-round vectors to ship the stop round's ranks. */
  def sqlCopurchaseEarlyStop(tolFp: Long = 1000000L, maxIterations: Int = 10,
                             dampingPct: Int = 85): String = {
    val iters = (1 to maxIterations).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT n.v AS v, CAST(tp.t + COALESCE(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN tp LEFT JOIN (
         |    SELECT e.dst AS v,
         |      CAST(SUM(r.r * $dampingPct // 100 // dg.d) AS BIGINT) AS s
         |    FROM e JOIN r${k - 1} r ON e.src = r.v JOIN deg dg ON dg.src = e.src
         |    GROUP BY 1) c ON n.v = c.v)""".stripMargin
    }.mkString(",\n")
    val curve = (1 to maxIterations).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1
         |FROM r$k a JOIN r${k - 1} b ON a.v = b.v""".stripMargin
    }.mkString("\nUNION ALL\n")
    val cases = (1 to maxIterations).map(k => s"WHEN $k THEN x$k.r").mkString(" ")
    val joins = (1 to maxIterations)
      .map(k => s"JOIN r$k x$k ON n.v = x$k.v").mkString("\n|")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT a.p AS src, b.p AS dst
       |  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p),
       |deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM e),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |tp AS (SELECT CAST($Scale * ${100 - dampingPct} // 100 // n AS BIGINT) AS t FROM nn),
       |r0 AS MATERIALIZED (
       |  SELECT v, CAST($Scale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
       |$iters,
       |curve AS ($curve),
       |stopr AS (SELECT CAST(COALESCE(MIN(round), $maxIterations) AS BIGINT) AS k
       |          FROM curve WHERE l1 < $tolFp)
       |SELECT n.v AS part_id,
       |  CAST(CASE stopr.k $cases END AS BIGINT) AS rank_fp,
       |  stopr.k AS stop_round
       |FROM nodes n CROSS JOIN stopr
       |$joins
       |ORDER BY part_id""".stripMargin
  }
}
