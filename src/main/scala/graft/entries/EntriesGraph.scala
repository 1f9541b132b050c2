package graft

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{RecentArticles, SourceDistribution, Timeline, Totals}
import graft.dedup.Dedup
import graft.ingest.{Dates, Ingest}
import graft.multimodal.Multimodal
import graft.relational.Relational
import graft.similarity.{FittedOracle, Ivf, Pq, Similarity}
import graft.streaming.EventWindows
import graft.text.{Stopwords, TextAnalysis, WordFrequencies}

import graft.EntryFixtures._

/** the iterative graph family: PageRank/TrustRank/HITS/LPA fixtures, convergence curves, early stops — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesGraph {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Integer fixed-point PageRank over the part co-purchase graph:
    // iterative co-partitioned RDD rounds (one exchange per iteration),
    // long-division arithmetic -> bit-identical across engines, so an
    // ITERATIVE algorithm gets a full hash-checked oracle (the DuckDB
    // side unrolls the 10 rounds as a WITH-chain).
    "part_pagerank" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseParts(Tables.lineitem(s, dir))),
    // F130: the fixed-iteration contract, measured — per-round L1/L-inf
    // residuals + changed-node counts for the rank loop above, so "10
    // rounds converged" is a hash-checked decay curve, not an argument.
    "part_pagerank_convergence" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseConvergence(Tables.lineitem(s, dir))),
    // F137 (r13): the F130 curve put to WORK — tolerance-driven early
    // stop. The loop exits when the L1 residual crosses 1e-6 of total
    // mass (measured: round 7 of 10); both the early-stopped vector and
    // the data-dependent stop round are hash-checked (the oracle derives
    // the stop from the same rule over the unrolled chain).
    "part_pagerank_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseEarlyStop(Tables.lineitem(s, dir))),
    // TrustRank + spam mass: the host-graph anti-spam triple (seeded
    // trust propagation vs open PageRank) on the same graph fixture.
    "trust_propagation" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseSpamMass(Tables.lineitem(s, dir))),
    // F137 completed across the FOURTH iterative family (r13): the
    // spam-mass triple with both loops tolerance-stopped on their own
    // residual curves — two independent data-dependent stop rounds,
    // both derived by the oracle from the same rules.
    "trust_propagation_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.copurchaseSpamMassEarlyStop(
        Tables.lineitem(s, dir))),
    // Label-propagation communities over the co-purchase graph: the
    // deterministic synchronous variant (smallest-label mode ties) —
    // the link-farm-cluster / per-community-cap signal.
    // 3 rounds: labels flood 3 hops — the dense co-purchase graph's
    // communities stabilize within that; each round is a full
    // |E|-vote shuffle.
    "part_communities" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunities(Tables.lineitem(s, dir), 3)),
    // F135: the convergence curve for the label family — per-round
    // churn + community count, so the fixed 3-round choice above is a
    // hash-checked "no/low churn by round 3", not an argument.
    "part_communities_convergence" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunitiesConvergence(Tables.lineitem(s, dir), 3)),
    // F137 (r13): churn-driven early stop for the label family — stop
    // when ≤1200 nodes changed label (measured: round 3 of a 5-round
    // budget; this dense graph never reaches zero churn in budget,
    // exactly what a positive threshold is for).
    "part_communities_earlystop" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunitiesEarlyStop(Tables.lineitem(s, dir))),
    // r15: the SCALE-FREE churn stop — threshold = 40% of |V| derived
    // inside the run, so the same setting means the same relative
    // settledness at every corpus size (the m10 audit showed absolute
    // flip counts go relatively 10x tighter on a 10x graph). Fixture
    // stop: round 4 of 5 (threshold 800 vs curve 2000/1692/1115/714),
    // deliberately different from the absolute twin's round 3.
    "part_communities_earlystop_ppm" -> ((s, dir) =>
      graft.analytics.Lpa.partCommunitiesEarlyStopPpm(Tables.lineitem(s, dir))),
    // HITS hubs/authorities on the DIRECTED bipartite order->part graph
    // (orders = pure hubs, parts = pure authorities) — L1-normalized
    // integer half-steps, full unrolled-CTE oracle like the rank family.
    // 5 rounds: HITS is power iteration on A^T·A and has visibly
    // converged here; each extra round costs 2 L1-total actions.
    "order_part_hits" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHits(Tables.lineitem(s, dir), 5)),
    // F136: the half-step residual curve — "visibly converged" above
    // becomes per-round hub/auth L1 deltas, hash-checked. Completes the
    // measured fixed-iteration contract across all three iterative
    // families (rank F130, labels F135, HITS here).
    "order_part_hits_convergence" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHitsConvergence(
        Tables.lineitem(s, dir), 5)),
    // F137 (r13): combined hub+auth residual early stop for HITS —
    // tolerance 3e9 fp (~0.3% of the two normalized masses), measured
    // crossing at round 5 of an 8-round budget.
    "order_part_hits_earlystop" -> ((s, dir) =>
      graft.analytics.PageRank.orderPartHitsEarlyStop(Tables.lineitem(s, dir))),
  )

  def oracleSql: Map[String, String] = Map(
    "part_pagerank" -> graft.analytics.PageRank.sqlCopurchaseParts(),
    "part_pagerank_convergence" ->
      graft.analytics.PageRank.sqlCopurchaseConvergence(),
    "part_pagerank_earlystop" ->
      graft.analytics.PageRank.sqlCopurchaseEarlyStop(),
    "trust_propagation" -> graft.analytics.PageRank.sqlCopurchaseSpamMass(),
    "trust_propagation_earlystop" ->
      graft.analytics.PageRank.sqlCopurchaseSpamMassEarlyStop(),
    "order_part_hits" -> graft.analytics.PageRank.sqlOrderPartHits(5),
    "order_part_hits_convergence" ->
      graft.analytics.PageRank.sqlOrderPartHitsConvergence(5),
    "order_part_hits_earlystop" ->
      graft.analytics.PageRank.sqlOrderPartHitsEarlyStop(),
    "part_communities" -> graft.analytics.Lpa.sqlPartCommunities(3),
    "part_communities_convergence" ->
      graft.analytics.Lpa.sqlPartCommunitiesConvergence(3),
    "part_communities_earlystop" ->
      graft.analytics.Lpa.sqlPartCommunitiesEarlyStop(),
    "part_communities_earlystop_ppm" ->
      graft.analytics.Lpa.sqlPartCommunitiesEarlyStopPpm(),
  )
}
