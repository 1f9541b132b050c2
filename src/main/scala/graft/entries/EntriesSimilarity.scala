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

/** embedding search: kNN exact/LSH/IVF/PQ, store lifecycle, bitext, recall audits — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesSimilarity {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- [EXT] similarity search ----
    "knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Matryoshka truncation audit (r11): recall of prefix-truncated
    // (re-normalized) search vs the full 64-dim top-k, per width —
    // the store-narrowing decision as integer basis points; the full
    // width pins 10000 as the self-check row.
    "embedding_truncate_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.truncationRecall(emb, emb.filter(col("vec_id") % 50 === 0),
        Seq(4, 8, 16, 64), 5)
    }),
    "cosine_pairs" -> ((s, dir) => Similarity.cosinePairs(Tables.embeddings(s, dir), 0.4)),
    // Scalar int8 quantization (r10): per-vector symmetric scale, codes
    // via FLOOR(+0.5) (round-half modes differ across engines; floor is
    // unambiguous), fold-ordered reconstruction-error audit.
    "embedding_quantize" -> ((s, dir) =>
      Similarity.scalarQuantize(Tables.embeddings(s, dir))),
    // Search over the 4x-smaller store: brute-force kNN with the
    // candidates dequantized and the probes full-precision — the
    // adoption question as a query; recall vs the exact index is
    // additionally asserted in SimilaritySpec.
    "knn_quantized" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(Similarity.dequantized(emb),
        emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Contrastive training triplets: near-dup positives (both
    // orientations) + each anchor's top different-label negative with
    // the semi-hard flag — both feeds' proven mirrors composed.
    "contrastive_triplets" -> ((s, dir) =>
      Similarity.contrastiveTriplets(Tables.embeddings(s, dir), 0.4)),
    // Hard/semi-hard negative mining for contrastive training: per
    // anchor, top-k nearest DIFFERENT-label vectors, flagged semi-hard
    // when within the FaceNet margin of the nearest positive.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // ANN quality audit: per-probe recall of the IVF index against the
    // exact top-k — the tuning number for nlist/nprobe. Oracle via the
    // printed-centroid channel (both sides' mirrors already proven).
    "ann_recall_report" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.recallCenters = Some(centers)
      Similarity.recallReport(
        Similarity.knnBruteForce(emb, probes, 5),
        Ivf.knnIvfWith(centers, emb, probes, 5))
    }),
    // Margin-based bitext mining (r10) — the CCMatrix mutual-argmax
    // recipe across the parity-split embedding sets: cosine relative to
    // both sides' k-NN neighborhood density, mutual best, margin >= 1.05
    // (151 of 161 mutual pairs at sf0.01). Fold-ordered averages keep
    // the margins bit-identical across engines.
    "bitext_mine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bitextMine(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), 4, 1.05)
    }),
    // The corpus-scale bitext form (r10): candidates restricted to pairs
    // meeting in a shared fitted quantizer's lists (src probes nprobe=2,
    // tgt holds its own list — pairs meet at most once), same margin/
    // mutual machinery within the pool. Full oracle via printed
    // centroids; recall vs the exact miner pinned in SimilaritySpec.
    "bitext_mine_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.bitextCenters = Some(centers)
      Similarity.bitextMineIvf(centers, emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), 4, 1.05, 2)
    }),
    "embedding_dedup_keepers" -> ((s, dir) =>
      Similarity.embeddingDedupKeepers(Tables.embeddings(s, dir), 0.4)),
    // LSH-candidate feed -> exact verify -> CC: the 100 TB embedding-dedup
    // composition. FULL oracle since r8: DuckDB replays the sign buckets
    // from printed plane constants, so recall is part of the contract,
    // not luck; refinement vs the exact path stays pinned in
    // SimilaritySpec.
    "embedding_dedup_keepers_scaled" -> ((s, dir) =>
      Similarity.embeddingDedupKeepersScaled(Tables.embeddings(s, dir), 0.4)),
    // SemDeDup: k-means-partitioned semantic dedup — quadratic work bounded
    // structurally per cluster. FULL oracle since r9: the seeded
    // deterministic cluster fit is stashed in FittedOracle and its
    // centroids print into the DuckDB replay as exact constants;
    // SimilaritySpec still pins the refinement property vs exact keepers.
    "semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.semCenters = Some(centers)
      Similarity.semanticDedupKeepersWith(centers, emb, 0.4)
    }),
    // SemDeDup as a DOCUMENT-corpus dedup stage (r16, the r15 verdict's
    // #1): semantic keepers over the EMBEDDED subset (coverage is
    // partial in production — the %5 filter models it), documents
    // without an embedding keep themselves. FULL printed-centroid
    // oracle; the paraphrase-vs-MinHash claim is SemanticDedupSpec's.
    "dedup_semantic" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") % 5 =!= 4)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.semDocsCenters = Some(centers)
      Similarity.semanticDedupDocsWith(centers, docs, emb, 0.4)
    }),
    // The frozen-state incremental face (r16): quantizer fitted on the
    // HISTORY half, index = history's KEEPER embedding rows (the
    // persisted-keepers contract), batch = the other half. FULL oracle:
    // the DuckDB replay runs BOTH CC passes (history -> keeper index,
    // batch-internal components) plus the cluster-equal cosine match.
    "dedup_semantic_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") % 2 === 0)
      val batch = emb.filter(col("vec_id") % 2 =!= 0)
      val centers = Ivf.fitCentroids(hist, 8)
      FittedOracle.semIncCenters = Some(centers)
      val histKeeperIds = Similarity
        .semanticDedupKeepersWith(centers, hist, 0.4)
        .filter(col("vec_id") === col("keeper_vec_id")).select("vec_id")
      val index = hist.join(histKeeperIds, Seq("vec_id"))
      Similarity.semanticDedupIncrementalWith(centers, batch, index, 0.4)
    }),
    "knn_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnLsh(emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The deterministic half of knn_lsh with a FULL oracle: per-(vector,
    // table) sign buckets replayed in DuckDB from the printed plane
    // constants (exact double round-trip, same left-assoc accumulation).
    "lsh_bucket_assignments" -> ((s, dir) =>
      Similarity.lshBucketAssignments(Tables.embeddings(s, dir))),
    // knn_ivf: KMeans coarse-quantizer IVF. FULL oracle since r9: the
    // seeded deterministic fit is stashed and its centroids print into
    // the DuckDB replay (the r8 LSH plane-constant recipe); recall vs
    // brute force stays pinned in SimilaritySpec.
    "knn_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.ivfCenters = Some(centers)
      Ivf.knnIvfWith(centers, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The STORED IVF layout under the gate (r9): corpus written
    // list-partitioned, probe lists pushed as a partition filter — only
    // nprobe/nlist of the directories are scanned (SimilaritySpec pins
    // the PartitionFilters shape) — and the result must still equal the
    // in-memory knn_ivf, which the shared printed-centroid oracle
    // enforces.
    "knn_ivf_stored" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      FittedOracle.ivfStoredCenters = Some(centers)
      // One scratch dir per (user, sf dir, Spark app) under a common
      // parent: the full sanitized dir string kills hashCode collisions
      // across sf dirs, and the app id isolates concurrent JVMs (a
      // Bench run beside a Verify run raced overwrite-vs-read on a
      // shared path). Reclamation is two-layered — a shutdown delete
      // for clean exits, and a stale-sibling sweep at registration so
      // dirs orphaned by CRASHED runs (OOM-kill skips shutdown hooks)
      // are reaped by the next run instead of accumulating forever.
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path =
        s"$parent/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(emb, centers, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The GROWING store (r10): history written with a quantizer fitted
    // on history ONLY, the batch appended under the frozen centers (the
    // FAISS `add` path — no refit, history files untouched), then
    // searched. Assignment is a pure function of (vector, centers), so
    // the printed-centroid oracle over the union corpus enforces
    // appended-store == in-memory-over-everything.
    "knn_ivf_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val centers = Ivf.fitCentroids(hist, 16)
      FittedOracle.appendCenters = Some(centers)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/append_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, centers, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), centers, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Store COMPACTION (r11): the grown store's many small per-list
    // files rewritten as one file per list (hash-repartition by list +
    // temp-dir swap) — content identical, layout minimal. The search
    // after compaction must equal the in-memory search under the same
    // frozen centers, which the shared printed-centroid oracle enforces
    // (IvfMaintenanceSpec additionally pins the one-file-per-list
    // layout and byte-level search identity before/after).
    "knn_ivf_compacted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val centers = Ivf.fitCentroids(hist, 16)
      FittedOracle.compactedCenters = Some(centers)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/compact_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, centers, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), centers, path)
      Ivf.compactStore(s, path)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // Quantizer REFIT (r11): when ivf_list_stats says the corpus moved,
    // re-fit centers from the grown store, re-assign every vector,
    // rewrite list-partitioned (the FAISS retrain loop). Search under
    // the NEW centers over the refit store equals the in-memory search
    // over the same corpus — the refit-centers printed oracle.
    "knn_ivf_refit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val hist = emb.filter(col("vec_id") < 250)
      val histCenters = Ivf.fitCentroids(hist, 16)
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_" +
        System.getProperty("user.name", "u")
      val path = s"$parent/refit_" +
        s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
      IvfStoreScratch.deleteOnExit(path)
      Ivf.writeListPartitioned(hist, histCenters, path)
      Ivf.appendToStore(emb.filter(col("vec_id") >= 250), histCenters, path)
      val centers = Ivf.refit(s, path, 16)
      FittedOracle.refitCenters = Some(centers)
      Ivf.knnIvfStored(s, path, centers, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The drift/imbalance audit of that frozen quantizer: per-list
    // history/batch occupancy + integer-ppm corpus share, EVERY list
    // present (empty ones read 0).
    "ivf_list_stats" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb.filter(col("vec_id") < 250), 16)
      FittedOracle.listStatsCenters = Some(centers)
      Ivf.listStats(emb, centers, col("vec_id") >= 250)
    }),
    // Topic-balanced subset: cap each EMBEDDING CLUSTER (printed-centroid
    // assignment) at k by the content-keyed md5 order — uniform sampling
    // would inherit the corpus's topic skew.
    "cluster_balanced_sample" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.clusterSampleCenters = Some(centers)
      Similarity.clusterBalancedSample(emb, centers, 40)
    }),
    // F132: embedding-cluster composition drift between two snapshot
    // stand-ins (vec_id parity) under ONE shared quantizer — the
    // release-to-release topic-mix audit, integer ppm shares.
    "cluster_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 8)
      FittedOracle.driftCenters = Some(centers)
      Similarity.clusterDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 =!= 0), centers)
    }),
    // knn_pq: product-quantized ADC search (32x-compressed codes). FULL
    // oracle since r9 via printed codebooks; recall pinned in PqSpec.
    "knn_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.pqBooks = Some(books)
      Pq.knnPqWith(books, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
    // The other half of ANN QA beside ann_recall_report: per-subspace
    // reconstruction error of the fitted codebooks, integer-lifted sums.
    "pq_distortion" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.distortionBooks = Some(books)
      Pq.distortionReport(emb, books)
    }),
    // knn_ivf_pq: IVF list pruning + ADC over codes — the billion-scale
    // composition. FULL oracle since r9 (printed centroids + codebooks);
    // recall pinned in PqSpec.
    "knn_ivf_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centers = Ivf.fitCentroids(emb, 16)
      val books = Pq.fitCodebooks(emb, 8, 16)
      FittedOracle.ivfPqCenters = Some(centers)
      FittedOracle.ivfPqBooks = Some(books)
      Pq.knnIvfPqWith(centers, books, emb, emb.filter(col("vec_id") % 50 === 0), 5)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_bruteforce" ->
      Similarity.sqlKnnBruteForce("vec_id % 50 = 0", 5),
    "embedding_truncate_recall" ->
      Similarity.sqlTruncationRecall("vec_id % 50 = 0", Seq(4, 8, 16, 64), 5),
    "hard_negatives" ->
      Similarity.sqlHardNegatives("vec_id % 50 = 0", 5),
    "cosine_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
        |                     (a,b) -> a+b)) AS nv
        |  FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]),
        |                      (x,y) -> x+y) / (a.nv * b.nv), 6) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "embedding_quantize" -> Similarity.sqlScalarQuantize("embeddings"),
    "knn_quantized" -> Similarity.sqlKnnQuantized("vec_id % 50 = 0", 5),
    // knn_lsh: FULL oracle since r8 — bucket replay + the knn_bruteforce
    // rank tail over the LSH candidate set; recall vs knn_bruteforce is
    // additionally asserted in SimilaritySpec.
    "knn_lsh" -> Similarity.sqlKnnLsh(5),
    "contrastive_triplets" -> Similarity.sqlContrastiveTriplets(0.4),
    "bitext_mine" -> Similarity.sqlBitextMine(4, 1.05),
    "lsh_bucket_assignments" -> Similarity.sqlLshBuckets(),
    "embedding_dedup_keepers" ->
      """WITH RECURSIVE n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
        |                     (a,b) -> a+b)) AS nv
        |  FROM embeddings),
        |cp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |      round(list_reduce(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]),
        |                        (x,y) -> x+y) / (a.nv * b.nv), 6) AS cosine
        |    FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |  WHERE cosine >= 0.4),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM cp
        |          UNION ALL SELECT id_b, id_a FROM cp),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS label FROM embeddings
        |  UNION
        |  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS vec_id, MIN(label) AS keeper_vec_id
        |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    // embedding_dedup_keepers_scaled: FULL oracle since r8 — sign buckets
    // replay from printed plane constants, DISTINCT shared-bucket pairs
    // equal the engine's first-matching-table candidate set, verify uses
    // the cosine_pairs arithmetic, CC the recursive-CTE discipline.
    "embedding_dedup_keepers_scaled" ->
      Similarity.sqlEmbeddingDedupKeepersScaled(0.4),
  )
}
