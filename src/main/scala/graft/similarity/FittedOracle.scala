package graft.similarity

/** Printed-constant channel from query execution to oracle SQL — the
  * k-means analog of the r8 LSH plane-constant recipe that gave
  * `lsh_bucket_assignments` its full oracle.
  *
  * The ANN quantizers ([[Ivf.fitCentroids]], [[Pq.fitCodebooks]]) are
  * seeded, deterministic, bounded-sample driver fits — so their fitted
  * centroids/codebooks are plain `Double` constants once a query has run.
  * `graft.Verify` executes every registered query BEFORE it dumps
  * `SparkEntry.oracleSql` (Verify.scala), so a query closure can stash its
  * fit here and the oracle builder prints it into the SQL via
  * `Double.toString` (exact shortest-representation round-trip: DuckDB's
  * strtod parses back the identical bit pattern). When a fit has not run
  * (e.g. a filtered dev dump), the corresponding oracle entry is simply
  * omitted and the driver records the weaker rows-only check — never a
  * stale or mismatched oracle.
  *
  * Thread-safety: Verify runs queries sequentially; `@volatile` covers the
  * dump-after-run visibility.
  */
object FittedOracle {

  @volatile var ivfCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var pqBooks: Option[IndexedSeq[IndexedSeq[IndexedSeq[Double]]]] = None
  @volatile var ivfPqCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var ivfPqBooks: Option[IndexedSeq[IndexedSeq[IndexedSeq[Double]]]] = None
  @volatile var semCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var ivfStoredCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var bitextCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var recallCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  // Fitted BPE merge lists (r9): like the k-means fits, `Bpe.fitMerges`
  // is a deterministic driver fit — printable into SQL; the greedy
  // encode then replays as a recursive CTE ([[graft.text.Bpe]] SQL
  // builders). One slot per query: same fit today, but they must never
  // silently couple.
  // Fitted language trigram profiles (r10): Cavnar–Trenkle-class top-K
  // per-language character trigrams — a bounded deterministic fit like
  // the k-means centroids; one slot per query.
  @volatile var distortionBooks: Option[IndexedSeq[IndexedSeq[IndexedSeq[Double]]]] = None
  @volatile var appendCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var listStatsCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  // Store-maintenance fits (r11): compaction searches under the same
  // frozen quantizer; refit returns NEW centers from the grown corpus.
  @volatile var compactedCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var refitCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var clusterSampleCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  // Snapshot-drift audit (r12): one shared quantizer assigns BOTH
  // snapshot stand-ins, so the composition ppm tables are comparable.
  @volatile var driftCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var langIdProfiles: Option[Seq[(String, Seq[String])]] = None
  @volatile var langConfusionProfiles: Option[Seq[(String, Seq[String])]] = None
  @volatile var bpeStatsMerges: Option[Seq[(String, String)]] = None
  @volatile var bpePackMerges: Option[Seq[(String, String)]] = None
  @volatile var bpeFertilityMerges: Option[Seq[(String, String)]] = None
  // Fitted unigram-LM piece tables (r11): (piece, micro-nat logprob) —
  // Kudo-2018-class Viterbi-EM driver fits, integer constants printable
  // into the SQL Viterbi replay. One slot per query (the BPE rule).
  @volatile var unigramStatsPieces: Option[Seq[(String, Long)]] = None
  @volatile var unigramFertilityPieces: Option[Seq[(String, Long)]] = None
  @volatile var unigramPackPieces: Option[Seq[(String, Long)]] = None
  @volatile var maxmatchPieces: Option[Seq[(String, Long)]] = None
  // Hard- vs soft-EM fit pair (r12): the divergence audit prints BOTH
  // fitted tables into one oracle.
  @volatile var unigramDivHard: Option[Seq[(String, Long)]] = None
  @volatile var unigramDivSoft: Option[Seq[(String, Long)]] = None
  // Promoted production soft fit (r13): loss-ranked-pruned Kudo table —
  // the encode replay is fit-mode-agnostic, same printed-constants path.
  @volatile var unigramStatsSoftPieces: Option[Seq[(String, Long)]] = None

  /** Query names whose oracle arrives through this channel — the STATIC
    * single source for tools ([[graft.tools.CoverageMap]]) that must
    * classify oracle kinds without running the fits. Keep in lockstep
    * with [[oracleEntries]]: one name per slot mapping below (r13
    * review: the tool previously duplicated this list by hand). */
  val fittedKeys: Set[String] = Set(
    "knn_ivf", "knn_pq", "knn_ivf_pq", "semantic_dedup", "knn_ivf_stored",
    "bitext_mine_ivf", "ann_recall_report", "pq_distortion",
    "knn_ivf_append", "ivf_list_stats", "knn_ivf_compacted",
    "knn_ivf_refit", "cluster_balanced_sample", "cluster_drift",
    "langid_ngram", "langid_confusion", "bpe_encode_stats",
    "sequence_packing_bpe", "bpe_fertility", "unigram_encode_stats",
    "unigram_encode_stats_soft", "unigram_fertility",
    "sequence_packing_unigram", "maxmatch_encode_stats",
    "unigram_fit_divergence")

  /** Exact decimal print: Java's shortest round-trip representation, which
    * DuckDB's parser maps back to the same double (scientific notation
    * like `1.0E-5` included). */
  def d(x: Double): String = {
    require(!x.isNaN && !x.isInfinite, s"non-finite constant in oracle: $x")
    x.toString
  }

  def arr(v: Seq[Double]): String = v.map(d).mkString("[", ", ", "]")

  /** |c|² exactly as [[org.apache.spark.sql.graft.NearestCentroids]]
    * precomputes it (`c.map(x => x*x).sum` — left fold), printed as a
    * constant so the SQL replay never re-derives it in a different order. */
  def n2(v: Seq[Double]): Double = v.map(x => x * x).sum

  /** Centroid VALUES body: `(cid, n2, cv)` rows, cid = row index. */
  def centroidValues(centers: IndexedSeq[IndexedSeq[Double]]): String =
    centers.zipWithIndex.map { case (c, i) =>
      s"($i, ${d(n2(c))}, ${arr(c)})"
    }.mkString(",\n    ")

  /** PQ codebook VALUES body: `(s, j, n2, cv)` rows over all subspaces. */
  def codebookValues(books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): String =
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) =>
        s"($s, $j, ${d(n2(c))}, ${arr(c)})"
      }
    }.mkString(",\n    ")

  /** The oracle entries whose SQL depends on a stashed fit — appended to
    * `SparkEntry.oracleSql` after the queries have run. */
  def oracleEntries: Map[String, String] =
    (ivfCenters.map(c => "knn_ivf" -> Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)) ++
      pqBooks.map(b => "knn_pq" -> Pq.sqlKnnPq(b, k = 5)) ++
      (for { c <- ivfPqCenters; b <- ivfPqBooks }
        yield "knn_ivf_pq" -> Pq.sqlKnnIvfPq(c, b, k = 5, nprobe = 4)) ++
      semCenters.map(c =>
        "semantic_dedup" -> Similarity.sqlSemanticDedupKeepers(c, 0.4)) ++
      // Same replay as knn_ivf: the stored layout changes WHERE bytes
      // live (list-partitioned directories, pruned scans), never WHAT
      // the query returns.
      ivfStoredCenters.map(c =>
        "knn_ivf_stored" -> Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)) ++
      bitextCenters.map(c =>
        "bitext_mine_ivf" -> Similarity.sqlBitextMineIvf(c, k = 4,
          marginThreshold = 1.05, nprobe = 2)) ++
      recallCenters.map(c =>
        "ann_recall_report" -> Ivf.sqlAnnRecall(c, k = 5, nprobe = 4,
          probeWhere = "vec_id % 50 = 0")) ++
      distortionBooks.map(b =>
        "pq_distortion" -> Pq.sqlDistortionReport(b)) ++
      // Frozen-quantizer append: assignment is a pure function of
      // (vector, centers), so the oracle over the union corpus with the
      // HISTORY-fitted centers IS the appended-store contract.
      appendCenters.map(c =>
        "knn_ivf_append" -> Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)) ++
      listStatsCenters.map(c =>
        "ivf_list_stats" -> Ivf.sqlListStats(c, "vec_id >= 250")) ++
      // Maintenance changes WHERE bytes live (one file per list /
      // re-assigned lists), never WHAT a probe returns — both replay
      // as the plain printed-centroid search over the union corpus.
      compactedCenters.map(c =>
        "knn_ivf_compacted" -> Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)) ++
      refitCenters.map(c =>
        "knn_ivf_refit" -> Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)) ++
      clusterSampleCenters.map(c =>
        "cluster_balanced_sample" -> Similarity.sqlClusterBalancedSample(c, k = 40)) ++
      driftCenters.map(c =>
        "cluster_drift" -> Similarity.sqlClusterDrift(c)) ++
      langIdProfiles.filter(_.nonEmpty).map(p =>
        "langid_ngram" ->
          (s"WITH ${graft.text.TextAnalysis.sqlLangIdNgramCtes(
              "documents", "doc_id", "lang", "text", p)}\n" +
            "SELECT doc_id, lang, pred_ngram, (lang = pred_ngram) AS agree\n" +
            "FROM pr ORDER BY doc_id")) ++
      langConfusionProfiles.filter(_.nonEmpty).map(p =>
        "langid_confusion" ->
          (s"WITH ${graft.text.TextAnalysis.sqlLangIdNgramCtes(
              "documents", "doc_id", "lang", "text", p)}\n" +
            "SELECT lang, pred_ngram, count(*) AS n\n" +
            "FROM pr GROUP BY 1, 2 ORDER BY lang, pred_ngram")) ++
      // Empty fitted lists (degenerate corpus) render invalid
      // `FROM (VALUES )` SQL — omit the entry, the driver records the
      // weaker rows-only check (the never-a-broken-oracle rule above).
      bpeStatsMerges.filter(_.nonEmpty).map(m =>
        "bpe_encode_stats" -> graft.text.Bpe.sqlEncodeStats(m)) ++
      bpePackMerges.filter(_.nonEmpty).map(m =>
        "sequence_packing_bpe" -> graft.text.Bpe.sqlPackChunksBpe(m, 512L)) ++
      bpeFertilityMerges.filter(_.nonEmpty).map(m =>
        "bpe_fertility" -> graft.text.Bpe.sqlFertilityByLang(m)) ++
      unigramStatsPieces.filter(_.nonEmpty).map(p =>
        "unigram_encode_stats" -> graft.text.Unigram.sqlEncodeStats(p)) ++
      unigramStatsSoftPieces.filter(_.nonEmpty).map(p =>
        "unigram_encode_stats_soft" -> graft.text.Unigram.sqlEncodeStats(p)) ++
      unigramFertilityPieces.filter(_.nonEmpty).map(p =>
        "unigram_fertility" -> graft.text.Unigram.sqlFertilityByLang(p)) ++
      unigramPackPieces.filter(_.nonEmpty).map(p =>
        "sequence_packing_unigram" ->
          graft.text.Unigram.sqlPackChunks(p, 512L)) ++
      maxmatchPieces.filter(_.nonEmpty).map(p =>
        "maxmatch_encode_stats" ->
          graft.text.Unigram.sqlMaxMatchStats(p)) ++
      (for { h <- unigramDivHard.filter(_.nonEmpty)
             s <- unigramDivSoft.filter(_.nonEmpty) } yield
        "unigram_fit_divergence" ->
          graft.text.Unigram.sqlFertilityCompare(h, s))).toMap
}
