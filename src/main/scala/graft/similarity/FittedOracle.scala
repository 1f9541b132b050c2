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
  // Soft-mode consumer twins (r14, the r13 verdict's #3): the fertility
  // and packing consumers under the promoted soft fit — same replay
  // builders, only the printed table differs (the fit-mode-agnosticism
  // claim, now demonstrated on the consumers and not just the encode).
  @volatile var unigramFertilitySoftPieces: Option[Seq[(String, Long)]] = None
  @volatile var unigramPackSoftPieces: Option[Seq[(String, Long)]] = None
  // SPFHP bin-packing slot table (r15, the r14 verdict's #1): the
  // histogram-driven best-fit-decreasing strategy construction is a
  // deterministic driver loop over a bounded collected histogram — its
  // (length, cum_start, multiplicity, strat_count, seq_offset, seq_fill)
  // slot rows print into a VALUES oracle that replays the distributed
  // rank-window + broadcast-join assignment in DuckDB.
  @volatile var packBinsSlots: Option[Seq[(Int, Long, Int, Long, Long, Int)]] = None
  // Document-family SemDeDup faces (r16, the r15 verdict's #1): the doc
  // face fits on the COVERED embedding subset, the incremental face on
  // the HISTORY half only (the frozen-quantizer state contract).
  @volatile var semDocsCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None
  @volatile var semIncCenters: Option[IndexedSeq[IndexedSeq[Double]]] = None

  /** Query names whose oracle arrives through this channel — the STATIC
    * single source for tools ([[graft.tools.CoverageMap]]) that must
    * classify oracle kinds without running the fits. Derived from the
    * same [[slots]] list that builds [[oracleEntries]] (r13 ADVICE: the
    * two were hand-maintained twins that could silently drift — now a
    * new slot name appears in both or in neither, by construction). */
  val fittedKeys: Set[String] = slots.map(_._1).toSet

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

  /** THE single (query name, fitted SQL if its fit has run) list —
    * [[fittedKeys]] takes the names, [[oracleEntries]] the populated
    * SQL. The Option's `map` keeps every builder lazy: an un-run fit
    * costs nothing and emits nothing. */
  private def slots: Seq[(String, Option[String])] = Seq(
    "knn_ivf" -> ivfCenters.map(c => Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)),
    "knn_pq" -> pqBooks.map(b => Pq.sqlKnnPq(b, k = 5)),
    "knn_ivf_pq" -> (for { c <- ivfPqCenters; b <- ivfPqBooks }
      yield Pq.sqlKnnIvfPq(c, b, k = 5, nprobe = 4)),
    "semantic_dedup" ->
      semCenters.map(c => Similarity.sqlSemanticDedupKeepers(c, 0.4)),
    // The r16 document-family faces share the proven semantic CTE chain;
    // the subset WHEREs mirror the query closures exactly.
    "dedup_semantic" -> semDocsCenters.map(c =>
      Similarity.sqlSemanticDedupDocs(c, 0.4, "vec_id % 5 <> 4")),
    "dedup_semantic_incremental" -> semIncCenters.map(c =>
      Similarity.sqlSemanticDedupIncremental(c, 0.4,
        "vec_id % 2 = 0", "vec_id % 2 = 1")),
    // Same replay as knn_ivf: the stored layout changes WHERE bytes
    // live (list-partitioned directories, pruned scans), never WHAT
    // the query returns.
    "knn_ivf_stored" ->
      ivfStoredCenters.map(c => Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)),
    "bitext_mine_ivf" -> bitextCenters.map(c =>
      Similarity.sqlBitextMineIvf(c, k = 4, marginThreshold = 1.05,
        nprobe = 2)),
    "ann_recall_report" -> recallCenters.map(c =>
      Ivf.sqlAnnRecall(c, k = 5, nprobe = 4,
        probeWhere = "vec_id % 50 = 0")),
    "pq_distortion" -> distortionBooks.map(b => Pq.sqlDistortionReport(b)),
    // Frozen-quantizer append: assignment is a pure function of
    // (vector, centers), so the oracle over the union corpus with the
    // HISTORY-fitted centers IS the appended-store contract.
    "knn_ivf_append" ->
      appendCenters.map(c => Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)),
    "ivf_list_stats" ->
      listStatsCenters.map(c => Ivf.sqlListStats(c, "vec_id >= 250")),
    // Maintenance changes WHERE bytes live (one file per list /
    // re-assigned lists), never WHAT a probe returns — both replay
    // as the plain printed-centroid search over the union corpus.
    "knn_ivf_compacted" ->
      compactedCenters.map(c => Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)),
    "knn_ivf_refit" ->
      refitCenters.map(c => Ivf.sqlKnnIvf(c, k = 5, nprobe = 4)),
    "cluster_balanced_sample" -> clusterSampleCenters.map(c =>
      Similarity.sqlClusterBalancedSample(c, k = 40)),
    "cluster_drift" -> driftCenters.map(c => Similarity.sqlClusterDrift(c)),
    "langid_ngram" -> langIdProfiles.filter(_.nonEmpty).map(p =>
      s"WITH ${graft.text.TextAnalysis.sqlLangIdNgramCtes(
          "documents", "doc_id", "lang", "text", p)}\n" +
        "SELECT doc_id, lang, pred_ngram, (lang = pred_ngram) AS agree\n" +
        "FROM pr ORDER BY doc_id"),
    "langid_confusion" -> langConfusionProfiles.filter(_.nonEmpty).map(p =>
      s"WITH ${graft.text.TextAnalysis.sqlLangIdNgramCtes(
          "documents", "doc_id", "lang", "text", p)}\n" +
        "SELECT lang, pred_ngram, count(*) AS n\n" +
        "FROM pr GROUP BY 1, 2 ORDER BY lang, pred_ngram"),
    // Empty fitted lists (degenerate corpus) render invalid
    // `FROM (VALUES )` SQL — omit the entry, the driver records the
    // weaker rows-only check (the never-a-broken-oracle rule above).
    "bpe_encode_stats" -> bpeStatsMerges.filter(_.nonEmpty).map(m =>
      graft.text.Bpe.sqlEncodeStats(m)),
    "sequence_packing_bpe" -> bpePackMerges.filter(_.nonEmpty).map(m =>
      graft.text.Bpe.sqlPackChunksBpe(m, 512L)),
    "bpe_fertility" -> bpeFertilityMerges.filter(_.nonEmpty).map(m =>
      graft.text.Bpe.sqlFertilityByLang(m)),
    "unigram_encode_stats" -> unigramStatsPieces.filter(_.nonEmpty).map(p =>
      graft.text.Unigram.sqlEncodeStats(p)),
    "unigram_encode_stats_soft" ->
      unigramStatsSoftPieces.filter(_.nonEmpty).map(p =>
        graft.text.Unigram.sqlEncodeStats(p)),
    "unigram_fertility" ->
      unigramFertilityPieces.filter(_.nonEmpty).map(p =>
        graft.text.Unigram.sqlFertilityByLang(p)),
    // The soft-fit consumer twins (r14) reuse the hard twins' replay
    // builders verbatim — the printed table is the only difference.
    "unigram_fertility_soft" ->
      unigramFertilitySoftPieces.filter(_.nonEmpty).map(p =>
        graft.text.Unigram.sqlFertilityByLang(p)),
    "sequence_packing_unigram" ->
      unigramPackPieces.filter(_.nonEmpty).map(p =>
        graft.text.Unigram.sqlPackChunks(p, 512L)),
    "sequence_packing_unigram_soft" ->
      unigramPackSoftPieces.filter(_.nonEmpty).map(p =>
        graft.text.Unigram.sqlPackChunks(p, 512L)),
    "maxmatch_encode_stats" -> maxmatchPieces.filter(_.nonEmpty).map(p =>
      graft.text.Unigram.sqlMaxMatchStats(p)),
    // The chunking (64) and budget (128) constants mirror the entry
    // closure's composition exactly — the builder replays chunk
    // expansion + rank + slot join around the printed driver fit.
    "sequence_packing_bins" -> packBinsSlots.filter(_.nonEmpty).map(sl =>
      graft.pipeline.Curation.sqlPackBinsChunks(sl, chunkTokens = 64,
        budget = 128)),
    "unigram_fit_divergence" ->
      (for { h <- unigramDivHard.filter(_.nonEmpty)
             s <- unigramDivSoft.filter(_.nonEmpty) } yield
        graft.text.Unigram.sqlFertilityCompare(h, s)))

  /** The oracle entries whose SQL depends on a stashed fit — appended to
    * `SparkEntry.oracleSql` after the queries have run. */
  def oracleEntries: Map[String, String] =
    slots.collect { case (name, Some(sql)) => name -> sql }.toMap
}
