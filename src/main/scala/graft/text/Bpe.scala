package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** [EXT] Byte-pair-encoding tokenizer training + application
  * (`bpe_merges` / `bpe_encode_stats` queries) — the missing half of the
  * tokenizer story: [[TextAnalysis.vocabulary]]/`vocab_encode` map whole
  * words to ids, but a training-data pipeline also TRAINS the subword
  * vocabulary it will tokenize with (Sennrich et al. 2016; every GPT/
  * Llama-style stack runs this once per corpus refresh).
  *
  * Training follows the standard shape, which is deliberately NOT an
  * all-corpus iteration: BPE fits on the word-frequency DICTIONARY, not
  * the token stream. The engine computes exact word counts distributed
  * (one map-combined hash aggregate — the same cost class as
  * `word_frequencies`), takes the top `maxVocabWords` words by (count
  * desc, word asc) — a bounded TakeOrdered, the [[graft.similarity
  * .LocalKMeans]] bounded-fit discipline — and runs the merge loop on
  * the driver over that dictionary. At 100 TB the dictionary is still
  * vocabulary-scale (millions of rows, kilobytes each), so the collect
  * is bounded and the cluster never re-scans the corpus per merge.
  *
  * Determinism: merge selection breaks frequency ties by (left asc,
  * right asc), so the merge list is a pure function of the dictionary.
  * Encoding applies merges greedily by rank (lowest rank first — the
  * exact inverse of training order), per token, in a per-partition map
  * with the rank table broadcast: no shuffle, no per-row JVM boxing
  * beyond the token split the tokenizer contract already implies.
  *
  * Both queries are rows-only by nature (the merge loop is engine
  * internals, like the k-means fits); BpeSpec pins hand-computed merges
  * on the Sennrich corpus, the round-trip invariant (concatenating a
  * token's pieces reproduces the token), rank-monotone application, and
  * sample-bound behavior.
  */
object Bpe {

  /** Exact word-frequency dictionary, bounded to the top `maxVocabWords`
    * by (count desc, word asc). */
  def wordDict(docs: DataFrame, textCol: String,
               maxVocabWords: Int): Array[(String, Long)] = {
    graft.Par.widen(docs)
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Driver-side merge loop over a word dictionary: `nMerges` rounds of
    * count-adjacent-pairs → pick (count desc, left asc, right asc) →
    * merge everywhere. O(nMerges · Σ|word symbols|). */
  private[text] def fitOnDict(dict: Array[(String, Long)],
                              nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Train `nMerges` BPE merges on `textCol`: Seq of (left, right) in
    * merge order (rank 0 first). */
  def fitMerges(docs: DataFrame, textCol: String, nMerges: Int,
                maxVocabWords: Int = 100000): Seq[(String, String)] =
    fitOnDict(wordDict(docs, textCol, maxVocabWords), nMerges)

  /** The merge list as a DataFrame (`bpe_merges` query):
    * (rank, left, right, piece). */
  def mergesTable(spark: SparkSession,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "piece")
  }

  /** Greedy rank-order BPE encode of one token (lowest-rank adjacent
    * pair merges first — training-order inverse). */
  private[text] def encodeToken(token: String,
                                rank: collection.Map[(String, String), Int]): Array[String] = {
    var syms = token.map(_.toString).toArray
    var go = syms.length > 1
    while (go) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) go = false
      else {
        val merged = syms(bestIdx) + syms(bestIdx + 1)
        syms = (syms.take(bestIdx) :+ merged) ++ syms.drop(bestIdx + 2)
        go = syms.length > 1
      }
    }
    syms
  }

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Shared WITH-fragments of the BPE oracles (r9): the fitted merge
    * list printed as a VALUES table (the [[graft.similarity.FittedOracle]]
    * printed-constant recipe), and the greedy [[encodeToken]] loop
    * replayed as a RECURSIVE CTE over the corpus's DISTINCT tokens —
    * each step merges the (lowest-rank, then leftmost) adjacent pair,
    * exactly the Scala loop's strictly-less argmin; the final state is
    * the minimum-length row per token (each merge shrinks the list by
    * one, so min(len) IS the fixpoint). Character splitting is by BMP
    * code unit on both engines (Java char == DuckDB character on the
    * BMP; astral-plane input is out of contract for the [a-z] corpus).
    * Cost is bounded by |distinct tokens| · max token length — the
    * vocabulary, not the corpus. */
  private def sqlBpeCommon(merges: Seq[(String, String)]): String = {
    // An empty merge list (degenerate corpus: fitOnDict found no pairs)
    // would render `FROM (VALUES )` — invalid SQL. Callers must omit the
    // oracle instead ([[graft.similarity.FittedOracle.oracleEntries]]
    // filters empty fits → the driver records rows-only).
    require(merges.nonEmpty, "BPE oracle needs a non-empty fitted merge list")
    val rows = merges.zipWithIndex
      .map { case ((l, r), i) => s"($i, ${sqlQuote(l)}, ${sqlQuote(r)})" }
      .mkString(",\n    ")
    s"""m(rank, l, r) AS (FROM (VALUES
       |    $rows)),
       |dtok AS (
       |  SELECT DISTINCT UNNEST(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS tok
       |  FROM documents),
       |rec AS (
       |  SELECT tok,
       |    list_transform(range(1, length(tok)+1), i -> tok[CAST(i AS INT)]) AS syms
       |  FROM dtok
       |  UNION ALL
       |  SELECT tok,
       |    list_concat(list_concat(
       |      syms[1:CAST(bi AS INT)-1],
       |      [syms[CAST(bi AS INT)] || syms[CAST(bi AS INT)+1]]),
       |      syms[CAST(bi AS INT)+2:]) AS syms
       |  FROM (
       |    SELECT tok, syms,
       |      (SELECT u.i FROM (SELECT UNNEST(range(1, len(syms))) AS i) u
       |         JOIN m ON m.l = syms[CAST(u.i AS INT)] AND m.r = syms[CAST(u.i AS INT)+1]
       |       ORDER BY m.rank, u.i LIMIT 1) AS bi
       |    FROM rec) WHERE bi IS NOT NULL),
       |pieces AS (SELECT tok, MIN(len(syms)) AS np FROM rec GROUP BY tok),
       |dt AS (
       |  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS tok
       |  FROM documents),
       |doc_pieces AS (
       |  SELECT dt.doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(pieces.np) AS BIGINT) AS n_pieces
       |  FROM dt JOIN pieces USING (tok) GROUP BY dt.doc_id)""".stripMargin
  }

  /** DuckDB replay of the TRAINING loop itself ([[wordDict]] +
    * [[fitOnDict]]) — the FULL oracle for `bpe_merges` (r9), and the one
    * fit oracle that cannot use printed constants: the query's output IS
    * the fit, so printing it would be circular. Instead the recursive
    * CTE recomputes it from the corpus: a single state row carries every
    * vocab word's segmentation plus the merge list; each step counts
    * adjacent pairs weighted by word frequency (dedup by
    * first-occurrence index — `list_distinct` can't hash structs),
    * elects the (count desc, left asc, right asc) argmax via a
    * `list_reduce` tournament, and merges left-to-right non-overlapping.
    * The non-overlap scan replays as pure positional arithmetic: a
    * match at i is taken iff its distance into the maximal consecutive
    * match run is even — exactly the `i += 2` greedy. Lambda-parameter
    * binding uses the `list_transform([x], v -> …)[1]` idiom (DuckDB
    * v1.0 has no let and no 3-arg list_reduce). Cost per step is
    * O(Σ|word|²) over the VOCABULARY — corpus-size-independent, like
    * the driver loop it mirrors. Recursion ends early when no adjacent
    * pairs remain (every word fully merged), matching `fitOnDict`'s
    * `done` flag. */
  def sqlMerges(nMerges: Int, maxVocabWords: Int = 100000): String = {
    val tokRe = "[^ \\t\\n\\x0B\\f\\r]+"
    // match-position list of word `wd.s` against the elected pair
    val mExpr = "list_transform(range(1, len(wd.s)+1), i -> " +
      "CASE WHEN i < len(wd.s) THEN wd.s[CAST(i AS INT)] = best.l AND " +
      "wd.s[CAST(i AS INT)+1] = best.r ELSE false END)"
    // greedy non-overlap selection: even offset into the consecutive run
    val selExpr = "list_transform(range(1, len(m)+1), i -> " +
      "m[CAST(i AS INT)] AND ((i - COALESCE(list_max(list_filter(range(1, i), " +
      "j -> NOT m[CAST(j AS INT)])), 0) - 1) % 2 = 0))"
    val newSyms = "flatten(list_transform(range(1, len(sel)+1), i -> " +
      "CASE WHEN sel[CAST(i AS INT)] THEN [wd.s[CAST(i AS INT)] || wd.s[CAST(i AS INT)+1]] " +
      "WHEN i > 1 AND sel[CAST(i AS INT)-1] THEN [] " +
      "ELSE [wd.s[CAST(i AS INT)]] END))"
    val mergeWord = s"list_transform([$mExpr], m -> " +
      s"list_transform([$selExpr], sel -> $newSyms)[1])[1]"
    val pairs = "flatten(list_transform(words, wd -> " +
      "list_transform(range(1, len(wd.s)), i -> " +
      "{'l': wd.s[CAST(i AS INT)], 'r': wd.s[CAST(i AS INT)+1], 'w': wd.n})))"
    val best = "list_reduce(list_transform(" +
      "list_filter(range(1, len(pairs)+1), i -> " +
      "len(list_filter(range(1, i), j -> pairs[CAST(j AS INT)].l = pairs[CAST(i AS INT)].l " +
      "AND pairs[CAST(j AS INT)].r = pairs[CAST(i AS INT)].r)) = 0), " +
      "k -> {'c': list_sum(list_transform(pairs, q -> CASE WHEN q.l = pairs[CAST(k AS INT)].l " +
      "AND q.r = pairs[CAST(k AS INT)].r THEN q.w ELSE 0 END)), " +
      "'l': pairs[CAST(k AS INT)].l, 'r': pairs[CAST(k AS INT)].r}), " +
      "(a, b) -> CASE WHEN b.c > a.c OR (b.c = a.c AND (b.l < a.l OR (b.l = a.l AND b.r < a.r))) " +
      "THEN b ELSE a END)"
    s"""WITH RECURSIVE
       |dict AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |    SELECT UNNEST(regexp_extract_all(lower(text), '$tokRe')) AS w FROM documents)
       |  GROUP BY w ORDER BY n DESC, w ASC LIMIT $maxVocabWords),
       |init AS (
       |  SELECT 0 AS round,
       |    list({'s': list_transform(range(1, length(w)+1), i -> w[CAST(i AS INT)]), 'n': n}) AS words,
       |    []::STRUCT(l VARCHAR, r VARCHAR)[] AS ms
       |  FROM dict),
       |rec AS (
       |  SELECT round, words, ms FROM init
       |  UNION ALL
       |  SELECT round + 1,
       |    list_transform(words, wd ->
       |      CASE WHEN len(wd.s) < 2 THEN wd ELSE {'s': $mergeWord, 'n': wd.n} END) AS words,
       |    list_append(ms, {'l': best.l, 'r': best.r}) AS ms
       |  FROM (
       |    SELECT round, words, ms, $best AS best
       |    FROM (SELECT round, words, ms, $pairs AS pairs
       |          FROM rec WHERE round < $nMerges)
       |    WHERE len(pairs) > 0)),
       |fin AS (SELECT ms FROM rec ORDER BY round DESC LIMIT 1)
       |SELECT CAST(x.rank AS BIGINT) AS rank, x.l AS "left", x.r AS "right",
       |       x.l || x.r AS piece
       |FROM (SELECT UNNEST(list_transform(range(1, len(ms)+1),
       |        i -> {'rank': i-1, 'l': ms[CAST(i AS INT)].l, 'r': ms[CAST(i AS INT)].r})) AS x
       |      FROM fin)
       |ORDER BY rank""".stripMargin
  }

  /** DuckDB mirror of [[encodeStats]] over the fitted merges — the FULL
    * oracle for `bpe_encode_stats` (r9). */
  def sqlEncodeStats(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE ${sqlBpeCommon(merges)}
       |SELECT doc_id, n_tokens, n_pieces,
       |  round(n_tokens::DOUBLE / n_pieces::DOUBLE, 4) AS compression
       |FROM doc_pieces WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin

  /** DuckDB mirror of [[graft.pipeline.Curation.packChunksBpe]] — the
    * FULL oracle for `sequence_packing_bpe` (r9): the recursive-CTE
    * piece counts feed the same prefix-sum chunk arithmetic the
    * `sequence_packing` oracle pins (id order, inclusive running sum
    * minus self as the offset). Docs with zero tokens pack 0 pieces and
    * span 0 chunks. */
  def sqlPackChunksBpe(merges: Seq[(String, String)], budget: Long): String =
    s"""WITH RECURSIVE ${sqlBpeCommon(merges)},
       |np AS (
       |  SELECT d.doc_id, COALESCE(p.n_pieces, 0) AS n_tokens
       |  FROM documents d LEFT JOIN doc_pieces p ON d.doc_id = p.doc_id),
       |o AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
       |  FROM np)
       |SELECT doc_id, n_tokens,
       |  CAST(floor(off / $budget.0) AS BIGINT) AS chunk_id,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE CAST(floor((off + n_tokens - 1) / $budget.0) -
       |                 floor(off / $budget.0) + 1 AS BIGINT) END AS n_chunks
       |FROM o ORDER BY doc_id""".stripMargin

  /** Per-document BPE PIECE counts as a packing unit
    * (doc id, n_tokens = Σ pieces over the doc's whitespace tokens):
    * trainers budget sequences in TOKENIZER units, not whitespace words,
    * so packing/quota arithmetic needs this as its `n_tokens` source
    * ([[graft.pipeline.Curation.packChunksBpe]]). Merge ranks broadcast;
    * the encode is a per-partition map — no shuffle. */
  def pieceCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val enc = udf { toks: Seq[String] =>
      var pieces = 0L
      toks.foreach { t => pieces += encodeToken(t, bc.value).length }
      pieces
    }
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as(idCol),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .select(col(idCol), enc(col("toks")).as("n_tokens"))
  }

  /** Tokenizer fertility by language (`bpe_fertility` query) — the
    * metric multilingual-tokenizer studies report per language: pieces
    * per whitespace word (fertility) and bytes per piece. A tokenizer
    * fitted on one language's data charges other scripts more pieces for
    * the same byte mass, which silently skews any token-denominated
    * budget (packing, quotas, compute estimates) against them — this is
    * the per-language audit behind those budgets.
    *
    * All three numerators/denominators are INTEGER sums (token counts,
    * piece counts, token byte lengths), so aggregation order can never
    * split the engines; the two ratios divide once at the end. Same
    * scale shape as [[encodeStats]]: broadcast rank table, per-partition
    * encode, ONE shuffle on the (bounded) language key. */
  def fertilityByLang(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val enc = udf { toks: Seq[String] =>
      var pieces = 0L
      toks.foreach { t => pieces += encodeToken(t, bc.value).length }
      pieces
    }
    graft.Par.widen(docs)
      .select(coalesce(col(langCol), lit("und")).as("lang"),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        enc(col("toks")).as("n_pieces"),
        aggregate(transform(col("toks"), t => octet_length(t).cast("long")),
          lit(0L), _ + _).as("n_bytes"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_bytes")).as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_pieces"),
        col("n_bytes"),
        round(col("n_pieces").cast("double") /
          col("n_tokens").cast("double"), 4).as("fertility"),
        round(col("n_bytes").cast("double") /
          col("n_pieces").cast("double"), 4).as("bytes_per_piece"))
      .orderBy(col("lang"))
  }

  /** DuckDB mirror of [[fertilityByLang]] over the fitted merges — the
    * FULL oracle for `bpe_fertility` (r10). `strlen` is DuckDB's byte
    * length, the twin of Spark's `octet_length`. */
  def sqlFertilityByLang(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE ${sqlBpeCommon(merges)},
       |db AS (
       |  SELECT doc_id, COALESCE(lang, 'und') AS lang,
       |    COALESCE(list_sum(list_transform(
       |      regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+'),
       |      t -> strlen(t))), 0) AS nb
       |  FROM documents),
       |j AS (
       |  SELECT db.lang, dp.n_tokens, dp.n_pieces, db.nb
       |  FROM doc_pieces dp JOIN db ON dp.doc_id = db.doc_id)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nb) AS BIGINT) AS n_bytes,
       |  round(SUM(n_pieces)::DOUBLE / SUM(n_tokens)::DOUBLE, 4) AS fertility,
       |  round(SUM(nb)::DOUBLE / SUM(n_pieces)::DOUBLE, 4) AS bytes_per_piece
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-document encode statistics (`bpe_encode_stats` query):
    * (doc_id, n_tokens, n_pieces, compression = round(tokens∕pieces, 4)).
    * The merge-rank table broadcasts; the encode is a per-partition map
    * over the token arrays — no shuffle, payloads never re-key. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val rankMap = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rankMap)
    val enc = udf { toks: Seq[String] =>
      var pieces = 0L
      toks.foreach { t => pieces += encodeToken(t, bc.value).length }
      pieces
    }
    graft.Par.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        enc(col("toks")).as("n_pieces"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_pieces"),
        round(col("n_tokens").cast("double") /
          col("n_pieces").cast("double"), 4).as("compression"))
      .orderBy(col("doc_id"))
  }
}
