package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** [EXT] Heavy-hitter tokens via a distributed Misra-Gries sketch + exact
  * recount (`heavy_hitters` query) — frequent-item mining at corpus scale
  * without ever shuffling the token stream.
  *
  * The naive formulation (explode → groupBy(token) → count → top-k)
  * re-keys every token in the corpus: at 100 TB that is the whole corpus
  * through one exchange, with the skewed head ("the", "a") hammering
  * single reducers. This operator never does that:
  *
  *  1. **Sketch pass** — each partition folds its tokens into a local
  *     Misra-Gries summary of `capacity` counters (bounded memory,
  *     amortized O(1) per token: a decrement event pays down `capacity`
  *     prior increments). Partition sketches merge associatively
  *     (counter-sum, then subtract the (capacity+1)-th largest value —
  *     the Agarwal et al. mergeable-summaries construction) up a
  *     `treeReduce`, so the driver receives ONE sketch of ≤ `capacity`
  *     entries no matter how many partitions ran. The same pass carries
  *     the exact total token count `N` alongside.
  *  2. **Exact recount** — the ≤ `capacity` candidate tokens broadcast
  *     back; the corpus stream is filtered to candidates at the scan
  *     (an `isin` probe inside codegen) and only survivors aggregate —
  *     a hash agg over ≤ `capacity` distinct keys, map-side combined,
  *     so the exchange carries ≤ capacity·partitions tiny rows.
  *
  * Output contract: exactly the tokens whose true count satisfies
  * `count · (capacity+1) > N`, with EXACT counts, ordered by count desc
  * then token asc, truncated to `topK`. The MG guarantee (estimate ≥
  * true − N/(capacity+1)) means every such token survives phase 1, and
  * phase 2's exact counts make sketch error invisible — the result is
  * deterministic and equal to the naive global top-k above the
  * threshold, which is why this query carries a full DuckDB oracle
  * (integer cross-multiplied threshold, no floats anywhere).
  *
  * Reference anchor: frequency analysis over crawled text is the
  * dashboard's word-frequency surface (app.py:30-31,60) — this is its
  * 100 TB-safe generalization.
  */
object HeavyHitters {

  /** Misra-Gries fold of one token iterator into ≤ capacity counters. */
  private[text] def sketchPartition(it: Iterator[String], capacity: Int):
      (mutable.HashMap[String, Long], Long) = {
    val m = mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { t =>
      n += 1
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < capacity => m.update(t, 1L)
        case None =>
          // decrement-all; drop zeros. Amortized: each such event
          // consumes `capacity` previous increments.
          val dead = mutable.ArrayBuffer.empty[String]
          m.keysIterator.foreach { k =>
            val c = m(k) - 1
            if (c == 0) dead += k else m.update(k, c)
          }
          dead.foreach(m.remove)
      }
    }
    (m, n)
  }

  /** Associative merge: sum counters, then (if over capacity) subtract
    * the (capacity+1)-th largest count from all and drop non-positives —
    * keeps the summary's error bound additive across merges. */
  private[text] def merge(a: mutable.HashMap[String, Long],
                          b: mutable.HashMap[String, Long],
                          capacity: Int): mutable.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
    if (big.size > capacity) {
      val kth = big.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      big.keysIterator.foreach { k =>
        val c = big(k) - kth
        if (c <= 0) dead += k else big.update(k, c)
      }
      dead.foreach(big.remove)
    }
    big
  }

  /** Heavy-hitter tokens of `textCol` (whitespace tokens, lowercased —
    * the library-wide tokenizer contract): every token with
    * `count · (capacity+1) > N`, exact counts, top `topK`. */
  def topTokens(docs: DataFrame, textCol: String,
                capacity: Int = 2000, topK: Int = 50): DataFrame = {
    require(capacity > 0 && topK > 0, "need capacity > 0 and topK > 0")
    val tokens = graft.Par.widen(docs)
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val parts = tokens.select(col("token")).rdd
      .mapPartitions { it => Iterator.single(sketchPartition(it.map(_.getString(0)), capacity)) }
    val (sketch, n) =
      if (parts.getNumPartitions == 0) (mutable.HashMap.empty[String, Long], 0L)
      else parts.treeReduce { case ((ma, na), (mb, nb)) => (merge(ma, mb, capacity), na + nb) }
    val candidates = sketch.keys.toSeq
    // Exact recount over candidates only. The threshold is the integer
    // cross-multiplication of count > N/(capacity+1) — no division, no
    // floats, same expression in the oracle.
    tokens.filter(col("token").isin(candidates: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") * (capacity + 1).toLong > n)
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)
  }
}
