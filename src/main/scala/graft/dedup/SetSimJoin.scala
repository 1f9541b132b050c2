package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Mat.Pinnable

/** [EXT] Blockless EXACT set-similarity self-join via global-frequency
  * prefix filtering (`similarity_join_exact` query) — the AllPairs/PPJoin
  * family (Bayardo et al. 2007; Xiao et al. 2008) in the MapReduce shape
  * of Vernica et al. 2010.
  *
  * The repo's other two near-dup joins each trade something away:
  * [[Dedup.jaccardPairs]] is exact but needs a caller-supplied blocking
  * key to bound its quadratic fan-out (audit scope), and
  * [[Dedup.nearDupMinHash]] is blockless but probabilistic (LSH can miss
  * a qualifying pair). This operator is both blockless AND exact: every
  * pair with round(J, 4) ≥ t is emitted, none invented — the DuckDB
  * oracle computes brute-force relational Jaccard over ALL pairs, so the
  * correctness gate itself proves the pruning lossless.
  *
  * How the quadratic dies: tokens are globally ordered rarest-first
  * (ascending document frequency, ties by token). A set of size n with
  * threshold t only indexes its first p = n − ⌈t·n⌉ + 1 ordered tokens
  * (~n/10 at t = 0.9): if J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and
  * two sets overlapping that much MUST share a token inside both prefixes
  * (suffixes hold only ⌈t·n⌉ − 1 < |A∩B| tokens each — the standard
  * prefix-filtering lemma). Equi-joining prefix rows on the token finds
  * every qualifying pair, and because prefixes hold the RAREST tokens,
  * hot tokens (stopwords — the quadratic's usual engine) never generate
  * candidates. Two more per-row integer guards run inside the join:
  * the length filter (min ≥ t·max) and PPJoin's positional filter
  * (overlap upper bound 1 + min(n_a − i, n_b − j) must reach the
  * equivalent-overlap bound ⌈t/(1+t)·(n_a+n_b)⌉).
  *
  * 100 TB shape: candidates cross the exchange as (id_a, id_b) ONLY —
  * token arrays never ride the candidate join; verification re-joins the
  * pinned token table by id and runs the early-exit merge walk
  * ([[Dedup.jaccardSortedBounded]]). Every stage is an equi-join or
  * aggregate on a natural key (token, id, pair); nothing is broadcast by
  * hint (the token-frequency join is vocabulary-sized — AQE decides),
  * and no stage is quadratic in the corpus.
  */
object SetSimJoin {

  /** All unordered pairs with round(jaccard, 4) ≥ threshold over the
    * documents' token sets ([[Dedup.tokenSet]] — lowercased, distinct,
    * whitespace-split), no blocking key. Output: (id_a, id_b, jaccard)
    * with id_a < id_b, ordered. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    // Match the downstream round(J, 4) ≥ t comparison conservatively:
    // all integer bounds derive from tp, and the 1e-9 nudge keeps an
    // FP-inflated product from rounding a ceil UP past the true bound
    // (which would shrink a prefix below the lossless length).
    val tp = threshold - 0.5e-4
    def ceilBound(x: Column): Column =
      ceil(x * lit(tp) - lit(1e-9)).cast("int")

    // Token table, pinned once: it feeds the frequency aggregate, the
    // prefix generator, and BOTH verify joins — four consumers of one
    // expensive tokenize.
    val t = graft.Par.widen(df)
      .select(col(idCol).as("id"), Dedup.tokenSet(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0) // empty sets: J is 0/0 → null in both engines
      .pinned

    val e = t.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    // Global order = ascending (document frequency, token): rarest first,
    // strict total order. The order only shapes the CANDIDATE set (any
    // consistent total order is lossless) — outputs never depend on it.
    val freq = e.groupBy("tok").agg(count(lit(1)).as("df"))
    // Prefix rows: position i (1-based) of each of the first
    // p = n − ⌈tp·n⌉ + 1 ordered tokens. array_sort on (df, tok) structs
    // sorts by df then tok — exactly the global order.
    val pref = e.join(freq, Seq("tok"))
      .groupBy("id")
      .agg(first(col("n")).as("n"),
        array_sort(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("id"), col("n"),
        posexplode(expr(
          "transform(slice(ord, 1, cast(n - ceil(n * " + tp +
            " - 1e-9) + 1 as int)), s -> s.tok)")))
      .select(col("id"), col("n"), (col("pos") + 1).as("i"), col("col").as("tok"))
      .pinned

    // Candidate generation: prefix-token equi-join with the two integer
    // guards. Distinct column names per side — the renamed-projections
    // self-join discipline (see Dedup.setJaccardPairs).
    val a = pref.select(col("id").as("id_a"), col("n").as("n_a"),
      col("i").as("i_a"), col("tok").as("tok_a"))
    val b = pref.select(col("id").as("id_b"), col("n").as("n_b"),
      col("i").as("i_b"), col("tok").as("tok_b"))
    // Equivalent-overlap bound: J ≥ tp ⇔ |A∩B| ≥ tp/(1+tp)·(|A|+|B|).
    val minInter = ceil((col("n_a") + col("n_b")).cast("double")
      * lit(tp / (1.0 + tp)) - lit(1e-9)).cast("int")
    val cands = a.join(b,
        col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
          // length filter: min ≥ t·max
          least(col("n_a"), col("n_b")) >= ceilBound(
            greatest(col("n_a"), col("n_b")).cast("double")) &&
          // positional filter: tokens before i_a/i_b can't all be shared
          lit(1) + least(col("n_a") - col("i_a"), col("n_b") - col("i_b"))
            >= minInter)
      .select(col("id_a"), col("id_b")).distinct()

    // Verify: ids-only candidates pick their sorted token arrays back up
    // by id and run the early-exit merge walk. Exact, so the prefix and
    // positional pruning above can only ever remove work, never answers.
    val va = t.select(col("id").as("id_a"), col("toks").as("toks_a"),
      col("n").as("n_a"))
    val vb = t.select(col("id").as("id_b"), col("toks").as("toks_b"),
      col("n").as("n_b"))
    cands.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("jaccard", round(Dedup.jaccardSortedBounded(
        col("toks_a"), col("toks_b"), col("n_a"), col("n_b"), threshold), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Brute-force DuckDB mirror over a relation exposing (idCol, textCol):
    * exploded-token equi-join → per-pair intersection counts → J =
    * i/(n_a+n_b−i), NO pruning — the oracle that proves the Spark side's
    * prefix filtering lossless. Pairs sharing zero tokens have J = 0 < t
    * and are unrepresentable in both engines. */
  def sqlJaccardJoin(rel: String, idCol: String, textCol: String,
                     threshold: Double): String =
    s"""WITH tt AS (
       |  SELECT $idCol AS id,
       |         list_distinct(regexp_extract_all(lower($textCol),
       |                       '[^ \\t\\n\\x0B\\f\\r]+')) AS toks
       |  FROM $rel),
       |ss AS (SELECT id, len(toks) AS n, unnest(toks) AS tok
       |       FROM tt WHERE len(toks) > 0),
       |cc AS (
       |  SELECT sa.id AS id_a, sb.id AS id_b, sa.n AS n_a, sb.n AS n_b,
       |         count(*) AS i
       |  FROM ss sa JOIN ss sb ON sa.tok = sb.tok AND sa.id < sb.id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT id_a, id_b,
       |       round(i::DOUBLE / nullif(n_a + n_b - i, 0)::DOUBLE, 4) AS jaccard
       |FROM cc
       |WHERE round(i::DOUBLE / nullif(n_a + n_b - i, 0)::DOUBLE, 4) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
}
