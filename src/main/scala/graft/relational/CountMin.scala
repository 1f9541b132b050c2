package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Engine-reproducible Count-Min sketch (`cms_word_counts` query) —
  * the point-FREQUENCY member of the mergeable-sketch family, beside
  * [[Hll]] (cardinality) and [[QuantileSketch]] (rank). Reference anchor:
  * the dashboard's word-frequency surface (`app.py:30-31,60`); this is
  * the bounded-memory form that answers "how often does token X occur"
  * at corpus scale without ever keying an exchange by token.
  *
  * Where [[graft.text.HeavyHitters]]' Misra-Gries pass tracks only the
  * current head, a Count-Min sketch answers point queries for ANY key
  * asked AFTER the pass — the shape used for per-token corpus stats,
  * join-free frequency features, and repetition diagnostics at 100 TB.
  *
  * Construction (Cormode & Muthukrishnan): D independent hash rows of W
  * counters; every occurrence of a key increments cell (i, h_i(key)) for
  * each row i; a point estimate is min_i cell(i, h_i(key)) — always ≥
  * the true count, and ≤ true + εN with probability 1 − δ where
  * ε = e/W ≈ 0.53% (W = 512) and δ = e^−D ≈ 1.8% (D = 4).
  *
  * Engine-reproducible by the md5-prefix discipline (the r7/r8 recipe):
  * h_i(key) = 60-bit md5 prefix of `key ++ ":" ++ i` mod W — both
  * engines derive identical cells, and the counters are exact integers,
  * so the sketch TABLE and every ESTIMATE hash-match a DuckDB replay
  * (no float anywhere; the only arithmetic is count, sum, min).
  *
  * Scale shape: the token stream is never keyed by token — the only
  * exchange is the (row, col) cell aggregate, whose key space is D·W =
  * 2048 cells, so map-side combine collapses each partition to ≤ 2048
  * partial rows regardless of corpus size (the D-fold cell explode is
  * per-row map work before the partial aggregate). The sketch is
  * ADDITIVE: union any sketch tables and [[merge]]'s groupBy-sum
  * restores the sketch of the concatenated streams — per-batch/per-day
  * sketch tables persist as ≤ 2048-row parquet and absorb new batches in
  * O(batch), the same incremental contract as [[Hll.merge]]
  * (CountMinSpec pins sketch(a ∪ b) == merge(sketch(a), sketch(b))).
  */
object CountMin {

  /** Hash rows (depth): failure probability δ = e^−D ≈ 1.8%. */
  val D: Int = 4
  /** Counters per row (width): overestimate bound ε = e/W ≈ 0.53% of N. */
  val W: Int = 512

  /** The D (row, col) cells touched by one key, as an array of structs
    * (exploded by callers): col_i = low-60-bit md5(key ":" i) mod W. */
  private def cellArray(key: Column): Column =
    array((0 until D).map { i =>
      struct(lit(i).as("r"),
        pmod(conv(substring(md5(concat(key, lit(s":$i"))), 1, 15), 16, 10)
          .cast("long"), lit(W.toLong)).as("c"))
    }: _*)

  /** Sketch table (r, c, cnt) over a token-array column — ≤ D·W rows,
    * one map-side-combined aggregate. This is the PERSISTABLE state. */
  def sketchTokens(df: DataFrame, tokensExpr: Column): DataFrame =
    graft.Par.widen(df)
      .select(explode(tokensExpr).as("tok"))
      .select(explode(cellArray(col("tok"))).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketch tables (same D/W): groupBy-sum — counters are additive,
    * which is what makes the sketch incremental and partition-invariant. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a probe table: min over the D cells, missing
    * cells read 0. The sketch is ≤ D·W rows — broadcast it so the probe
    * side streams without an exchange. */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String): DataFrame =
    probes
      .select(probes.columns.map(col) :+ explode(cellArray(col(keyCol))).as("rc"): _*)
      .select(probes.columns.map(col) :+ col("rc.r").as("r") :+ col("rc.c").as("c"): _*)
      .join(broadcast(sk), Seq("r", "c"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_cms"))

  /** `cms_word_counts` query: the top-`topK` exact tokens (the audit
    * compare set — count desc, token asc, deterministic in both engines)
    * beside their Count-Min estimates. n_cms ≥ n_exact always (CMS never
    * undercounts); at W = 512 over the fixture vocabulary most probes
    * read exact. Output: (tok, n_exact, n_cms) ordered by count desc,
    * token asc. */
  def wordCountsWithExact(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val toksExpr = graft.text.TextAnalysis.tokens(lower(col(textCol)))
    val toks = graft.Par.widen(docs).select(explode(toksExpr).as("tok"))
    // Exact head for comparison: fixture-scale audit artifact (at 100 TB
    // the exact side is HeavyHitters' sketch+recount, not a full groupBy).
    val exact = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(topK)
    val sk = sketchTokens(docs, toksExpr)
    estimate(sk, exact, "tok")
      .select(col("tok"), col("n_exact"), col("n_cms"))
      .orderBy(col("n_exact").desc, col("tok").asc)
  }

  /** DuckDB mirror of [[wordCountsWithExact]] over a relation `from`
    * exposing a `text` column. */
  def sqlWordCounts(from: String, topK: Int): String = {
    val is = (0 until D).map(_.toString).mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+')) AS tok
       |  FROM $from),
       |sk AS (
       |  SELECT i AS r,
       |    ('0x' || substring(md5(tok || ':' || i), 1, 15))::UBIGINT::BIGINT % $W AS c,
       |    COUNT(*) AS cnt
       |  FROM toks CROSS JOIN (SELECT unnest([$is]) AS i)
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT tok, COUNT(*) AS n_exact FROM toks GROUP BY 1
       |  ORDER BY n_exact DESC, tok LIMIT $topK),
       |probe AS (
       |  SELECT tok, n_exact, i AS r,
       |    ('0x' || substring(md5(tok || ':' || i), 1, 15))::UBIGINT::BIGINT % $W AS c
       |  FROM exact CROSS JOIN (SELECT unnest([$is]) AS i)),
       |est AS (
       |  SELECT p.tok, p.n_exact, MIN(COALESCE(sk.cnt, 0)) AS n_cms
       |  FROM probe p LEFT JOIN sk USING (r, c)
       |  GROUP BY 1, 2)
       |SELECT tok, n_exact, n_cms FROM est
       |ORDER BY n_exact DESC, tok""".stripMargin
  }
}
