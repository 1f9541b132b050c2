// In org.apache.spark.sql.graft for access to FunctionRegistry's
// private[sql] ExpressionBuilder plumbing via expressionInfo helpers.
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer exposing graft's native expressions
  * to SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  * }}}
  *
  * Registration is additive — no built-in rule, strategy, or function is
  * altered (SURVEY §4: Catalyst is sufficient for parity; our extensions
  * are performance expressions only).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}

object GraftExtensions {

  /** Fold a foldable SQL argument to Int, accepting any integral numeric
    * literal (`4`, `4L`, a SMALLINT cast, …). A bare `asInstanceOf[Int]`
    * would throw an opaque ClassCastException on a BIGINT literal. */
  private def intArg(fn: String, pos: Int, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got non-foldable ${e.sql}")
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_sorted_intersect_size"),
      info("graft_sorted_intersect_size",
        "graft_sorted_intersect_size(a, b) - |A∩B| of sorted distinct string arrays"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    (FunctionIdentifier("graft_sorted_intersect_size_bounded"),
      info("graft_sorted_intersect_size_bounded",
        "graft_sorted_intersect_size_bounded(a, b, minInter) - |A∩B| with early " +
          "exit once the bound is unreachable (exact at or above minInter)"),
      (args: Seq[Expression]) => SortedIntersectSizeBounded(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(hashes) - 64-bit SimHash of an array<long> of token hashes"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("graft_first_equal_index"),
      info("graft_first_equal_index",
        "graft_first_equal_index(a, b) - first position where two array<long> agree, -1 if none"),
      (args: Seq[Expression]) => FirstEqualIndex(args(0), args(1))),
    (FunctionIdentifier("graft_split_ws"),
      info("graft_split_ws",
        "graft_split_ws(text) - \\S+ tokens via a byte scan, regex-identical"),
      (args: Seq[Expression]) => SplitWhitespace(args(0))),
    (FunctionIdentifier("graft_minhash_band_buckets"),
      info("graft_minhash_band_buckets",
        "graft_minhash_band_buckets(tokens, numHashes, bands) - one-pass MinHash " +
          "signature folded into per-band LSH buckets (array<long>, length bands)"),
      (args: Seq[Expression]) => MinHashBandBuckets(args(0),
        intArg("graft_minhash_band_buckets", 1, args(1)),
        intArg("graft_minhash_band_buckets", 2, args(2)))),
    (FunctionIdentifier("graft_winnow_mins"),
      info("graft_winnow_mins",
        "graft_winnow_mins(hashes, w) - distinct w-window minima of a hash " +
          "stream (winnowing fingerprint selection)"),
      (args: Seq[Expression]) => WinnowMins(args(0),
        intArg("graft_winnow_mins", 1, args(1)))),
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC normalization (canonicalize before " +
          "dedup keys/tokenization); DuckDB mirror: nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    (FunctionIdentifier("graft_luhn_valid"),
      info("graft_luhn_valid",
        "graft_luhn_valid(candidate) - Luhn checksum validity of a 13-19 " +
          "digit card-number run (separators permitted)"),
      (args: Seq[Expression]) => LuhnValid(args(0))))

  /** Register into an ALREADY RUNNING session (the extensions config only
    * applies at builder time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
