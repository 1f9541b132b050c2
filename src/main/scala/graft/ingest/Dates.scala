package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F8: lenient publish-date parsing (`/root/reference/app.py:88-92` uses
  * `dateutil.parser.parse` inside try/except-continue).
  *
  * Parity contract: parse the formats the reference WRITER can actually
  * emit (`crawl.py:88-100` — ISO-8601 from `<time datetime>`, meta-tag
  * content, and common free-text forms), null on anything else; the
  * caller filters nulls exactly like the reference's `continue`. Built on
  * `try_to_timestamp` so ANSI mode never turns a bad date into a failed
  * job (ST4 failure isolation).
  */
object Dates {

  /** Pattern cascade, first match wins. Each Spark pattern has the DuckDB
    * `try_strptime` twin used by the oracle — keep the two lists in sync. */
  val SparkFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ssXXX",   // 2024-03-01T10:15:30+00:00 / Z
    "yyyy-MM-dd'T'HH:mm:ss",      // 2024-03-01T10:15:30
    "yyyy-MM-dd HH:mm:ss",        // 2024-03-01 10:15:30
    "yyyy-MM-dd",                 // 2024-03-01
    "MMMM d, yyyy",               // March 1, 2024
    "MMM d, yyyy",                // Mar 1, 2024
    "dd/MM/yyyy")                 // 01/03/2024

  val DuckDbFormats: Seq[String] = Seq(
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%B %-d, %Y",
    "%b %-d, %Y",
    "%d/%m/%Y")

  /** Null-safe lenient parse: first format in the cascade that accepts the
    * string; null when none do. */
  def parsePublished(raw: Column): Column =
    coalesce(SparkFormats.map(f => try_to_timestamp(trim(raw), lit(f))): _*)

  /** DuckDB expression mirroring [[parsePublished]] for oracle SQL. */
  def duckDbParse(rawExpr: String): String =
    "COALESCE(" +
      DuckDbFormats.map(f => s"try_strptime(trim($rawExpr), '$f')").mkString(", ") +
      ")"
}
