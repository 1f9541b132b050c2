package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F8: lenient publish-date parsing (`/root/reference/app.py:88-92` uses
  * `dateutil.parser.parse` inside try/except-continue).
  *
  * Parity contract: parse the formats the reference WRITER can actually
  * emit (`crawl.py:88-100` — ISO-8601 from `<time datetime>`, meta-tag
  * content, and common free-text forms) plus the wider shapes dateutil
  * accepts from real pages (RFC-2822 `Tue, 01 Mar 2024 10:15:30 GMT`,
  * month-name-with-time, `yyyy/mm/dd`, `dd Mon yyyy`), null on anything
  * else; the caller filters nulls exactly like the reference's
  * `continue`. Built on `try_to_timestamp` so ANSI mode never turns a bad
  * date into a failed job (ST4 failure isolation).
  *
  * RFC-2822's leading weekday is stripped BEFORE the cascade (both
  * engines, same regex): Spark's datetime patterns can format but not
  * parse 'E', and the weekday is redundant with the date anyway —
  * dateutil likewise ignores it. Offset-bearing forms normalize to the
  * session zone (UTC, pinned in build.sbt), which DuckDB's `%z` mirrors.
  *
  * Ambiguous slash dates follow dateutil's DEFAULT resolution
  * (`dayfirst=False`, what the reference actually runs): '01/03/2024'
  * is January 3 (month-first), '13/03/2024' is March 13 (the invalid
  * month-first parse falls through to day-first). The cascade encodes
  * this as MM/dd BEFORE dd/MM — both engines reject month 13 rather
  * than rolling it over, so the fallback is engine-exact.
  *
  * Free-text tail (r12, closing the r11 verdict's documented dateutil
  * divergence): dateutil's tokenizer DROPS ordinal suffixes after a
  * number ("March 3rd" == "March 3" — and "3th" too: the suffix is
  * stripped whether or not it grammatically matches) and a trailing
  * period on a month-name token ("Sept." == "Sept", its own alias for
  * September). Both are pre-normalizations here, run BEFORE the format
  * cascade with the identical regex chain in both engines (replacement
  * syntax differs — Java `$1` vs RE2 `\1` — the patterns are shared
  * constants). Day-of-month uses Spark 'd' / DuckDB '%-d' throughout:
  * both accept padded AND unpadded digits (probed: '01 Mar' and
  * '3 Mar' under the same pattern), so single-digit free-text days
  * parse without doubling the cascade. Comma-less month-name forms
  * ("March 3 2024 [10:30 AM]") complete the dateutil breadth. Still
  * out of contract, documented: "3rd of March 2024" ('of' needs
  * dateutil's fuzzy mode, which app.py does not enable) and free-text
  * with DEFAULTED fields ("March 2024" — dateutil fills day from
  * 'today', nondeterministic by design, poison for a reproducible
  * pipeline).
  */
object Dates {

  /** Shared pre-normalization regexes (Java and RE2 dialect-compatible:
    * inline (?i), ASCII \b, alternation + one capture group only). */
  val OrdinalPat = "(?i)\\b(\\d{1,2})(st|nd|rd|th)\\b"
  val MonthDotPat =
    "\\b(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sept|Sep|Oct|Nov|Dec)\\."
  val SeptPat = "\\bSept\\b"

  /** Pattern cascade, first match wins. Each Spark pattern has the DuckDB
    * `try_strptime` twin used by the oracle — keep the two lists in sync. */
  val SparkFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ssXXX",        // 2024-03-01T10:15:30+00:00 / Z
    "yyyy-MM-dd'T'HH:mm:ss",           // 2024-03-01T10:15:30
    "yyyy-MM-dd HH:mm:ss",             // 2024-03-01 10:15:30
    "yyyy-MM-dd",                      // 2024-03-01
    "d MMM yyyy HH:mm:ss 'GMT'",       // (RFC-2822, weekday stripped) … GMT
    "d MMM yyyy HH:mm:ss xx",          // (RFC-2822) … +0200
    "d MMM yyyy HH:mm:ss",             // 01 Mar 2024 10:15:30 / 3 Mar …
    "d MMM yyyy",                      // 15 Mar 2024 / 3 Mar 2024
    "d MMMM yyyy HH:mm:ss",            // 3 March 2024 10:15:30
    "d MMMM yyyy",                     // 15 March 2024 (full month name)
    "MMMM d, yyyy h:mm a",             // March 1, 2024 10:30 AM
    "MMMM d, yyyy",                    // March 1, 2024
    "MMM d, yyyy",                     // Mar 1, 2024
    "MMMM d yyyy h:mm a",              // March 3 2024 10:30 AM (comma-less)
    "MMMM d yyyy",                     // March 3 2024
    "MMM d yyyy",                      // Mar 3 2024
    "yyyy/MM/dd",                      // 2024/03/01
    "yyyy.MM.dd",                      // 2024.03.01
    "MM/dd/yyyy",                      // 01/03/2024 → Jan 3 (dateutil default)
    "dd/MM/yyyy")                      // 13/03/2024 → Mar 13 (month-first fails)

  val DuckDbFormats: Seq[String] = Seq(
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%-d %b %Y %H:%M:%S GMT",
    "%-d %b %Y %H:%M:%S %z",
    "%-d %b %Y %H:%M:%S",
    "%-d %b %Y",
    "%-d %B %Y %H:%M:%S",
    "%-d %B %Y",
    "%B %-d, %Y %-I:%M %p",
    "%B %-d, %Y",
    "%b %-d, %Y",
    "%B %-d %Y %-I:%M %p",
    "%B %-d %Y",
    "%b %-d %Y",
    "%Y/%m/%d",
    "%Y.%m.%d",
    "%m/%d/%Y",
    "%d/%m/%Y")

  private val WeekdayPrefix = "^(Mon|Tue|Wed|Thu|Fri|Sat|Sun),\\s*"

  /** Null-safe lenient parse: first format in the cascade that accepts the
    * string; null when none do. Pre-normalization order matters:
    * weekday prefix, then ordinal suffixes, then dotted months, then
    * the Sept alias ("Sept." needs the dot strip FIRST to become
    * "Sept", which the alias then maps to the parseable "Sep"). */
  def parsePublished(raw: Column): Column = {
    val pre = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      trim(raw), WeekdayPrefix, ""), OrdinalPat, "$1"), MonthDotPat, "$1"),
      SeptPat, "Sep")
    coalesce(SparkFormats.map(f => try_to_timestamp(pre, lit(f))): _*)
  }

  /** DuckDB expression mirroring [[parsePublished]] for oracle SQL
    * (same pattern constants; RE2 backreference dialect). The three
    * non-anchored replaces pass the 'g' option: Spark's regexp_replace
    * is always global while DuckDB's defaults to first-match-only, so
    * without it a raw string carrying TWO ordinals ("3rd ... 21st")
    * would diverge between the engines (the ^-anchored weekday strip is
    * first-only by construction and needs no flag). */
  def duckDbParse(rawExpr: String): String = {
    val pre = s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"trim($rawExpr), '$WeekdayPrefix', ''), '$OrdinalPat', '\\1', 'g'), " +
      s"'$MonthDotPat', '\\1', 'g'), '$SeptPat', 'Sep', 'g')"
    "COALESCE(" +
      DuckDbFormats.map(f => s"try_strptime($pre, '$f')").mkString(", ") +
      ")"
  }
}
