package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] PII scrubbing for training corpora: detect and mask emails, phone
  * numbers, and IPv4 addresses before text ships to a training run.
  *
  * Pure per-row `regexp_*` expression work — no UDFs, no shuffle; the scan
  * stage does everything. Patterns are deliberately RE2-safe (no
  * backreferences or lookaround) so the exact same pattern string runs in
  * Spark's Java regex AND DuckDB's RE2 — the oracle executes these
  * literals verbatim (`pii_redact` query over an inline fixture with known
  * PII, VALUES-based oracle like `ingest_articles`).
  *
  * Masking phones before emails would corrupt addresses containing digit
  * runs; emails are masked FIRST, then IPs, then phones — pinned by
  * PiiSpec and by the oracle's mirrored replacement order.
  */
object Pii {

  /** Local-part @ domain.tld — ASCII pragmatic form, not full RFC 5322. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 7+ digit runs with optional +, separators, and parens — the
    * loose-match-then-mask convention of corpus scrubbing (precision is
    * sacrificed for recall on training text). */
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{5,}[0-9]"

  /** Dotted-quad IPv4 (no octet range check — scrubbing favors recall). */
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
  def ipCount(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long")
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")

  /** Mask all three classes: emails → `<EMAIL>`, IPv4 → `<IP>`, phones →
    * `<PHONE>`. Order matters (see object doc). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document counts + redacted text (`pii_redact` query). Counts
    * follow the masking precedence: each class is counted on the text
    * with the higher-precedence classes already masked, so an IPv4's
    * digit run is never double-reported as a phone number. */
  def scrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scrubUnordered(docs, idCol, textCol).orderBy(col(idCol))

  /** [[scrub]] without the final sort — the form that runs unchanged on a
    * STREAMING DataFrame (global sorts are illegal mid-stream; per-row
    * expressions are engine-mode-agnostic). StreamingSpec pins parity. */
  def scrubUnordered(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    docs.select(
      col(idCol),
      emailCount(t0).as("n_emails"),
      ipCount(t1).as("n_ips"),
      phoneCount(t2).as("n_phones"),
      regexp_replace(t2, PhoneRe, "<PHONE>").as("redacted"))
  }
}
