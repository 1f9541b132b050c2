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

  // ---- credit-card class (Luhn-gated, r10) ----

  /** Card-number CANDIDATE runs: digits with optional space/dash
    * separators, 13-25 chars, digit-bounded. Deliberately loose — the
    * Luhn gate (not the regex) decides validity, so phone-length digit
    * runs become candidates and are rejected arithmetically. Greedy,
    * non-overlapping, identical in Java regex and RE2. */
  val CcCandidateRe = "[0-9][0-9 -]{11,23}[0-9]"

  /** Per-document credit-card scan (`pii_credit_cards` query): candidate
    * count, Luhn-valid count, and a CONDITIONALLY redacted text — the
    * corpus-scrubbing convention for card numbers is stricter than for
    * emails/phones: any document containing one VALIDATED card number
    * has ALL its card-like runs masked (a doc that leaks one real PAN
    * can't be trusted to hold only fake ones), while documents whose
    * digit runs all fail Luhn keep their text (invoice ids, serials,
    * timestamps — masking those would damage clean training text).
    *
    * Pure scan-stage: `regexp_extract_all` + a codegen'd
    * [[org.apache.spark.sql.graft.LuhnValid]] inside the filter lambda;
    * no shuffle, no UDF. The oracle replays the identical arithmetic via
    * [[sqlCreditCards]]. */
  def creditCards(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CcCandidateRe), lit(0))
    val nValid = size(filter(cands,
      c => org.apache.spark.sql.graft.ArrayFunctions.luhnValid(c)))
    docs.select(
        col(idCol),
        size(cands).cast("long").as("n_candidates"),
        nValid.cast("long").as("n_valid"),
        when(nValid > 0,
          regexp_replace(col(textCol), CcCandidateRe, "<CC>"))
          .otherwise(col(textCol)).as("redacted"))
      .orderBy(col(idCol))
  }

  /** DuckDB lambda body mirroring [[org.apache.spark.sql.graft.LuhnValid]]
    * over a stripped digit-string variable `d` (bind it with
    * `list_filter(digs, d -> ...)`): same 13-19 length gate, same
    * double-every-second-from-the-right fold. */
  def sqlLuhnValid(d: String): String = {
    val dig = s"CAST(substr(reverse($d), CAST(i + 1 AS INT), 1) AS BIGINT)"
    s"""(len($d) BETWEEN 13 AND 19 AND
       |     list_sum(list_transform(range(0, len($d)), i ->
       |       CASE WHEN i % 2 = 1 THEN
       |         CASE WHEN 2 * $dig > 9 THEN 2 * $dig - 9 ELSE 2 * $dig END
       |       ELSE $dig END)) % 10 = 0)""".stripMargin
  }

  /** DuckDB twin of [[creditCards]] over relation `docsRel` whose text is
    * the SQL expression `textExpr` (fixture planting happens inline). */
  def sqlCreditCards(docsRel: String, idCol: String, textExpr: String): String =
    s"""WITH __cc AS (
       |  SELECT $idCol, $textExpr AS __t,
       |    list_transform(regexp_extract_all($textExpr, '$CcCandidateRe'),
       |                   x -> regexp_replace(x, '[^0-9]', '', 'g')) AS digs
       |  FROM $docsRel),
       |__ccv AS (
       |  SELECT $idCol, __t, CAST(len(digs) AS BIGINT) AS n_candidates,
       |    CAST(len(list_filter(digs, d -> ${sqlLuhnValid("d")})) AS BIGINT)
       |      AS n_valid
       |  FROM __cc)
       |SELECT $idCol, n_candidates, n_valid,
       |  CASE WHEN n_valid > 0
       |       THEN regexp_replace(__t, '$CcCandidateRe', '<CC>', 'g')
       |       ELSE __t END AS redacted
       |FROM __ccv ORDER BY $idCol""".stripMargin

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
