package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Encoding hygiene for web corpora: mojibake repair and
  * damage profiling — the "fix the bytes before you filter the words"
  * stage every crawl-derived corpus needs (ftfy's most common case, as
  * a table-driven engine-exact operator).
  *
  * Mojibake here means the classic single-round corruption: UTF-8 bytes
  * decoded as Windows-1252 somewhere in the document's past
  * (`café` → `cafÃ©`, `don’t` → `donâ€™t`). The repair table maps each
  * corrupted form back to its character; both engines replay the SAME
  * printed (bad → good) pairs in the same order as literal chained
  * `replace`, so the oracle is exact. One pass by design — double-encoded
  * text (mojibake of mojibake) repairs one round per application.
  *
  * The table is GENERATED, not hand-typed: for each target character the
  * corrupted form is `new String(target.getBytes(UTF_8), windows-1252)`.
  * Targets whose UTF-8 bytes hit one of cp1252's five undefined slots
  * (0x81/8D/8F/90/9D — e.g. the right double quote U+201D needs 0x9D)
  * are excluded up front: their corrupted form depends on the decoder's
  * lenience and would not round-trip portably. The builder asserts every
  * emitted pair is ASCII-free, which is what makes plain `replace` (no
  * regex quoting in either engine) safe.
  *
  * Everything here is per-row scan-stage expression work — no UDFs, no
  * shuffle; counts are `regexp_extract_all` sizes with RE2-safe patterns
  * run verbatim by the DuckDB oracle.
  */
object Encoding {

  import java.nio.charset.{Charset, StandardCharsets}

  private val Cp1252 = Charset.forName("windows-1252")

  /** Characters worth repairing, 3-byte UTF-8 (punctuation/symbols)
    * before 2-byte (accented Latin) so longer corrupted forms are fixed
    * first. U+201D (right double quote) is deliberately absent — see
    * object doc. */
  private val Targets: Seq[String] = Seq(
    "’", "‘", "“", "–", "—", "…", "€",
    "™",
    "é", "è", "ê", "ë", "à", "â", "ä", "ç", "í", "î", "ï", "ñ",
    "ó", "ô", "ö", "ú", "ü", "ù", "°", "«", "»")

  /** (corrupted, original) pairs, applied in order. */
  val MojibakePairs: Seq[(String, String)] = {
    val pairs = Targets.map { g =>
      new String(g.getBytes(StandardCharsets.UTF_8), Cp1252) -> g
    }
    pairs.foreach { case (bad, good) =>
      require(!bad.contains('�'),
        s"target '$good' hits an undefined cp1252 slot; exclude it")
      require(bad.forall(_ > 0x7F),
        s"corrupted form of '$good' contains ASCII — literal replace unsafe")
    }
    pairs
  }

  /** Corrupted form of a repair target (fixture-building helper — keeps
    * planted fixtures derived from the same table the repair applies). */
  def moj(good: String): String =
    MojibakePairs.find(_._2 == good)
      .getOrElse(sys.error(s"'$good' is not a repair target"))._1

  /** One repair pass over `text` — chained literal `replace` in table
    * order. */
  def fixMojibake(text: Column): Column =
    MojibakePairs.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** DuckDB twin of [[fixMojibake]] — same pairs, same order, same
    * literal `replace`. */
  def sqlFixMojibake(t: String): String =
    MojibakePairs.foldLeft(t) { case (e, (bad, good)) =>
      s"replace($e, '${sqlEsc(bad)}', '${sqlEsc(good)}')"
    }

  /** Per-document repair report (`mojibake_repair` query): the fixed
    * text, whether anything changed, and the codepoint count recovered
    * (each repair shrinks the text — corrupted forms are strictly longer
    * than their originals). */
  def repair(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fixed = fixMojibake(col(textCol))
    docs.select(
        col(idCol),
        fixed.as("fixed"),
        (length(col(textCol)) - length(fixed)).cast("long").as("chars_recovered"),
        (fixed =!= col(textCol)).as("changed"))
      .orderBy(col(idCol))
  }

  /** DuckDB twin of [[repair]] over `textExpr` in `docsRel`. */
  def sqlRepair(docsRel: String, idCol: String, textExpr: String): String = {
    val fixed = sqlFixMojibake(textExpr)
    s"""SELECT $idCol, $fixed AS fixed,
       |  CAST(length($textExpr) - length($fixed) AS BIGINT) AS chars_recovered,
       |  ($fixed <> $textExpr) AS changed
       |FROM $docsRel ORDER BY $idCol""".stripMargin
  }

  // ---- damage profiling ----

  /** C0 controls except tab/newline/carriage-return — legitimate text
    * never contains these; their presence marks binary spill or encoding
    * damage. */
  val ControlRe = "[\\x{0001}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}]"

  /** The two high-precision mojibake markers: Ã (every corrupted 2-byte
    * Latin char starts with it) and the â€ prefix of corrupted
    * punctuation. */
  val MojibakeMarkerRe = "Ã|â€"

  /** ASCII printable + whitespace; everything outside counts as
    * non-ASCII content (legitimate for non-English text — a ratio
    * signal, not a gate by itself). */
  val AsciiRe = "[ -~\\t\\n\\r]"

  private def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Per-document encoding-damage profile (`encoding_hygiene` query):
    * replacement-character count (a decoder already gave up once),
    * stray-control count, mojibake-marker count, non-ASCII codepoint
    * count, and the damage flag a pipeline gates on. */
  def hygiene(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nRepl = countMatches(t, "�")
    val nCtl = countMatches(t, ControlRe)
    val nMoj = countMatches(t, MojibakeMarkerRe)
    docs.select(
        col(idCol),
        nRepl.as("n_replacement"),
        nCtl.as("n_control"),
        nMoj.as("n_mojibake"),
        length(regexp_replace(t, AsciiRe, "")).cast("long").as("n_non_ascii"),
        (nRepl > 0 || nCtl > 0 || nMoj > 0).as("damaged"))
      .orderBy(col(idCol))
  }

  /** DuckDB twin of [[hygiene]]. */
  def sqlHygiene(docsRel: String, idCol: String, textExpr: String): String = {
    def cnt(re: String) =
      s"CAST(len(regexp_extract_all($textExpr, '$re')) AS BIGINT)"
    val nRepl = cnt("�")
    val nCtl = cnt(ControlRe)
    val nMoj = cnt(MojibakeMarkerRe)
    s"""SELECT $idCol,
       |  $nRepl AS n_replacement,
       |  $nCtl AS n_control,
       |  $nMoj AS n_mojibake,
       |  CAST(length(regexp_replace($textExpr, '$AsciiRe', '', 'g')) AS BIGINT)
       |    AS n_non_ascii,
       |  ($nRepl > 0 OR $nCtl > 0 OR $nMoj > 0) AS damaged
       |FROM $docsRel ORDER BY $idCol""".stripMargin
  }

  private def sqlEsc(s: String): String = s.replace("'", "''")
}
