package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] JSONL (newline-delimited JSON) document records — the exchange
  * format LLM corpora actually ship in (Dolma, RedPajama, most HF text
  * datasets publish `*.jsonl[.gz]`): one JSON object per line, schema'd
  * by convention. The reference holds rows in a database (crawl.py:119);
  * at corpus scale the interchange artifact IS the dataset, so the
  * engine must both read and write it.
  *
  * Execution shape: lines arrive from any source (`spark.read.text` over
  * a directory at scale — splittable, one task per split) and parsing is
  * a pure per-row `from_json` projection — scan-stage, codegen'd, no
  * UDF, no shuffle. Rendering is the mirror-image per-row string
  * construction. Both directions are expressions, so they run where the
  * bytes are.
  *
  * The correctness story is the WARC recipe (`warc_records`): both
  * engines CONSTRUCT the same lines (shared escape chain below), then
  * each parses with its own JSON machinery — the `jsonl_documents` gate
  * proves parse(render(x)) == x through two independent JSON parsers,
  * escapes included.
  */
object Jsonl {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("lang", StringType), StructField("text", StringType)))

  /** JSON string-escape as a column expression: backslash FIRST (later
    * steps insert backslashes), then quote and the control chars JSON
    * must escape that web text actually carries (LF/CR/TAB). Other
    * control chars (< 0x20) are out of the renderer's contract —
    * documented, and [[graft.text.Encoding]]'s hygiene pass is the
    * stage that strips them upstream. */
  private[sources] def esc(c: Column): Column = {
    val steps = Seq("\\" -> "\\\\", "\"" -> "\\\"",
      "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      org.apache.spark.sql.functions.replace(acc, lit(from), lit(to))
    }
  }

  /** One JSONL line per document — the writer side. NULL fields null
    * the whole line (Spark concat semantics) rather than silently
    * rendering `"null"` strings: a corpus writer decides its null
    * policy upstream (coalesce to sentinels, or drop) — an interchange
    * file with ambiguous nulls is worse than a loud one. JsonlSpec pins
    * the behavior. */
  def render(docs: DataFrame): DataFrame =
    docs.select(concat(
      lit("{\"doc_id\": "), col("doc_id").cast("string"),
      lit(", \"source\": \""), esc(col("source")),
      lit("\", \"lang\": \""), esc(col("lang")),
      lit("\", \"text\": \""), esc(col("text")), lit("\"}")).as("line"))

  /** Parse JSONL lines into typed document rows (the reader side):
    * per-row `from_json`, malformed lines surface as all-null rows
    * rather than killing the job (PERMISSIVE — the standard corpus-read
    * posture; count them and decide, don't crash 100 TB in). */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame =
    lines.select(from_json(col(lineCol), schema).as("j")).select(col("j.*"))

  /** The same construction as [[render]] in DuckDB SQL (the shared-
    * construction discipline — escaping quirks cancel because both
    * engines build identical bytes). */
  def sqlRenderExpr(idExpr: String, sourceExpr: String, langExpr: String,
                    textExpr: String): String = {
    def e(x: String) =
      "replace(replace(replace(replace(replace(" + x +
        """, '\', '\\'), '"', e'\\"'), e'\n', e'\\n'), e'\r', e'\\r'), e'\t', e'\\t')"""
    s"""'{"doc_id": ' || $idExpr || ', "source": "' || ${e(sourceExpr)} ||
       |'", "lang": "' || ${e(langExpr)} || '", "text": "' || ${e(textExpr)} ||
       |'"}'""".stripMargin
  }
}
