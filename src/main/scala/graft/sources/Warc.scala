package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] WARC (ISO 28500) record reader (`warc_records` query) — the
  * format every web-scale corpus actually arrives in (Common Crawl
  * publishes WARC; a crawl pipeline that can't read it starts with an
  * out-of-engine conversion job). The reference's crawler
  * (crawl.py:29-45) holds pages in memory and never touches an archive
  * format; at 100 TB the archive IS the input.
  *
  * Execution shape: WARC files are the SPLIT UNIT — one ~1 GB archive
  * per task, the standard Spark/CC arrangement (`spark.read.format
  * ("binaryFile")` or a (path, bytes) frame from any source), and record
  * parsing is a per-file byte walk inside `flatMap`: genuine imperative
  * per-partition logic, the documented exception to expressions-first
  * (records are length-delimited, so no relational split can find the
  * boundaries — see below). Payload bytes stay BINARY end to end;
  * nothing decodes until a consumer asks.
  *
  * Parsing is Content-Length-DRIVEN, never delimiter-split: the payload
  * of a record may itself contain `WARC/1.0\r\n` (an archived page
  * quoting a WARC, a crawler's own docs page) and a split-on-magic
  * parser silently shreds such records — WarcSpec plants exactly that
  * trap. After each payload the two CRLFs of record separation are
  * required; a malformed tail fails loudly rather than yielding a
  * half-parsed archive.
  */
object Warc {

  private val Magic = "WARC/1.0\r\n".getBytes("US-ASCII")

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = true),
    StructField("record_offset", LongType, nullable = false),
    StructField("record_length", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Parse one archive's bytes into records: (offset, type, uri, date,
    * declared length, payload bytes, total record byte span — headers
    * through the trailing separator, so offset(i+1) = offset(i) +
    * span(i)). Strict: every record must carry Content-Length; truncated
    * payloads and missing separators throw with the offending byte
    * offset. */
  def parse(bytes: Array[Byte]): Seq[(Long, String, String, String, Long, Array[Byte], Long)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Array[Byte], Long)]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      if (!startsWith(bytes, pos, Magic))
        throw new IllegalArgumentException(
          s"expected WARC/1.0 record at byte $pos")
      pos += Magic.length
      // Header block: ASCII-safe lines to the blank line. (WARC headers
      // are defined over a latin subset; URIs are percent-encoded.)
      var warcType: String = null; var uri: String = null
      var date: String = null; var len = -1L
      var headerDone = false
      while (!headerDone) {
        val eol = indexOf(bytes, pos, '\r'.toByte)
        if (eol < 0 || eol + 1 >= bytes.length || bytes(eol + 1) != '\n')
          throw new IllegalArgumentException(s"unterminated header at byte $pos")
        if (eol == pos) { headerDone = true; pos = eol + 2 }
        else {
          val line = new String(bytes, pos, eol - pos, "ISO-8859-1")
          val ci = line.indexOf(':')
          if (ci < 0) throw new IllegalArgumentException(
            s"malformed header line at byte $pos: $line")
          val (k, v) = (line.substring(0, ci).trim, line.substring(ci + 1).trim)
          k.toLowerCase match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "warc-date" => date = v
            case "content-length" => len = v.toLong
            case _ => // preserve-unknown: headers beyond the core set are legal
          }
          pos = eol + 2
        }
      }
      if (len < 0) throw new IllegalArgumentException(
        s"record at byte $start has no Content-Length")
      if (len > Int.MaxValue - 8) throw new IllegalArgumentException(
        s"record at byte $start declares a ${len}-byte payload — beyond " +
          "the single-array bound; split the archive upstream")
      if (pos + len > bytes.length) throw new IllegalArgumentException(
        s"record at byte $start declares $len payload bytes past EOF")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      // Record separator: exactly \r\n\r\n (ISO 28500 §4).
      if (!startsWith(bytes, pos, "\r\n\r\n".getBytes("US-ASCII")))
        throw new IllegalArgumentException(
          s"missing record separator after payload at byte $pos")
      pos += 4
      out += ((start.toLong, warcType, uri, date, len, payload,
        (pos - start).toLong))
    }
    out.toSeq
  }

  private def startsWith(b: Array[Byte], pos: Int, prefix: Array[Byte]): Boolean =
    pos + prefix.length <= b.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, pos, pos + prefix.length), prefix)

  private def indexOf(b: Array[Byte], from: Int, target: Byte): Int = {
    var i = from
    while (i < b.length && b(i) != target) i += 1
    if (i < b.length) i else -1
  }

  /** Records of every archive in `files` (pathCol, binary contentCol) —
    * one task per archive, [[schema]] rows. */
  def records(files: DataFrame, pathCol: String = "path",
              contentCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    val rdd = files.select(col(pathCol), col(contentCol)).rdd.flatMap { r =>
      val path = r.getString(0)
      parse(r.getAs[Array[Byte]](1)).map { case (off, t, u, d, n, p, span) =>
        Row(path, off, span, t, u, d, n, p)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** [EXT] CDX capture index (`warc_cdx` query) — the lookup sidecar
    * every WARC collection ships with (Common Crawl's cc-index, the
    * Wayback Machine's CDX servers): one row per response capture keyed
    * for prefix lookup, so "every capture under example.org" is an index
    * range scan instead of a 100 TB archive walk.
    *
    * Fields follow the CDXJ convention:
    *  - `urlkey`: SURT (Sort-friendly URI Reordering Transform) — host
    *    labels reversed and comma-joined, then `)` + lowercased path
    *    (`https://news.example.org/A/1` → `org,example,news)/a/1`), so a
    *    lexicographic sort clusters a domain's captures; host extraction
    *    is [[graft.ingest.Urls.host]] (userinfo/port stripped, one owner);
    *  - `ts14`: WARC-Date collapsed to the 14-digit timestamp;
    *  - `mime` from the HTTP Content-Type header (parameters stripped,
    *    absent → `unk`), `status` from the HTTP status line;
    *  - `digest`: md5 hex of the payload bytes — the engine's digest
    *    discipline (classic CDX uses base32 SHA-1; same role, documented
    *    divergence);
    *  - `filename`/`record_offset`/`record_length`: exactly where the
    *    record lives, byte-precise from the parser's walk (CC's length is
    *    the gzip member size; ours is the uncompressed span — the store
    *    here is uncompressed).
    *
    * Pure scan-stage projection of [[records]] output — no shuffle but
    * the final presentation sort; at scale the index is written sorted by
    * urlkey (range lookup) while the archives stay untouched. */
  def cdx(recs: DataFrame): DataFrame = {
    val s = col("payload").cast("string")
    val host = graft.ingest.Urls.host(col("target_uri"))
    val p0 = regexp_extract(trim(col("target_uri")), graft.ingest.Urls.PathRe, 1)
    val mime0 = trim(regexp_extract(s, "(?i)\r\ncontent-type: *([^;\r]+)", 1))
    recs.filter(col("warc_type") === "response")
      .select(
        concat(array_join(reverse(split(host, "\\.")), ","), lit(")"),
          lower(when(p0 === "", "/").otherwise(p0))).as("urlkey"),
        regexp_replace(col("warc_date"), "[^0-9]", "").as("ts14"),
        col("target_uri").as("original"),
        when(mime0 === "", "unk").otherwise(mime0).as("mime"),
        { // ANSI-safe: a payload with no HTTP status line yields '' —
          // null status, never a cast error (TRY_CAST in the mirror).
          val st = regexp_extract(s, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
          when(st === "", lit(null)).otherwise(st).cast("int").as("status")
        },
        md5(col("payload")).as("digest"),
        col("path").as("filename"), col("record_offset"), col("record_length"))
      .orderBy(col("urlkey"), col("ts14"), col("filename"), col("record_offset"))
  }

  /** [EXT] WET-style conversion records (`warc_wet` query) — the
    * extracted-text sibling every WARC crawl publishes (Common Crawl's
    * `*.warc.wet.gz`): per response capture, the tag-stripped,
    * whitespace-collapsed plain text plus the text digest and length —
    * what text-only pipelines consume so they never touch the raw
    * archives. Derivation is deliberately the standard WET recipe (strip
    * HTTP headers, drop markup, collapse whitespace), expressed as pure
    * scan-stage string expressions so the conversion runs where the
    * archive bytes already are; pages needing layout-aware extraction go
    * through [[graft.ingest.Boilerplate.mainContent]] instead. */
  def wetRecords(recs: DataFrame): DataFrame =
    htmlDocuments(recs)
      .withColumn("wet_text",
        trim(regexp_replace(regexp_replace(col("body"), "<[^>]*>", " "),
          "\\s+", " ")))
      .select(col("target_uri"), col("warc_date"), col("wet_text"),
        length(col("wet_text")).cast("long").as("n_chars"),
        md5(col("wet_text")).as("digest"))
      .orderBy(col("target_uri"))

  /** The HTTP-response payloads as documents: response records only,
    * HTTP headers stripped (first `\r\n\r\n`), body decoded UTF-8 —
    * (target_uri, warc_date, http_status, body), ready for the
    * [[graft.ingest.Html]] extraction cascade. */
  def htmlDocuments(recs: DataFrame): DataFrame = {
    val s = col("__s")
    val headerEnd = instr(s, "\r\n\r\n")
    recs.filter(col("warc_type") === "response")
      .withColumn("__s", col("payload").cast("string"))
      .withColumn("http_status",
        regexp_extract(s, "^HTTP/[0-9.]+ ([0-9]{3})", 1).cast("int"))
      .withColumn("body",
        when(headerEnd > 0, s.substr(headerEnd + lit(4), length(s)))
          .otherwise(lit("")))
      .select(col("target_uri"), col("warc_date"), col("http_status"),
        col("body"))
  }
}
