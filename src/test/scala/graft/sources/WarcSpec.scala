package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the WARC parser's length-driven discipline: payloads containing
  * the record magic survive intact, malformed archives fail loudly with
  * offsets, and the HTTP-document projection strips headers exactly. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(typ: String, uri: String, payload: String): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"

  test("parse walks by Content-Length: a payload quoting WARC/1.0 survives") {
    // The trap: record 1's payload CONTAINS the record magic — a
    // split-on-magic parser shreds it into two garbage records.
    val quoted = "a page about archives: WARC/1.0\r\nWARC-Type: fake\r\n end"
    val blob = rec("response", "https://a/1", quoted) +
      rec("response", "https://a/2", "plain")
    val out = Warc.parse(blob.getBytes("UTF-8"))
    assert(out.size == 2)
    assert(new String(out.head._6, "UTF-8") == quoted)
    assert(out(1)._3 == "https://a/2")
    // offsets: second record starts exactly after the first's bytes
    assert(out(1)._1 == rec("response", "https://a/1", quoted)
      .getBytes("UTF-8").length.toLong)
  }

  test("unknown headers are tolerated; UTF-8 payload lengths are bytes") {
    val payload = "héllo wörld" // multi-byte
    val r = s"WARC/1.0\r\nWARC-Type: resource\r\nX-Custom: zzz\r\n" +
      s"WARC-Target-URI: u\r\nContent-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"
    val out = Warc.parse(r.getBytes("UTF-8"))
    assert(out.size == 1 && new String(out.head._6, "UTF-8") == payload)
  }

  test("malformed archives fail loudly with byte offsets") {
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    val e1 = intercept[IllegalArgumentException](Warc.parse(noLen.getBytes("UTF-8")))
    assert(e1.getMessage.contains("no Content-Length"))
    val truncated = "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    val e2 = intercept[IllegalArgumentException](Warc.parse(truncated.getBytes("UTF-8")))
    assert(e2.getMessage.contains("past EOF"))
    val noSep = "WARC/1.0\r\nContent-Length: 4\r\n\r\nbodyXX"
    val e3 = intercept[IllegalArgumentException](Warc.parse(noSep.getBytes("UTF-8")))
    assert(e3.getMessage.contains("separator"))
    val garbage = "HTTP/1.1 200 OK\r\n"
    val e4 = intercept[IllegalArgumentException](Warc.parse(garbage.getBytes("UTF-8")))
    assert(e4.getMessage.contains("expected WARC/1.0"))
  }

  test("records over a DataFrame; htmlDocuments strips HTTP headers, non-responses drop") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    val blob = rec("response", "https://a/1", http) +
      rec("request", "https://a/1", "GET / HTTP/1.1\r\n") // filtered
    val files = Seq(("f1.warc", blob.getBytes("UTF-8"))).toDF("path", "content")
    val recs = Warc.records(files)
    assert(recs.count() == 2)
    val docs = Warc.htmlDocuments(recs).collect()
    assert(docs.length == 1)
    val r = docs.head
    assert(r.getAs[String]("target_uri") == "https://a/1")
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("body") == "<html>hi</html>")
  }

  test("empty archive parses to zero records") {
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
  }

  test("record_length spans headers through separator: offsets chain exactly (r10)") {
    val blob = rec("response", "https://a/1", "first body") +
      rec("response", "https://a/2", "second") +
      rec("response", "https://a/3", "third and last")
    val out = Warc.parse(blob.getBytes("UTF-8"))
    assert(out.size == 3)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 + a._7 == b._1, s"offset ${a._1} + span ${a._7} != ${b._1}")
    }
    assert(out.last._1 + out.last._7 == blob.getBytes("UTF-8").length.toLong)
  }

  test("wetRecords: tag strip, whitespace collapse, digest; requests drop (r10)") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>\n  <body><p>hello   brave</p>\n<div>new\tworld</div></body></html>"
    val blob = rec("response", "https://a/1", http) +
      rec("request", "https://a/1", "GET / HTTP/1.1\r\n")
    val files = Seq(("f.warc", blob.getBytes("UTF-8"))).toDF("path", "content")
    val out = Warc.wetRecords(Warc.records(files)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("wet_text") == "hello brave new world")
    assert(r.getAs[Long]("n_chars") == 21L)
    assert(r.getAs[String]("digest") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        "hello brave new world".getBytes("UTF-8")))
  }

  test("cdx: SURT urlkey, mime/status extraction, digest, byte-precise pointers (r10)") {
    // Userinfo, port, and mixed-case host/path all canonicalize away in
    // the SURT key; the Content-Type parameter list is stripped; a
    // header-less payload reads mime 'unk'; requests never index.
    val http1 = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html>x</html>"
    val blob = rec("response", "https://user@news.Example.org:8080/Path/One", http1) +
      rec("response", "https://example.org/two", "no http header here") +
      rec("request", "https://example.org/two", "GET /two HTTP/1.1\r\n")
    val files = Seq(("arc-0.warc", blob.getBytes("UTF-8"))).toDF("path", "content")
    val rows = Warc.cdx(Warc.records(files)).collect()
    assert(rows.length == 2) // the request record is not a capture
    val r1 = rows.find(_.getAs[String]("original").contains("news")).get
    assert(r1.getAs[String]("urlkey") == "org,example,news)/path/one")
    assert(r1.getAs[String]("ts14") == "20260101000000")
    assert(r1.getAs[String]("mime") == "text/html")
    assert(r1.getAs[Int]("status") == 200)
    assert(r1.getAs[String]("digest") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(http1.getBytes("UTF-8")))
    assert(r1.getAs[String]("filename") == "arc-0.warc")
    val r2 = rows.find(_.getAs[String]("original").endsWith("/two")).get
    assert(r2.getAs[String]("urlkey") == "org,example)/two")
    assert(r2.getAs[String]("mime") == "unk")
    assert(r2.isNullAt(r2.fieldIndex("status")))
    // the (offset, length) pointer dereferences to the exact record bytes
    val all = blob.getBytes("UTF-8")
    val off = r2.getAs[Long]("record_offset").toInt
    val len = r2.getAs[Long]("record_length").toInt
    val sliced = new String(java.util.Arrays.copyOfRange(all, off, off + len), "UTF-8")
    assert(sliced == rec("response", "https://example.org/two", "no http header here"))
  }
}
