package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E1 pipeline semantics over inline page tables: candidate explode,
  * anti-join dedup (incl. idempotent re-ingest — `crawl.py:73-75`), and
  * record shape. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val listingHtml =
    """<article><a href="/a/1">one</a></article>
      |<article><a href="/a/2">two</a></article>
      |<article><p>no link, skipped</p></article>""".stripMargin

  private def listings = Seq(("https://ex.com/list", listingHtml)).toDF("source", "html")

  private def pages = Seq(
    ("https://ex.com/a/1",
      "<h1>Title One</h1><p>Body 1.</p><time datetime=\"2024-01-01\">x</time>"),
    ("https://ex.com/a/2",
      "<title>Title Two</title><p>Body 2a.</p><p>Body 2b.</p>")
  ).toDF("sources", "html")

  private def empty = Seq.empty[String].toDF("sources")

  test("candidates: one row per linked block, absolute urls") {
    val c = Ingest.candidates(listings).collect()
    assert(c.map(_.getString(1)).toSeq ==
      Seq("https://ex.com/a/1", "https://ex.com/a/2"))
  }

  test("anti-join dedup: re-ingest of the same batch inserts nothing") {
    val first = Ingest.run(listings, pages, empty)
    assert(first.count() == 2)
    val existingAfter = first.select("sources")
    val second = Ingest.run(listings, pages, existingAfter)
    assert(second.count() == 0)
  }

  test("records carry the writer shape with extraction fallbacks") {
    val recs = Ingest.run(listings, pages, empty)
      .orderBy("sources").collect()
    val r1 = recs(0)
    assert(r1.getAs[String]("title") == "Title One")
    assert(r1.getAs[String]("content") == "Body 1.")
    assert(r1.getAs[String]("published_at") == "2024-01-01")
    val r2 = recs(1)
    assert(r2.getAs[String]("title") == "Title Two")
    assert(r2.getAs[String]("content") == "Body 2a.\nBody 2b.")
    assert(r2.getAs[String]("published_at") == null)
    assert(recs.forall(_.getAs[String]("source") == "https://ex.com/list"))
  }

  test("newCounts groups inserted rows per seed source") {
    val out = Ingest.newCounts(Ingest.run(listings, pages, empty)).collect()
    assert(out.length == 1 && out(0).getLong(1) == 2)
  }

  test("ST4 fault isolation: malformed pages degrade per-record, never fail the batch") {
    val badPages = Seq(
      ("https://ex.com/a/1", "<h1>Unclosed <p>oops"),          // broken markup
      ("https://ex.com/a/2", ""),                              // empty page
      ("https://ex.com/a/3", null.asInstanceOf[String]))       // null html
      .toDF("sources", "html")
    val listings3 = Seq(("https://ex.com/list",
      """<article><a href="/a/1">1</a></article>
        |<article><a href="/a/2">2</a></article>
        |<article><a href="/a/3">3</a></article>""".stripMargin)).toDF("source", "html")
    val recs = Ingest.run(listings3, badPages, empty).orderBy("sources").collect()
    assert(recs.length == 3) // every record survives with fallbacks
    assert(recs.forall(_.getAs[String]("title") == "No Title Found"))
    assert(recs.forall(r => r.getAs[String]("content") == "" || r.getAs[String]("content") == null))
    assert(recs.forall(_.getAs[String]("published_at") == null))
  }

  test("lenient date parse: cascade formats, null on garbage") {
    val df = Seq("2024-03-01T10:15:30+00:00", "2024-03-01T10:15:30",
      "2024-03-01 10:15:30", "2024-03-01", "March 1, 2024", "Mar 1, 2024",
      "01/03/2024", "not a date", " 2024-03-01 ").toDF("raw")
    val parsed = df.select(Dates.parsePublished($"raw").as("ts")).collect()
    assert(parsed.count(_.isNullAt(0)) == 1)
    assert(parsed(3).getTimestamp(0).toString.startsWith("2024-03-01"))
    assert(parsed(8).getTimestamp(0).toString.startsWith("2024-03-01")) // trimmed
  }

  test("free-text tail: ordinals, dotted/Sept months, comma-less forms (F127)") {
    // dateutil's tokenizer strips ordinal suffixes (grammatical or not)
    // and the trailing dot of a month token; 'Sept' aliases September.
    val ok = Seq(
      "March 3rd, 2024" -> "2024-03-03",
      "August 21st, 2024 3:05 PM" -> "2024-08-21",
      "22nd February 2024" -> "2024-02-22",
      "3th March 2024" -> "2024-03-03", // any digit+suffix strips
      "Sept. 5, 2024" -> "2024-09-05",
      "Sept 5, 2024" -> "2024-09-05",
      "Mar. 3 2024" -> "2024-03-03",
      "3 Mar 2024" -> "2024-03-03", // single-digit day, 'd' pattern
      "March 3 2024 10:30 AM" -> "2024-03-03",
      "Mar 3 2024" -> "2024-03-03")
    val parsed = ok.map(_._1).toDF("raw")
      .select(Dates.parsePublished($"raw").as("ts")).collect()
      .map(_.getTimestamp(0).toString.take(10))
    ok.map(_._2).zip(parsed).foreach { case (want, got) =>
      assert(want == got, s"expected $want got $got")
    }
    // time-of-day survives the ordinal strip
    val withTime = Seq("August 21st, 2024 3:05 PM").toDF("raw")
      .select(Dates.parsePublished($"raw").as("ts")).head.getTimestamp(0)
    assert(withTime.toString.startsWith("2024-08-21 15:05"))
    // out-of-contract negatives stay null: impossible day, 'of'-phrase
    // (dateutil fuzzy mode), defaulted-day month-year, non-dates
    val nulls = Seq("Feb 31st, 2024", "3rd of March 2024", "March 2024",
      "the 3rd quarter").toDF("raw")
      .select(Dates.parsePublished($"raw").as("ts")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("ambiguous slash dates follow dateutil's default month-first rule") {
    // The reference runs dateutil.parser.parse with dayfirst=False:
    // '01/03/2024' is JANUARY 3; a month slot > 12 falls through to the
    // day-first form, so '13/03/2024' is March 13 — the cascade must not
    // roll month 13 over.
    val df = Seq("01/03/2024", "13/03/2024", "15 March 2024", "2024.03.01")
      .toDF("raw")
    val parsed = df.select(Dates.parsePublished($"raw").as("ts"))
      .collect().map(_.getTimestamp(0).toString.take(10))
    assert(parsed(0) == "2024-01-03", s"month-first expected: ${parsed(0)}")
    assert(parsed(1) == "2024-03-13", s"day-first fallback expected: ${parsed(1)}")
    assert(parsed(2) == "2024-03-15") // full month name
    assert(parsed(3) == "2024-03-01") // dotted ISO
  }

  test("runFetched through the Fetcher seam matches the table-join path") {
    FetcherProbe.opens.set(0)
    val pageMap = Map(
      "https://ex.com/a/1" ->
        "<h1>Title One</h1><p>Body 1.</p><time datetime=\"2024-01-01\">x</time>",
      "https://ex.com/a/2" ->
        "<title>Title Two</title><p>Body 2a.</p><p>Body 2b.</p>")
    val fetched = Ingest.runFetched(listings, empty, new FetcherProbe(pageMap))
      .select("title", "sources", "content", "source", "published_at")
      .orderBy("sources").collect().toSeq
    val joined = Ingest.run(listings, pages, empty)
      .select("title", "sources", "content", "source", "published_at")
      .orderBy("sources").collect().toSeq
    assert(fetched == joined)
    // one client open per non-empty partition, not per URL
    val parts = FetcherProbe.opens.get()
    assert(parts >= 1 && parts <= 2, s"expected one open per partition, got $parts for 2 urls")
  }

  test("fetcher failures isolate per record (failed url skipped, no throw)") {
    val f = Fetcher.fromMap(Map("https://ex.com/a/1" -> "<h1>T</h1><p>B</p>"))
    val out = Ingest.runFetched(listings, empty, f)
      .select("sources", "title").orderBy("sources").collect()
    assert(out.length == 1) // failed fetch skipped, like reference continue
    assert(out(0).getString(1) == "T")
  }

  test("fetchListings feeds the same pipeline (S2 seam)") {
    val seeds = Seq("https://ex.com/list").toDF("url")
    val l = Ingest.fetchListings(seeds, "url", Fetcher.fromMap(Map(
      "https://ex.com/list" -> listingHtml)))
    val c = Ingest.candidates(l).collect()
    assert(c.map(_.getString(1)).toSeq ==
      Seq("https://ex.com/a/1", "https://ex.com/a/2"))
  }
}

/** Counts client opens — `fetch` runs once per partition, so the counter
  * equals the number of (non-empty) partitions the URLs arrived in. */
class FetcherProbe(pages: Map[String, String]) extends Fetcher {
  override def fetch(urls: Iterator[String]): Iterator[(String, String)] = {
    FetcherProbe.opens.incrementAndGet() // "open one client"
    urls.map(u => (u, pages.getOrElse(u, null)))
  }
}

object FetcherProbe {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}
