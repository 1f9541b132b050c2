package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S2/S3 fetch slot (`/root/reference/crawl.py:32-36` listing GET,
  * `crawl.py:77-79` per-article GET — UA header, 10 s timeout).
  *
  * The engine's batch pipeline treats fetched pages as input TABLES
  * (sound for a zero-egress build); this trait is the seam a deployment
  * plugs a real HTTP client into without restructuring [[Ingest.run]].
  *
  * Contract: `fetch` is invoked ONCE PER PARTITION with that partition's
  * full URL iterator — the implementation opens one pooled client, streams
  * (url, html) responses lazily, and releases the client when the iterator
  * is exhausted. Failures must yield (url, null), never throw: the
  * reference skips bad pages per record (ST4), it never fails a run.
  * Implementations must be Serializable (the object ships to executors);
  * any non-serializable client state belongs inside `fetch`, created per
  * partition.
  */
trait Fetcher extends Serializable {
  def fetch(urls: Iterator[String]): Iterator[(String, String)]
}

object Fetcher {

  /** Offline default: answer from an in-memory page map (the pages-table
    * contract, reference fixtures, tests). For corpus-scale pre-fetched
    * pages use the table JOIN path ([[Ingest.run]]) instead — this exists
    * so the mapPartitions plumbing is exercised end-to-end without
    * egress. */
  def fromMap(pages: Map[String, String]): Fetcher = new Fetcher {
    override def fetch(urls: Iterator[String]): Iterator[(String, String)] =
      urls.map(u => (u, pages.getOrElse(u, null)))
  }

  /** urls(col) → pages(sources, html) via the per-partition fetcher. */
  private[ingest] def pagesFor(urls: DataFrame, urlCol: String, f: Fetcher): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(col(urlCol)).as[String]
      .mapPartitions(it => f.fetch(it))
      .toDF("sources", "html")
  }
}
