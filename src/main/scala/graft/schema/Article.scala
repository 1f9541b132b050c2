package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset}

/** §1.2: the writer-shaped record (`/root/reference/crawl.py:104-111`).
  * The engine is DataFrame-first (the reference is dynamically typed
  * throughout — SURVEY §1.4), but the ingest path has a fixed writer
  * shape, so it gets the one typed view: compile-time field checking for
  * pipeline code that consumes ingest output.
  *
  * `published_at` is the RAW extracted string (nullable — parse lazily
  * with [[graft.ingest.Dates.parsePublished]], exactly like the reference
  * parses at read time, `app.py:88-92`). `crawled_at` is epoch SECONDS as
  * double, the writer's `time.time()` shape.
  */
case class Article(
    title: String,
    sources: String,
    content: String,
    source: String,
    published_at: Option[String],
    crawled_at: Double)

object Article {
  /** Typed view over [[graft.ingest.Ingest.records]]-shaped output. */
  def ds(df: DataFrame): Dataset[Article] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Article]
  }
}
