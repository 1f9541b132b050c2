package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crawl-frontier planning: politeness slots/worker pinning and the
  * recrawl-priority arithmetic. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("schedule: per-host FIFO slots, politeness spacing, host-stable workers") {
    val docs = Seq(
      (1L, "https://a.example.com/x"),
      (2L, "https://b.example.com/y"),
      (3L, "https://a.example.com/z"),
      (4L, "https://c.example.com/w"),
      (5L, "https://a.example.com/v")).toDF("doc_id", "url")
    val out = Frontier.schedule(docs, "url", "doc_id", delayMs = 500L, nWorkers = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // per-host FIFO by doc id: a gets slots 0,1,2 for docs 1,3,5
    assert(out(1L) == (("a.example.com", 0L, 0L, 0L)))
    assert(out(3L) == (("a.example.com", 0L, 1L, 500L)))
    assert(out(5L) == (("a.example.com", 0L, 2L, 1000L)))
    // worker = sorted-host rank mod nWorkers: a->0, b->1, c->0
    assert(out(2L) == (("b.example.com", 1L, 0L, 0L)))
    assert(out(4L) == (("c.example.com", 0L, 0L, 0L)))
    // drain order: scheduled time first
    val order = Frontier.schedule(docs, "url", "doc_id", 500L, 2)
      .select("scheduled_ms").as[Long].collect().toSeq
    assert(order == order.sorted)
  }

  test("schedule: null/unparseable URLs keep their rows in the '' host group") {
    val docs = Seq(
      (1L, "https://a.example.com/x"),
      (2L, null.asInstanceOf[String]),
      (3L, "no-scheme-here")).toDF("doc_id", "url")
    val out = Frontier.schedule(docs, "url", "doc_id", 1000L, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // nothing vanishes at the worker join; both bad rows share one group
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == "" && out(3L) == "")
  }

  test("recrawl: interval arithmetic, tier cuts, single-observation page") {
    val obs = Seq(
      ("a", "2024-01-01 00:00:00"), // a: 3 obs, 60 s apart -> interval 60000
      ("a", "2024-01-01 00:01:00"),
      ("a", "2024-01-01 00:02:00"),
      ("b", "2024-01-01 00:00:00"), // b: span 2 h over 2 obs -> 7.2e6 ms
      ("b", "2024-01-01 02:00:00"),
      ("c", "2024-01-01 05:00:00")) // c: one observation -> unknown
      .toDF("page", "ts0")
      .withColumn("ts", to_timestamp(col("ts0")))
    val out = Frontier.recrawl(obs, "page", "ts",
        hotMs = 3600000L, warmMs = 10000000L)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3L)
    assert(a.getLong(4) == 60000L)                  // interval
    assert(a.getLong(5) == a.getLong(3) + 60000L)   // next due = last + mean
    assert(a.getString(6) == "hot")
    val b = out("b")
    assert(b.getLong(4) == 7200000L && b.getString(6) == "warm")
    val c = out("c")
    assert(c.getLong(1) == 1L && c.isNullAt(4) && c.isNullAt(5))
    assert(c.getString(6) == "unknown")
  }

  test("recrawl: cold tier and the exact threshold boundary") {
    val obs = Seq(
      ("d", "2024-01-01 00:00:00"),
      ("d", "2024-01-02 00:00:00")) // 86_400_000 ms
      .toDF("page", "ts0").withColumn("ts", to_timestamp(col("ts0")))
    // interval == warm threshold -> NOT warm (strict <): cold
    val eq = Frontier.recrawl(obs, "page", "ts", 1000L, 86400000L)
      .head().getString(6)
    assert(eq == "cold")
  }

  test("scheduleWithDelays: per-host intervals, default where undeclared (r11)") {
    val docs = Seq(
      (1L, "https://slow.example/a"), (2L, "https://slow.example/b"),
      (3L, "https://slow.example/c"),
      (4L, "https://fast.example/x"), (5L, "https://fast.example/y"),
      (6L, "https://plain.example/p"), (7L, "https://plain.example/q"))
      .toDF("doc_id", "url")
    val delays = Seq(("slow.example", 5000L), ("fast.example", 200L))
      .toDF("host", "crawl_delay_ms")
    val out = Frontier.scheduleWithDelays(docs, "url", "doc_id", delays,
        defaultMs = 1000L)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // slot * host delay; undeclared host gets the default
    assert(out(1L) == (("slow.example", 0L, 5000L, 0L)))
    assert(out(2L) == (("slow.example", 1L, 5000L, 5000L)))
    assert(out(3L) == (("slow.example", 2L, 5000L, 10000L)))
    assert(out(5L) == (("fast.example", 1L, 200L, 200L)))
    assert(out(7L) == (("plain.example", 1L, 1000L, 1000L)))
  }
}
