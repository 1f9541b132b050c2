package graft.ingest

import graft.SparkSpec

/** Pins the bounded-hop redirect walk: plain chains, the no-redirect
  * identity, cycle behavior at the cap, convergence inside the cap,
  * and the terminated flag's exact meaning (no outgoing Location at
  * the cursor). */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  test("chains: hops, identity, cycle at cap, mid-chain entry") {
    val urls = Seq("a", "b", "c", "d", "x", "y", "solo")
      .toDF("url")
    val red = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // 3-chain to terminal d
      ("x", "y"), ("y", "x")              // 2-cycle
    ).toDF("src_url", "dst_url")
    val out = Redirects.chains(urls, red, maxHops = 8)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out("a") == (("d", 3L, true)))
    assert(out("b") == (("d", 2L, true)), "mid-chain entry walks the suffix")
    assert(out("d") == (("d", 0L, true)), "a terminal is its own terminus")
    assert(out("solo") == (("solo", 0L, true)), "no redirect row = identity")
    // the 2-cycle burns all 8 hops and reports unterminated; with an
    // even cap the cursor lands back where it started
    assert(out("x") == (("x", 8L, false)))
    assert(out("y") == (("y", 8L, false)))
  }

  test("chains: exactly-at-cap terminates, one-past-cap does not") {
    val urls = Seq("h0").toDF("url")
    val red = (0 until 9).map(i => (s"h$i", s"h${i + 1}"))
      .toDF("src_url", "dst_url")
    // 9-hop chain against an 8-hop cap: unterminated at h8
    val capped = Redirects.chains(urls, red, maxHops = 8).collect().head
    assert(capped.getString(1) == "h8" && capped.getLong(2) == 8L &&
      !capped.getBoolean(3))
    // raise the cap to 9: terminates at h9
    val full = Redirects.chains(urls, red, maxHops = 9).collect().head
    assert(full.getString(1) == "h9" && full.getLong(2) == 9L &&
      full.getBoolean(3))
  }

  test("duplicate (src -> dst) map rows dedupe to min(dst) — no fan-out") {
    val urls = Seq("a").toDF("url")
    // conflicting duplicates at both hops: without the per-src dedup the
    // walk would emit up to 2^2 rows for one URL
    val red = Seq(
      ("a", "b"), ("a", "c"), ("a", "b"),
      ("b", "t1"), ("b", "t2")
    ).toDF("src_url", "dst_url")
    val rows = Redirects.chains(urls, red, maxHops = 8).collect()
    assert(rows.length == 1, s"one input URL must yield one chain row: ${rows.toSeq}")
    val r = rows.head
    assert(r.getString(0) == "a" && r.getString(1) == "t1" &&
      r.getLong(2) == 2L && r.getBoolean(3),
      "deterministic pick = min(dst) at every hop")
  }

  test("settled rows leave the walk: hop-k join input = still-walking rows only") {
    val urls = Seq("a", "b", "c", "d", "solo").toDF("url")
    val red = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src_url", "dst_url")
    val trace = scala.collection.mutable.ArrayBuffer.empty[Long]
    Redirects.chains(urls, red, maxHops = 4, hopTrace = trace).collect()
    // hop 1 sees all 5; d and solo settle there; then the chain suffixes
    // drain one per hop (a->b->c->d is the longest walker)
    assert(trace.toSeq == Seq(5L, 3L, 2L, 1L),
      s"join input must shrink with the walked set, got $trace")
  }
}
