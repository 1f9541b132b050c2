package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Redirect-chain resolution (`redirect_chains` query) — the hop
  * walk every fetcher runs before a page's identity settles: 3xx
  * responses carry a Location, chains are common (http→https, apex→www,
  * trailing-slash), and the CANONICAL fetch identity is the chain's
  * terminus. Downstream, dedup keys and the frontier want the FINAL
  * URL, not the entry point (the reference fetches single pages and
  * lets requests follow redirects silently — crawl.py's library call;
  * at corpus scale the walk is data, and the chain table is an
  * operator).
  *
  * Contract — the bounded-hop rule real fetchers ship (curl and the
  * browsers cap redirects, classically at ~10-20): follow Location up
  * to `maxHops`; a chain that hasn't terminated by then reports
  * `terminated = false` with the cursor where it stopped. Redirect
  * LOOPS are subsumed by the bound (a 2-cycle walks until the cap and
  * reports unterminated — exactly what a fetcher's "too many
  * redirects" error is); no visited-set is kept, matching fetcher
  * behavior and keeping the walk join-shaped. A URL with no redirect
  * row is its own terminus at 0 hops.
  *
  * Shape (r12 settled-row split): the redirect map first dedupes per
  * source — real 3xx crawl logs carry duplicate (src → dst) rows, and
  * conflicting duplicates would otherwise fan the walk out
  * multiplicatively up to branches^maxHops rows per URL; `min(dst)`
  * per src is the deterministic pick and the DuckDB mirror applies the
  * identical aggregate. Then `maxHops` equi-joins against the deduped
  * map, and after each hop the rows the map did NOT advance are SPLIT
  * OUT as settled (a cursor with no outgoing redirect is terminated by
  * definition — it can never advance again), so hop k's join input is
  * exactly the still-walking rows (per-hop frames pinned — the
  * iterative-loop discipline of the rank cores; the walked set shrinks
  * fast in practice). Only the post-cap survivors need the final
  * has-outgoing check. At 100 TB the map is the crawl log's 3xx slice —
  * hash-join co-location on the URL key, no per-hop driver state. The
  * DuckDB mirror unrolls the same split walk as CTEs ([[SqlMat]]
  * materializes the shared ones).
  */
object Redirects {

  /** Resolve every URL in `urls` (column `urlCol`) through the
    * (srcCol → dstCol) map in `redirects`:
    * (url, final_url, n_hops, terminated).
    *
    * `hopTrace`, when non-null, receives hop k's JOIN-INPUT row count
    * (the still-walking set) per hop — the spec's observability hook;
    * production callers leave it null (no extra actions beyond the
    * per-hop pins). */
  def chains(urls: DataFrame, redirects: DataFrame, maxHops: Int = 8,
             urlCol: String = "url", srcCol: String = "src_url",
             dstCol: String = "dst_url",
             hopTrace: scala.collection.mutable.Buffer[Long] = null): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    import graft.Mat.Pinnable
    val map = redirects.groupBy(col(srcCol).as("__src"))
      .agg(min(col(dstCol)).as("__dst"))
      .pinned
    var walking = urls.select(col(urlCol).as("url"))
      .withColumn("cursor", col("url"))
      .withColumn("n_hops", lit(0L))
    var settled: DataFrame = null
    var k = 0
    while (k < maxHops) {
      if (hopTrace != null) hopTrace += walking.count()
      val stepped = walking
        .join(map, walking("cursor") === map("__src"), "left")
        .select(col("url"), col("cursor"), col("__dst"), col("n_hops"))
        .pinned
      // no outgoing redirect at the cursor → terminated, by definition
      val done = stepped.filter(col("__dst").isNull)
        .select(col("url"), col("cursor").as("final_url"), col("n_hops"),
          lit(true).as("terminated"))
      settled = if (settled == null) done else settled.unionByName(done)
      walking = stepped.filter(col("__dst").isNotNull)
        .select(col("url"), col("__dst").as("cursor"),
          (col("n_hops") + 1L).as("n_hops"))
      k += 1
    }
    // post-cap survivors: terminated iff the final cursor has no outgoing
    val capped = walking
      .join(map.select(col("__src"), lit(1).as("__more")),
        walking("cursor") === col("__src"), "left")
      .select(col("url"), col("cursor").as("final_url"), col("n_hops"),
        col("__more").isNull.as("terminated"))
    settled.unionByName(capped).orderBy(col("url"))
  }

  /** [[chains]] as a DuckDB CTE chain + final SELECT. `urlsRel` exposes
    * `url`; `redRel` exposes (src_url, dst_url) — deduped per src with
    * the engine's identical `min(dst_url)` aggregate before the walk. */
  def sqlChains(urlsRel: String, redRel: String, maxHops: Int = 8): String = {
    val hops = (1 to maxHops).map { k =>
      s"""rc_s$k AS (
         |  SELECT c.url, c.cursor, m.dst_url, c.n_hops
         |  FROM rc_w${k - 1} c LEFT JOIN rc_map m ON c.cursor = m.src_url),
         |rc_d$k AS (
         |  SELECT url, cursor AS final_url, n_hops, TRUE AS terminated
         |  FROM rc_s$k WHERE dst_url IS NULL),
         |rc_w$k AS (
         |  SELECT url, dst_url AS cursor, n_hops + 1 AS n_hops
         |  FROM rc_s$k WHERE dst_url IS NOT NULL)""".stripMargin
    }.mkString(",\n")
    s"""rc_map AS (
       |  SELECT src_url, MIN(dst_url) AS dst_url FROM $redRel GROUP BY src_url),
       |rc_w0 AS (
       |  SELECT url, url AS cursor, CAST(0 AS BIGINT) AS n_hops
       |  FROM $urlsRel),
       |$hops
       |SELECT url, final_url, CAST(n_hops AS BIGINT) AS n_hops, terminated
       |FROM (
       |  ${(1 to maxHops).map(k => s"SELECT * FROM rc_d$k").mkString("", "\n  UNION ALL ", "")}
       |  UNION ALL
       |  SELECT c.url, c.cursor AS final_url, c.n_hops,
       |    m.src_url IS NULL AS terminated
       |  FROM rc_w$maxHops c LEFT JOIN rc_map m ON c.cursor = m.src_url)
       |ORDER BY url""".stripMargin
  }
}
