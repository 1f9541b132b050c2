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
  * Shape: `maxHops` equi-joins against the (src → dst) redirect map —
  * each hop advances only still-walking rows (the walked-set shrinks
  * fast in practice; the join key is the cursor URL, ids-plus-URL rows
  * only). At 100 TB the map is the crawl log's 3xx slice — hash-join
  * co-location on the URL key, no per-hop driver state. The DuckDB
  * mirror unrolls the same hops as CTEs ([[SqlMat]] materializes the
  * shared ones).
  */
object Redirects {

  /** Resolve every URL in `urls` (column `urlCol`) through the
    * (srcCol → dstCol) map in `redirects`:
    * (url, final_url, n_hops, terminated). */
  def chains(urls: DataFrame, redirects: DataFrame, maxHops: Int = 8,
             urlCol: String = "url", srcCol: String = "src_url",
             dstCol: String = "dst_url"): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val map = redirects.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var cur = urls.select(col(urlCol).as("url"))
      .withColumn("cursor", col("url"))
      .withColumn("n_hops", lit(0L))
    var k = 0
    while (k < maxHops) {
      cur = cur.join(map, cur("cursor") === map("__src"), "left")
        .select(col("url"),
          coalesce(col("__dst"), col("cursor")).as("cursor"),
          (col("n_hops") + when(col("__dst").isNotNull, 1L).otherwise(0L))
            .as("n_hops"))
      k += 1
    }
    // terminated iff the final cursor has no outgoing redirect
    cur.join(map.select(col("__src"), lit(1).as("__more")).distinct(),
        cur("cursor") === col("__src"), "left")
      .select(col("url"), col("cursor").as("final_url"), col("n_hops"),
        col("__more").isNull.as("terminated"))
      .orderBy(col("url"))
  }

  /** [[chains]] as a DuckDB CTE chain + final SELECT. `urlsRel` exposes
    * `url`; `redRel` exposes (src_url, dst_url). */
  def sqlChains(urlsRel: String, redRel: String, maxHops: Int = 8): String = {
    val hops = (1 to maxHops).map { k =>
      s"""rc_$k AS (
         |  SELECT c.url,
         |    COALESCE(m.dst_url, c.cursor) AS cursor,
         |    c.n_hops + CASE WHEN m.dst_url IS NULL THEN 0 ELSE 1 END AS n_hops
         |  FROM rc_${k - 1} c LEFT JOIN $redRel m ON c.cursor = m.src_url)""".stripMargin
    }.mkString(",\n")
    s"""rc_0 AS (
       |  SELECT url, url AS cursor, CAST(0 AS BIGINT) AS n_hops
       |  FROM $urlsRel),
       |$hops,
       |rc_src AS (SELECT DISTINCT src_url FROM $redRel)
       |SELECT c.url, c.cursor AS final_url, CAST(c.n_hops AS BIGINT) AS n_hops,
       |  s.src_url IS NULL AS terminated
       |FROM rc_$maxHops c LEFT JOIN rc_src s ON c.cursor = s.src_url
       |ORDER BY c.url""".stripMargin
  }
}
