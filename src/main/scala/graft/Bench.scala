package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: one JSON line with per-query seconds.
  *
  * Hygiene (round-1 verdict): a sacrificial warmup action runs BEFORE any
  * timing so JVM/codegen startup (~5 s) isn't charged to whichever query
  * iterates first, and per-query failures print to stderr with a negative
  * sentinel in the JSON instead of being silently swallowed into a
  * plausible-looking time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle files + spilled blocks on tmpfs when available: the bench
    // box's virtio disk has bursty latency (measured 2x run-to-run fsync
    // throughput swings) that lands on whichever query is mid-shuffle.
    // Harness-level setting only — on a real cluster local dirs come from
    // the cluster manager (and shuffle data wouldn't fit in RAM anyway).
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-bench" else null
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = (if (localDir != null) b.config("spark.local.dir", localDir) else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: exercise the scan, the dedup/minhash codegen paths, and the
    // vector arithmetic on tiny slices so first-query timings measure the
    // query, not JVM/codegen startup (whichever query runs first otherwise
    // absorbs several seconds of compilation).
    try {
      Tables.documents(spark, sfDir).count()
      graft.dedup.Dedup.nearDupMinHash(
        Tables.documents(spark, sfDir).limit(200), "doc_id", "text", 0.9).count()
      graft.similarity.Similarity.cosinePairs(
        Tables.embeddings(spark, sfDir).limit(100), 0.4).count()
      // window/regexp/explode families (asof sweep, curation, shingles)
      graft.pipeline.Curation.repetitionStats(
        Tables.documents(spark, sfDir).limit(100)).count()
      graft.relational.AsOf.asofJoin(
        Tables.events(spark, sfDir).limit(500),
        Tables.events(spark, sfDir).limit(500),
        "user_id", "ts", "ts", Seq("event_id" -> "prior_id"),
        tieBreak = Some("event_id")).count()
    }
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    var failures = 0
    // Sorted order: deterministic run-to-run, independent of Map hashing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            failures += 1
            System.err.println(s"[bench] $name FAILED: $e")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // Reclaim the query's localCheckpoint / persisted blocks
      // DETERMINISTICALLY: the previous System.gc() nudge relied on the
      // ContextCleaner's weak-ref queue racing the next query — under
      // unlucky timing stale blocks piled up in storage memory and pushed
      // the heavy dedup queries into eviction thrash (observed 3-28×
      // slowdowns on otherwise identical runs). Queries are self-contained
      // plans rebuilt from parquet each iteration, so dropping every
      // persistent RDD between them is always safe.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failures":$failures}""")
    // Compact FINAL line (round-4 verdict): the driver's tail capture once
    // truncated the head of the (long) per-query line above, losing the
    // first ~15 entries. This short trailer is always intact and carries
    // the headline numbers: total over ALL queries, failure count, query
    // count, and the top-10 slowest (the ones worth reading first).
    val slowest = results.filter(_._2 > 0).sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${results.size},"failures":$failures,"slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
