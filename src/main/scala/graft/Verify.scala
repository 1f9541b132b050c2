package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-11 hardening (the r10 driver artifact came back `{}` with no way
  * to tell a timeout from a crash from an empty gate):
  *   - `verify_timing.jsonl` gets one line APPENDED per query as it lands,
  *     so a truncated run leaves a partial record naming exactly where the
  *     clock ran out;
  *   - `verify_manifest.json` is written ONCE at the very end with the
  *     totals — its absence marks a run that never finished;
  *   - the default worker count scales with the box (capped at 16) instead
  *     of the old hard-coded 4, which priced the 219-query dump at roughly
  *     4× what the hardware had to charge.
  */
object Verify {
  /** Ordered single-file parquet dump, picking its execution shape by
    * ESTIMATED result size (r16, the r15 verdict's #5):
    *
    *  - small (the overwhelmingly common case): `localCheckpoint` executes
    *    the plan at full parallelism and pins the ordered partitions, the
    *    `coalesce(1)` then just concatenates cached blocks in partition
    *    order (narrow, order-preserving) inside the writer task — a bare
    *    coalesce(1) would collapse the WHOLE plan (sort, joins, regex)
    *    into one task (measured: 30 s for a plan that runs 1.3 s wide);
    *  - large by Catalyst's estimate (`optimizedPlan.stats.sizeInBytes >
    *    maxCheckpointBytes`): take the streaming single-task write FIRST.
    *    The checkpoint arm materializes a full block copy of the result,
    *    and the old OOM-catch fallback only ran AFTER a first attempt
    *    that could destabilize the JVM (r15 ADVICE #4) — a heap-breaking
    *    result must never reach the checkpoint attempt at all. Catalyst
    *    over-estimates freely (join products, unfiltered scans); an
    *    over-estimate merely buys the slow-but-correct shape.
    *
    * The try/catch fallback stays as a backstop for UNDER-estimates.
    * Returns the arm used, for the log line and the spec. */
  private[graft] def dumpOrdered(df: org.apache.spark.sql.DataFrame,
                                 path: String,
                                 maxCheckpointBytes: BigInt): String = {
    val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Leaves Catalyst can't size (RDD-backed frames: localCheckpoint
    // pins, createDataFrame outputs — the iterative operators' shape)
    // report spark.sql.defaultSizeInBytes = Long.MaxValue, and any plan
    // containing one estimates >= that sentinel. "Unknown" must mean
    // the ESTABLISHED checkpoint arm (those results are small in
    // practice and the catch-fallback still backstops), not the
    // single-task slow shape for a third of the gate.
    val unknown = estimate >= BigInt(Long.MaxValue)
    if (!unknown && estimate > maxCheckpointBytes) {
      df.coalesce(1).write.mode("overwrite").parquet(path)
      "stream-estimated"
    } else {
      try {
        val mat = df.localCheckpoint()
        try { mat.coalesce(1).write.mode("overwrite").parquet(path); "checkpoint" }
        finally mat.unpersist(false)
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] checkpointed dump failed (${e.getMessage}); " +
            "retrying with the streaming single-task write")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        "stream-fallback"
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    val cores = Runtime.getRuntime.availableProcessors
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", math.min(16, cores).toString)
    // Same tmpfs shuffle-dir hardening as Bench: the box's virtio disk
    // has bursty latency; correctness runs shouldn't stall on it either.
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-verify" else null
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (localDir != null) b.config("spark.local.dir", localDir) else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev convenience: extra args past (sfDir, outDir) restrict the dump
    // to the named queries — the driver always passes exactly two.
    // Unknown names fail fast: a typo'd filter would otherwise dump a
    // partial (or empty) tree with exit 0 and read as a clean run.
    val unknown = only.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[verify] unknown query name(s): ${unknown.mkString(", ")}")
      spark.stop(); sys.exit(2)
    }
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    val timingPath = Paths.get(s"$outDir/verify_timing.jsonl")
    Files.deleteIfExists(timingPath)
    // Discarded JIT/codegen warmup (r13 verdict #5): without it the
    // alphabetically-first heavy query absorbs ~25 s of one-time class
    // loading, codegen, and parquet-writer setup, so the gate's timing
    // table charged `adaptive_length_gate` / `canonical_link_dedup_*`
    // 4-13× their warm cost every round. One untimed pass of a cheap
    // registered query through the SAME write path (DataFrame exec +
    // parquet commit) pays that once, outside the table; the scratch
    // tree lives under tmpdir, never in outDir (the driver globs it).
    locally {
      val warm = SparkEntry.queries.get("totals")
        .orElse(selected.headOption.map(_._2))
      warm.foreach { fn =>
        val w0 = System.nanoTime()
        val scratch = Files.createTempDirectory("graft-verify-warmup")
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(scratch.resolve("warmup").toString)
        } catch { case e: Throwable =>
          System.err.println(s"[verify] warmup failed (ignored): ${e.getMessage}")
        } finally {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(scratch.toFile)
        }
        System.err.println(
          f"[verify] warmup done in ${(System.nanoTime() - w0) / 1e9}%.1f s")
      }
    }
    var nOk = 0; var nFail = 0
    // Sorted order: deterministic run-to-run, and the timing log reads in
    // the same order the driver's compare will.
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val q0 = System.nanoTime()
      val ok =
        try {
          // The dump must be ONE parquet file in the query's own order
          // (the driver's compare is row-order-sensitive); dumpOrdered
          // picks the parallel-checkpoint shape or, for results whose
          // Catalyst size estimate exceeds the budget (default 4 GiB on
          // the 16 GiB heap; override for smaller boxes), the streaming
          // single-task write FIRST — never an OOM-then-retry.
          val maxCp = BigInt(sys.env.getOrElse(
            "GRAFT_VERIFY_MAX_CHECKPOINT_BYTES", (4L << 30).toString))
          val arm = dumpOrdered(fn(spark, sfDir), s"$outDir/$name", maxCp)
          if (arm != "checkpoint")
            System.err.println(s"[verify] $name dumped via $arm arm")
          nOk += 1; true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          nFail += 1; false
        }
      val sec = (System.nanoTime() - q0) / 1e9
      Files.writeString(timingPath,
        f"""{"query":"$name","sec":$sec%.3f,"ok":$ok}%n""",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      // Same inter-query cleanup as Bench/BenchOne (r14): leaked
      // persist blocks from iterative operators thrash later queries'
      // storage memory — measured here as canonical_link_dedup_
      // incremental reading 35.9 s in the gate vs 6.9 s fresh-JVM at
      // the SAME sf. The gate's timing table is the round's public
      // per-query record; it must read in family with the warm probes.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val wall = (System.nanoTime() - t0) / 1e9
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"),
      f"""{"complete":true,"n_queries":${selected.size},"n_dumped":$nOk,"n_failed":$nFail,"wall_sec":$wall%.1f,"cpus":$cpus}%n""")
    System.err.println(
      f"[verify] done: ${selected.size} queries, $nOk dumped, $nFail failed, $wall%.1f s")
    spark.stop()
  }
}
