package graft.tools

import java.nio.file.{Files, Paths}

/** One-command regeneration of the BASELINE.md TRUE-scale audit (r14,
  * the r13 verdict's #4): the 41-heavy m1→m10 tables were measured by a
  * hand-run protocol (regenerate seed-42 corpora, paired fresh-JVM
  * `BenchOne` runs, identical order, totals warmup) that lived only in
  * prose — so a new heavy query could ship without a scale row, and the
  * table could silently rot. This main IS the protocol:
  *
  *   1. regenerates the seed-pinned corpora via [[GenSf.generate]]
  *      (byte-exact per GenSfSpec — skipped per corpus when the
  *      directory already exists unless `--regen` forces a redraw);
  *   2. forks ONE FRESH JVM per corpus running [[graft.BenchOne]] over
  *      `totals` (discarded warmup) + the named queries in the given
  *      order — same local[8], same add-opens, same heap discipline as
  *      the committed tables;
  *   3. parses the BENCHONE lines and emits the BASELINE.md-shaped
  *      markdown table (query, per-corpus seconds, ratio) to stdout and
  *      `--out` (default `/tmp/scale_audit.md`).
  *
  * Usage:
  *   runMain graft.tools.ScaleAudit [--regen] [--out <path>]
  *     [--mults 1,10] [--seed 42] <query names...>
  *
  * The forked-JVM shape is the point: Spark's block manager, codegen
  * cache and GC history make in-process "paired" timings lie; the
  * committed tables are fresh-JVM by protocol, so the tool must be too.
  * The fork classpath is derived from this class's own code source +
  * the scala-library jar + /opt/spark/jars (the repo's unmanagedBase),
  * so the tool works identically under `sbt runMain` and the direct
  * `java -cp` launcher. */
object ScaleAudit {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def codeSourceOf(c: Class[_]): String =
    new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  private def childClasspath: String = {
    val self = codeSourceOf(getClass)                 // target/scala-2.13/classes
    val scalaLib = codeSourceOf(classOf[scala.Predef.type]) // scala-library jar
    s"$self:$scalaLib:/opt/spark/jars/*"
  }

  /** Corpus directory per (mult, seed): the documented default seed
    * keeps the BASELINE.md paths (`/tmp/gensf_m10`); any other seed
    * gets its own suffixed directory so a cached default-seed corpus
    * can never be silently benched under a different seed label. A
    * `_gensf_seed` marker written at generation time double-checks
    * even the default path (a marker-less legacy dir is trusted only
    * for the default seed). */
  private def corpusDir(mult: Int, seed: Long): String =
    if (seed == GenSf.DefaultSeed) s"/tmp/gensf_m$mult"
    else s"/tmp/gensf_m${mult}_s$seed"

  private def seedMarker(dir: String) = Paths.get(dir, "_gensf_seed")

  /** True when `dir` holds a usable corpus for `seed` — exists AND its
    * marker (when present) matches. */
  private def corpusUsable(dir: String, seed: Long): Boolean =
    Files.exists(Paths.get(s"$dir/documents.parquet")) && {
      val m = seedMarker(dir)
      if (Files.exists(m)) Files.readString(m).trim == seed.toString
      else seed == GenSf.DefaultSeed
    }

  /** Run BenchOne in a fresh JVM; returns (query -> seconds) parsed
    * from its BENCHONE lines (warmup rows included — caller drops). */
  private def benchFresh(sfDir: String, queries: Seq[String]): Map[String, Double] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // Same heap discipline as build.sbt: 16g + pre-touch on the bench
    // box, auto-shrunk on smaller machines, SPARK_DRIVER_MEM always
    // wins — a hard-coded 16g would fail JVM startup on a contributor
    // box and abort the audit after the corpus-generation phase.
    val physGiB =
      try java.lang.management.ManagementFactory
        .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
        .getTotalMemorySize >> 30
      catch { case _: Throwable => 0L }
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM",
      if (physGiB >= 48) "16g" else if (physGiB >= 12) "4g" else "2g")
    val preTouch =
      if (physGiB >= 48 || sys.env.contains("SPARK_DRIVER_MEM"))
        Seq("-XX:+AlwaysPreTouch") else Seq.empty[String]
    val cmd = Seq(javaBin) ++ AddOpens ++ Seq(s"-Xms$mem", s"-Xmx$mem") ++
      preTouch ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-Duser.language=en", "-Duser.country=US",
      "-cp", childClasspath, "graft.BenchOne", sfDir) ++ queries
    System.err.println(s"[scale-audit] fresh JVM: BenchOne $sfDir ${queries.size} queries")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val p = pb.start()
    // Drain stderr concurrently (Spark logs) so the child never blocks
    // on a full pipe during a long query.
    val errDrain = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getErrorStream))
      var l = r.readLine()
      while (l != null) l = r.readLine()
    })
    errDrain.setDaemon(true); errDrain.start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val Line = """BENCHONE (\S+) ([0-9.]+) sec rows=(\d+)""".r
    var results = Map.empty[String, Double]
    var line = out.readLine()
    while (line != null) {
      line match {
        case Line(q, sec, _) =>
          results += q -> sec.toDouble
          System.err.println(s"[scale-audit]   $q ${sec}s")
        case _ =>
      }
      line = out.readLine()
    }
    val rc = p.waitFor()
    require(rc == 0, s"BenchOne on $sfDir exited $rc")
    results
  }

  def main(args: Array[String]): Unit = {
    var regen = false
    var out = "/tmp/scale_audit.md"
    var mults = Seq(1, 10)
    var seed = 42L
    val queries = scala.collection.mutable.ArrayBuffer.empty[String]
    def optValue(flag: String, i: Int): String = {
      require(i + 1 < args.length, s"$flag needs a value\n" +
        "usage: ScaleAudit [--regen] [--out p] [--mults 1,10] [--seed 42] <queries...>")
      args(i + 1)
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--regen" => regen = true
        case "--out" => out = optValue("--out", i); i += 1
        case "--mults" =>
          mults = optValue("--mults", i).split(",").map(_.trim.toInt).toSeq; i += 1
        case "--seed" => seed = optValue("--seed", i).toLong; i += 1
        case q => queries += q
      }
      i += 1
    }
    require(queries.nonEmpty,
      "usage: ScaleAudit [--regen] [--out p] [--mults 1,10] [--seed 42] <queries...>")
    val unknown = queries.filterNot(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    // 1. corpora — regenerate missing or seed-mismatched (or all, under
    // --regen) with ONE shared session, stopped before any timing JVM
    // starts.
    val need = mults.map(m => m -> corpusDir(m, seed))
      .filter { case (_, d) => regen || !corpusUsable(d, seed) }
    if (need.nonEmpty) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
        math.min(16, Runtime.getRuntime.availableProcessors).toString)
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      need.foreach { case (m, d) =>
        System.err.println(s"[scale-audit] generating $d (mult=$m seed=$seed)")
        GenSf.generate(spark, d, m.toDouble, seed = seed)
        Files.writeString(seedMarker(d), seed.toString)
      }
      spark.stop()
    }

    // 2. one fresh JVM per corpus, identical query order, totals warmup
    val cols = mults.map { m =>
      m -> benchFresh(corpusDir(m, seed), "totals" +: queries.toSeq)
    }

    // 3. the BASELINE.md-shaped table
    val head = mults.map(m => s"m$m").mkString("| query | ", " | ", " | ratio |")
    val sep = "|---|" + mults.map(_ => "---|").mkString + "---|"
    val rows = queries.toSeq.map { q =>
      val secs = cols.map { case (_, r) => r.get(q) }
      val cells = secs.map(_.map(s => f"$s%.1f").getOrElse("—")).mkString(" | ")
      val ratio = (secs.head, secs.last) match {
        case (Some(a), Some(b)) if a > 0 => f"${b / a}%.1f×"
        case _ => "—"
      }
      s"| $q | $cells | $ratio |"
    }
    val table =
      (s"Scale audit (seed $seed, mults ${mults.mkString("/")}, fresh-JVM " +
        s"BenchOne local[8], totals warmup):\n\n$head\n$sep\n") +
        rows.mkString("\n") + "\n"
    Files.writeString(Paths.get(out), table)
    println(table)
    System.err.println(s"[scale-audit] table written to $out")
  }
}
