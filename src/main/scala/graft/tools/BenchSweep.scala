package graft.tools

/** Mechanized multi-sweep bench protocol (r16, the r15 verdict's #7+#8).
  *
  * The r15 definitive bench was a hand-run five-sweep procedure living in
  * prose (run `graft.Bench` five times, take per-query medians, attribute
  * the bimodal 445/522 s totals to neighbor/VM contention by inference).
  * This main mechanizes both halves:
  *
  *  - **N sweeps, one command**: each sweep is a FRESH child JVM running
  *    [[graft.Bench]] — the same isolation the hand protocol had (heap
  *    state, codegen caches, and block-manager residue never leak across
  *    sweeps). The child inherits this JVM's classpath and its
  *    `--add-opens`/`-X`/`-D` options verbatim, so `sbt 'runMain
  *    graft.tools.BenchSweep 5 BENCH_r16'` reproduces the exact
  *    environment of the documented single-sweep command.
  *  - **Host counters beside every sweep** (the r15 verdict's #7): deltas
  *    of `/proc/stat` (user/system/idle/iowait/steal jiffies) and
  *    `/proc/diskstats` (sectors read/written) bracket each sweep, so a
  *    slow-mode sweep carries its mechanical evidence — a sweep whose
  *    wall-clock inflates while its OWN cpu busy share drops and
  *    iowait/steal rise was robbed by the host, not by a query
  *    regression. No new jars: plain file reads of public kernel
  *    interfaces, absent (→ empty) on non-Linux.
  *  - **Artifacts**: `<prefix>_perq.json` — the flat per-query MEDIAN map
  *    [[ScaleRowCheck]] enforces against — and `<prefix>_sweeps.json` —
  *    per-sweep totals, failures, host-counter deltas, and the
  *    slow-mode marks (total > 8% above the sweep median — the observed
  *    r15 modes sat ~11% apart, so the band splits them cleanly while
  *    absorbing the documented ±5% drift).
  *
  * Failed queries print negative sentinels in Bench's JSON; the median
  * here is taken over the non-negative samples only, so one sweep's
  * transient failure doesn't poison a query's median (it DOES surface in
  * the sweep's `failures` count).
  */
object BenchSweep {

  /** Odd-count exact middle, even-count mean-of-middles. */
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of empty sample")
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Per-query median across sweeps, ignoring failure sentinels
    * (negative) and queries absent from a sweep. */
  def perQueryMedians(sweeps: Seq[Map[String, Double]]): Map[String, Double] =
    sweeps.flatMap(_.keys).distinct.flatMap { q =>
      val ok = sweeps.flatMap(_.get(q)).filter(_ >= 0.0)
      if (ok.isEmpty) None else Some(q -> median(ok))
    }.toMap

  /** Slow-mode marks: totals more than `bandPct` above the median total.
    * Mechanical, not diagnostic — the counters beside the mark say WHY. */
  def slowMarks(totals: Seq[Double], bandPct: Double = 8.0): Seq[Boolean] = {
    val m = median(totals)
    totals.map(t => t > m * (1.0 + bandPct / 100.0))
  }

  /** First line of /proc/stat → cpu jiffies by field name. */
  def parseProcStat(text: String): Map[String, Long] =
    text.linesIterator.find(_.startsWith("cpu ")) match {
      case None => Map.empty
      case Some(line) =>
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        val names = Seq("user", "nice", "system", "idle", "iowait",
          "irq", "softirq", "steal")
        names.zip(f).toMap
    }

  /** /proc/diskstats → (sectorsRead, sectorsWritten) summed over WHOLE
    * block devices (partitions excluded so parent+partition rows don't
    * double count; loop/ram skipped). Used as a relative contention
    * signal between sweeps on the same box. */
  private val WholeDevice =
    """^(sd[a-z]+|vd[a-z]+|xvd[a-z]+|hd[a-z]+|nvme\d+n\d+|mmcblk\d+|dm-\d+|md\d+)$""".r

  def parseDiskstats(text: String): (Long, Long) = {
    var r = 0L; var w = 0L
    text.linesIterator.foreach { line =>
      val f = line.trim.split("\\s+")
      if (f.length >= 10 && WholeDevice.matches(f(2))) {
        r += f(5).toLong
        w += f(9).toLong
      }
    }
    (r, w)
  }

  private def readFileOrEmpty(p: String): String =
    try new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    catch { case _: Throwable => "" }

  /** The "queries" object of a Bench JSON line, as raw text (flat map —
    * no nested braces by construction). */
  def queriesObject(benchLine: String): Option[String] =
    """"queries":(\{[^}]*\})""".r.findFirstMatchIn(benchLine).map(_.group(1))

  /** Per-query seconds from a Bench sweep line, INCLUDING negative
    * failure sentinels (callers filter). */
  def parseSweep(benchLine: String): Map[String, Double] =
    queriesObject(benchLine).map { obj =>
      """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?(?:[eE]-?[0-9]+)?)""".r
        .findAllMatchIn(obj).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)

  def main(args: Array[String]): Unit = {
    val n = if (args.length >= 1) args(0).toInt else 5
    val prefix = if (args.length >= 2) args(1) else "BENCH_sweep"
    require(n >= 1, "need >= 1 sweeps")

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.toSeq.map(_.toString)
      .filter(o => o.startsWith("--add-opens") || o.startsWith("-X") ||
        o.startsWith("-D"))
    // --add-opens may arrive as one token ("--add-opens=m/p=ALL-UNNAMED")
    // or two ("--add-opens", "m/p=ALL-UNNAMED"); getInputArguments
    // preserves the original tokens, and two-token pairs keep their
    // second half (starts with "java.base/...", filtered OUT above) — so
    // re-pair from the module list instead of trusting the filter.
    val pairedOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.toSeq.map(_.toString)
      .sliding(2).collect {
        case Seq(a, b) if a == "--add-opens" => Seq(a, b)
      }.flatten.toSeq
    val childOpts = (jvmOpts.filterNot(_ == "--add-opens") ++ pairedOpens)

    val sweeps = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Int, Map[String, Double], Map[String, Long], (Long, Long), Double)]
    var i = 0
    while (i < n) {
      val stat0 = parseProcStat(readFileOrEmpty("/proc/stat"))
      val disk0 = parseDiskstats(readFileOrEmpty("/proc/diskstats"))
      val t0 = System.nanoTime()
      val cmd = (Seq(javaBin) ++ childOpts ++
        Seq("-cp", cp, "graft.Bench")).toArray
      val pb = new ProcessBuilder(cmd: _*)
      // stderr to a file, not a pipe: Bench logs freely on stderr and a
      // full 64 KiB pipe buffer would deadlock the child against our
      // sequential stdout read
      val errFile = new java.io.File(s"/tmp/benchsweep_stderr_$i.log")
      pb.redirectError(errFile)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes())
      val rc = proc.waitFor()
      val err = readFileOrEmpty(errFile.getPath)
      val wall = (System.nanoTime() - t0) / 1e9
      val stat1 = parseProcStat(readFileOrEmpty("/proc/stat"))
      val disk1 = parseDiskstats(readFileOrEmpty("/proc/diskstats"))
      val statDelta = stat1.map { case (k, v) => k -> (v - stat0.getOrElse(k, 0L)) }
      val diskDelta = (disk1._1 - disk0._1, disk1._2 - disk0._2)
      val line = out.linesIterator.find(_.contains("\"queries\""))
        .getOrElse("")
      if (rc != 0 || line.isEmpty) {
        System.err.println(s"[sweep $i] child rc=$rc, no queries line; stderr tail:")
        System.err.println(err.linesIterator.toSeq.takeRight(20).mkString("\n"))
      }
      val perq = parseSweep(line)
      val failures = perq.values.count(_ < 0.0)
      val total = perq.values.filter(_ >= 0.0).sum
      sweeps += ((total, failures, perq, statDelta, diskDelta, wall))
      System.err.println(f"[sweep $i] total=$total%.1f s failures=$failures wall=$wall%.1f s " +
        s"cpu=${statDelta.getOrElse("user", 0L) + statDelta.getOrElse("system", 0L)}j " +
        s"iowait=${statDelta.getOrElse("iowait", 0L)}j steal=${statDelta.getOrElse("steal", 0L)}j " +
        s"wsect=${diskDelta._2}")
      i += 1
    }

    val medians = perQueryMedians(sweeps.map(_._3).toSeq)
    val marks = slowMarks(sweeps.map(_._1).toSeq)

    def fmt(d: Double): String = f"$d%.3f"
    val perqJson = medians.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": ${fmt(v)}""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${prefix}_perq.json"),
      perqJson.getBytes("UTF-8"))

    val sweepJson = sweeps.zipWithIndex.map {
      case ((total, failures, perq, stat, disk, wall), idx) =>
        val cpuKeys = Seq("user", "nice", "system", "idle", "iowait",
          "irq", "softirq", "steal")
        val statJson = cpuKeys.flatMap(k => stat.get(k).map(v => s""""$k":$v"""))
          .mkString("{", ",", "}")
        s"""  {"sweep":$idx,"total_sec":${fmt(total)},"wall_sec":${fmt(wall)},""" +
          s""""n_queries":${perq.size},"failures":$failures,"slow_mode":${marks(idx)},""" +
          s""""cpu_jiffies":$statJson,"sectors_read":${disk._1},"sectors_written":${disk._2}}"""
    }.mkString("[\n", ",\n", "\n]")
    val summary =
      s"""{
         |"protocol":"per-query median of $n fresh-JVM sweeps; slow_mode = total > 8% above median (see BASELINE.md r15 bimodal-noise section)",
         |"median_total_sec":${fmt(median(sweeps.map(_._1).toSeq))},
         |"sweeps":$sweepJson
         |}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${prefix}_sweeps.json"),
      summary.getBytes("UTF-8"))
    println(s"wrote ${prefix}_perq.json (${medians.size} queries) and ${prefix}_sweeps.json")
  }
}
