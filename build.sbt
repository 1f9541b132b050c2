ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crawlingbigdatavisionaidspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap sizing: the 16g + AlwaysPreTouch combo is tuned for the 128 GiB
// bench box (see the comment below) but would fail JVM startup — or
// eagerly zero 16 GiB — on a smaller contributor/CI machine. Auto-shrink
// on boxes with less physical RAM; SPARK_DRIVER_MEM always overrides.
val physGiB: Long = try {
  java.lang.management.ManagementFactory
    .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    .getTotalMemorySize >> 30
} catch { case _: Throwable => 0L }
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM",
  if (physGiB >= 48) "16g" else if (physGiB >= 12) "4g" else "2g")
// Pre-touch only where the big heap fits comfortably (or was explicitly
// requested) — on a small box it just slows startup for no benefit.
val preTouch =
  if (physGiB >= 48 || sys.env.contains("SPARK_DRIVER_MEM"))
    Seq("-XX:+AlwaysPreTouch") else Seq.empty[String]
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // month-name date patterns (Dates.SparkFormats "MMMM d, yyyy") are
  // locale-sensitive; pin English so parse results match the DuckDB
  // oracle's %B regardless of host locale
  "-Duser.language=en", "-Duser.country=US",
  // Heap sized for local[32]: 32 executor threads share this single JVM's
  // unified memory (the target box has 128 GiB). Xms = Xmx with
  // AlwaysPreTouch: dynamic heap EXPANSION was measured as multi-second
  // kernel-side stalls (40-50% sys CPU zeroing fresh pages) that always
  // landed on whichever heavy query first grew the heap — observed as
  // nondeterministic 3-28x slowdowns of the first big dedup query of a
  // run. Pre-touching moves that cost to JVM startup, before anything is
  // timed.
  s"-Xms$driverMem",
  s"-Xmx$driverMem",
) ++ preTouch
