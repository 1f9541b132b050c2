package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Batch `.explain("formatted")` dumper for the optimization rounds:
  * writes `<outDir>/<query><suffix>.txt` for each named query (or for
  * every registered query when none are named), one Spark session for
  * the whole batch. Usage:
  *
  *   runMain graft.tools.ExplDump plans/r16 _after q1 q2 ...
  *
  * Plans are built at sf0.001 (plan SHAPE is scale-invariant; iterative
  * operators execute their driver loops eagerly at build time, so the
  * smallest fixture keeps the dump fast). */
object ExplDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"EXPL $name -> $outDir/$name$suffix.txt")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
