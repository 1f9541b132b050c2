package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the r16 optimization round — NOT part of
  * the driver contract; deleted before round close. */
object Probe16 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
    time("warmup")(docs.count())
    for (i <- 1 to 3) {
      time(s"df.rdd.getNumPartitions scan #$i") {
        val n = graft.Tables.documents(spark, sfDir).rdd.getNumPartitions
        println(s"PROBE   parts=$n")
      }
      time(s"df.rdd.getNumPartitions filtered #$i") {
        val n = graft.Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 2 === 0).rdd.getNumPartitions
        println(s"PROBE   parts=$n")
      }
      time(s"executedPlan partitions #$i") {
        val df = graft.Tables.documents(spark, sfDir)
        val n = df.queryExecution.toRdd.getNumPartitions
        println(s"PROBE   parts=$n")
      }
    }
    spark.stop()
  }
}
