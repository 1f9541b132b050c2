package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"BENCHONE $name ${(System.nanoTime()-t0)/1e9}%.2f sec rows=$n")
      // Same inter-query cleanup as Bench: leaked persist/localCheckpoint
      // blocks from iterative operators thrash later queries' storage
      // memory (observed 3-28× slowdowns) — exactly the misleading warm
      // numbers this tool exists to avoid. The GC nudge clears the
      // accumulated dead heap that otherwise inflates later CPU-heavy
      // queries 2-3× (see Bench.dropPersisted).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
