package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.GraftExtensions

/** User-facing facade: one call wires a session for SQL-first use —
  * fixture tables as temp views, graft's native functions registered —
  * so the whole engine surface is reachable from `spark.sql(...)` as
  * well as the typed APIs.
  *
  * {{{
  * Graft.init(spark, "/data/sf0.1")
  * spark.sql("SELECT source, count(*) FROM documents GROUP BY 1")
  * spark.sql("SELECT graft_dot(a.embedding_d, b.embedding_d) FROM ...")
  * }}}
  */
object Graft {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view + the native functions. */
  def init(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      val df: DataFrame = t match {
        case "events" => Tables.events(spark, dir) // nanos→micros conversion
        case other => Tables.table(spark, dir, other)
      }
      df.createOrReplaceTempView(t)
    }
    GraftExtensions.register(spark)
  }

  /** All driver queries by name, for programmatic use. */
  def query(spark: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
