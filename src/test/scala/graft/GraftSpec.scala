package graft

/** The facade: SQL-first access to tables and native functions. */
class GraftSpec extends SparkSpec {

  test("init registers views and functions; sql end-to-end") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0)
    assert(n == 500)
    val top = spark.sql(
      """SELECT source, COUNT(*) AS n FROM documents
        |GROUP BY source ORDER BY n DESC, source LIMIT 1""".stripMargin).head()
    assert(top.getLong(1) > 0)
    val d = spark.sql(
      """SELECT graft_dot(transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |                 transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sq
        |FROM embeddings e LIMIT 1""".stripMargin).head().getDouble(0)
    assert(d > 0.0)
    assert(Graft.query(spark, "/root/testdata/sf0.001", "totals").count() == 1)
  }
}
