package graft.tools

/** Dev harness: dump (host, scala_regdom) TSV and the DuckDB mirror SQL
  * for the same hosts, so a driver-side duckdb run can diff the two
  * engines. Not part of the library surface. */
object PslParityDump {
  def main(args: Array[String]): Unit = {
    val hosts = Seq(
      "news.example.com", "example.com", "a.b.c.example.com",
      "archive.foo.co.uk", "foo.co.uk", "co.uk", "uk",
      "alice.github.io", "www.alice.github.io", "github.io",
      "cool.blogspot.com", "shop.acme.com.sg", "x.y.co.il", "uni.ac.at",
      "bar.foo.ck", "www.ck", "sub.www.ck", "foo.ck",
      "192.168.0.1", "localhost", "", "weird..dots", "trailing.dot.",
      "city.kawasaki.jp", "x.city.kawasaki.jp", "other.kawasaki.jp",
      "a.other.kawasaki.jp", "s3.amazonaws.com", "b.s3.amazonaws.com",
      "xn--fiqs8s", "a.xn--fiqs8s")
    val scalaOut = hosts.map(h => s"$h\t${graft.ingest.Psl.registeredDomainOf(h)}")
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      scalaOut.mkString("\n").getBytes("UTF-8"))
    val values = hosts.zipWithIndex
      .map { case (h, i) => s"($i, 'https://${h}/p')" }.mkString(",\n  ")
    val sql =
      s"""WITH ${graft.ingest.Psl.sqlPslCte},
         |u(id, url) AS (FROM (VALUES
         |  $values)),
         |${graft.ingest.Psl.sqlDomainCtes("u", "id", Seq.empty, "url", "d")}
         |SELECT id, COALESCE(domain, '<null>') AS domain FROM d ORDER BY id""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)), sql.getBytes("UTF-8"))
  }
}
