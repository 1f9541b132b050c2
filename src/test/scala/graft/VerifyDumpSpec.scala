package graft

import org.scalatest.funsuite.AnyFunSuite

/** The size-gated dump shape (r16, the r15 verdict's #5): results whose
  * Catalyst estimate exceeds the checkpoint budget must take the
  * streaming single-task write FIRST — never checkpoint-then-OOM-retry —
  * and both arms must produce identical single-file ordered parquet. */
class VerifyDumpSpec extends SparkSpec {

  private def ordered = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"row_$i")).toDF("id", "tag")
      .orderBy(org.apache.spark.sql.functions.desc("id"))
  }

  private def readBack(path: String): Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(path).as[(Long, String)].collect().toSeq
  }

  test("both arms write the same single ordered parquet file; the arm " +
      "follows the size estimate") {
    val dir = java.nio.file.Files.createTempDirectory("verify-dump-spec")
    try {
      val big = BigInt(Long.MaxValue)
      val tiny = BigInt(1)
      assert(Verify.dumpOrdered(ordered, s"$dir/cp", big) == "checkpoint")
      assert(Verify.dumpOrdered(ordered, s"$dir/st", tiny) == "stream-estimated",
        "an estimate above budget must take the streaming arm FIRST")
      val cp = readBack(s"$dir/cp")
      val st = readBack(s"$dir/st")
      assert(cp == st, "arms must agree byte-for-byte on rows AND order")
      assert(cp.head == ((100L, "row_100")) && cp.last == ((1L, "row_1")),
        "the query's own order must survive the dump")
      // single file: the driver's compare reads one part file per query
      def partFiles(p: String) =
        new java.io.File(p).listFiles().count(_.getName.startsWith("part-"))
      assert(partFiles(s"$dir/cp") == 1 && partFiles(s"$dir/st") == 1)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
