package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton-code correctness and the locality contract of the z-ordered
  * layout: per-file bounding boxes must shrink in BOTH dimensions vs a
  * single-column sort. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit-interleave on the driver. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("morton2 matches the reference interleave") {
    // hand case: x=3 (0b11), y=5 (0b101) -> 0b100111 = 39
    assert(mortonRef(3, 5, 4) == 39L)
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = rows.toDF("x", "y")
      .select($"x", $"y", ZOrder.morton2($"x", $"y", 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(out((x, y)) == mortonRef(x, y, 8), s"($x, $y)")
    }
  }

  test("z-order layout: per-file bounding boxes tight in both dimensions") {
    // A 64x64 grid, arriving in arbitrary order.
    val grid = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"),
        $"id".as("payload"))
    def avgSpread(path: String, c: String): Double = {
      val spreads = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("spread"))
        .select(avg($"spread")).head().getDouble(0)
      spreads
    }
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.writeZOrdered(grid, zdir, "x", "y", numFiles = 16, bits = 6)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(ldir)
    // Linear-by-x layout: x is tight but y spans the full domain (~63)
    // in every file. Z-order: BOTH spreads collapse to ~a 16x16 tile.
    val (zx, zy) = (avgSpread(zdir, "x"), avgSpread(zdir, "y"))
    val ly = avgSpread(ldir, "y")
    assert(ly > 50, s"linear layout should not cluster y (got $ly)")
    assert(zy < ly / 2, s"z-order y-spread $zy vs linear $ly")
    assert(zx < 32 && zy < 32, s"z-order box should be tight: x=$zx y=$zy")
  }
}
