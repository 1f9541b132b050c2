package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the interval join's contract: streaming == batch on identical
  * input, watermark-expired right rows drop (the documented streaming
  * divergence), inclusive bounds, and the no-nested-loop plan shape. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def purchases(rows: Seq[(Long, Long, String)]) =
    rows.toDF("purchase_id", "user_id", "raw")
      .select($"purchase_id", $"user_id", to_timestamp($"raw").as("purchase_ts"))

  private def clicks(rows: Seq[(Long, Long, String)]) =
    rows.toDF("click_id", "user_id", "raw")
      .select($"click_id", $"user_id", to_timestamp($"raw").as("click_ts"))

  private val p = Seq(
    (100L, 1L, "2024-01-01 10:00:00"),
    (101L, 2L, "2024-01-01 10:00:00"))
  private val c = Seq(
    (1L, 1L, "2024-01-01 09:40:00"),  // in window
    (2L, 1L, "2024-01-01 09:30:00"),  // boundary: exactly -30min, inclusive
    (3L, 1L, "2024-01-01 09:29:59"),  // just outside
    (4L, 1L, "2024-01-01 10:00:00"),  // boundary: equal ts, inclusive
    (5L, 2L, "2024-01-01 09:45:00"),  // other user
    (6L, 1L, "2024-01-01 10:00:01"))  // after the purchase

  test("batch: inclusive [-window, ts] band per key") {
    val out = StreamJoin.intervalJoin(purchases(p), clicks(c), "user_id",
        "purchase_ts", "click_ts", 1800L)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 1L), (100L, 2L), (100L, 4L), (101L, 5L)))
  }

  test("batch plan is a key join with a band filter, not a nested loop") {
    val plan = StreamJoin.intervalJoin(purchases(p), clicks(c), "user_id",
        "purchase_ts", "click_ts", 1800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("streaming matches batch on the same input; expired rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, String)]
    val cIn = MemoryStream[(Long, Long, String)]
    val pStream = pIn.toDF().toDF("purchase_id", "user_id", "raw")
      .select($"purchase_id", $"user_id", to_timestamp($"raw").as("purchase_ts"))
    val cStream = cIn.toDF().toDF("click_id", "user_id", "raw")
      .select($"click_id", $"user_id", to_timestamp($"raw").as("click_ts"))
    val joined = StreamJoin.intervalJoin(pStream, cStream,
      "user_id", "purchase_ts", "click_ts", 1800L,
      watermarkDelay = Some("10 minutes"))
    val q = joined.select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      pIn.addData(p: _*)
      cIn.addData(c: _*)
      q.processAllAvailable()
      val streaming = spark.table("sj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streaming == Set((100L, 1L), (100L, 2L), (100L, 4L), (101L, 5L)))
      // advance both watermarks far past the band, then feed an old click:
      // batch would join it to purchase 100; streaming must drop it.
      pIn.addData((200L, 9L, "2024-01-01 13:00:00"))
      cIn.addData((90L, 9L, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      cIn.addData((7L, 1L, "2024-01-01 09:50:00")) // expired vs watermark
      q.processAllAvailable()
      val after = spark.table("sj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!after.contains((100L, 7L)))
    } finally q.stop()
  }
}
