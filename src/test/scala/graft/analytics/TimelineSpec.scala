package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class TimelineSpec extends SparkSpec {
  import spark.implicits._

  test("gap days are filled with 0 and output is date-ascending") {
    val df = Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-04 09:00:00")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val out = Timeline(df, "ts").as[(Date, Long)].collect().toSeq
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 2L),
      (Date.valueOf("2024-01-02"), 0L),
      (Date.valueOf("2024-01-03"), 0L),
      (Date.valueOf("2024-01-04"), 1L)))
  }

  test("single-day range yields one row, nulls dropped") {
    val df = Seq(Some("2024-03-05 01:02:03"), None)
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val out = Timeline(df, "ts").as[(Date, Long)].collect().toSeq
    assert(out == Seq((Date.valueOf("2024-03-05"), 1L)))
  }

  test("lenient parse: ISO variants parse, garbage -> null (P7/F8)") {
    val rows = Seq(
      "2024-01-02 03:04:05",         // plain
      "2024-01-02T03:04:05+00:00",   // <time datetime>
      "2024-01-02T03:04:05",
      "2024-01-02",
      "January 2, 2024",
      "Jan 2, 2024",
      "not a date", "", "13/45/9999")
    val parsed = rows.toDF("raw")
      .select(Timeline.lenientTs(col("raw")).as("ts")).collect().map(_.isNullAt(0))
    assert(parsed.toSeq == Seq(false, false, false, false, false, false, true, true, true))
  }

  test("fromRawDates end-to-end: unparseable rows dropped before counting") {
    val df = Seq("2024-02-01", "garbage", "2024-02-03").toDF("published_at")
    val out = Timeline.fromRawDates(df, "published_at").as[(Date, Long)].collect().toSeq
    assert(out == Seq(
      (Date.valueOf("2024-02-01"), 1L),
      (Date.valueOf("2024-02-02"), 0L),
      (Date.valueOf("2024-02-03"), 1L)))
  }
}
