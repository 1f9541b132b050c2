package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** flatMapGroupsWithState sessionization: gap-close semantics, custom
  * per-session payloads, batch/streaming agreement on closed sessions. */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._
  import StatefulSessions._

  private def ts(m: Int) = new Timestamp(
    Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)

  private val events = Seq(
    Event(1L, ts(0), "click", 1.0),
    Event(1L, ts(10), "view", 2.0),     // same session (gap 10m < 30m)
    Event(1L, ts(50), "click", 3.0),    // closes session 1, opens session 2
    Event(2L, ts(5), "error", 4.0))     // user 2, single open session

  test("batch: gap closes a session with accumulated custom state") {
    val closed = sessionizeBatch(events.toDS()).collect()
    assert(closed.length == 1) // only user 1's first session closed
    val s = closed.head
    assert(s.user_id == 1L && s.n_events == 2 && s.n_types == 2 && s.sum_value == 3.0)
    assert(s.session_start == ts(0))
    assert(s.session_end.getTime == ts(10).getTime + GapMs)
  }

  test("streaming: event-time timeout closes idle sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far past every timeout: all sessions close
      in.addData(Event(99L, ts(600), "click", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
        .filter(_.user_id != 99L)
      assert(closed.length == 3) // u1 s1, u1 s2, u2 s1
      val batchClosed = sessionizeBatch(events.toDS()).collect().toSet
      assert(batchClosed.subsetOf(closed.toSet)) // batch-closed ⊆ stream-closed
    } finally q.stop()
  }
}
