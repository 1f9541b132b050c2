package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom keyed state via `flatMapGroupsWithState` — the escape hatch for
  * stream semantics `session_window` can't express (SURVEY §2.8 [EXT]).
  *
  * The demo operator: per-user sessionization that ALSO carries custom
  * per-session state (distinct event types seen + a running value sum) and
  * emits a session row only when the session CLOSES (inactivity gap via
  * event-time timeout). Built-in `session_window` aggregations can count
  * and sum, but not, e.g., emit exactly-on-close with arbitrary
  * accumulated payloads.
  *
  * Scale: state lives in the state store, partitioned by user — one
  * shuffle on the grouping key, state size bounded by the timeout (closed
  * sessions are removed). The same function body also serves BATCH via
  * [[sessionizeBatch]] — Spark runs `flatMapGroupsWithState` over a
  * static Dataset by feeding each key's full group once.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, lastSeen: Long, types: Set[String],
                          sumValue: Double, n: Int)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int,
                           n_types: Int, sum_value: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** The state-transition function: merge the batch of events into open
    * state; close (emit) a session when a gap exceeds GapMs or the state
    * times out with no new events. `withTimeout=false` for the batch run
    * (setTimeoutTimestamp is illegal under NoTimeout). */
  def update(withTimeout: Boolean)(userId: Long, events: Iterator[Event],
             state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(close(userId, s))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
    var out = List.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastSeen >= GapMs =>
          out ::= close(userId, s)
          cur = Some(SessionState(t, t, Set(e.event_type), e.value, 1))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.lastSeen, t),
            s.types + e.event_type, s.sumValue + e.value, s.n + 1))
        case None =>
          cur = Some(SessionState(t, t, Set(e.event_type), e.value, 1))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        if (withTimeout) state.setTimeoutTimestamp(s.lastSeen + GapMs)
      case None => ()
    }
    out.reverse.iterator
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.lastSeen + GapMs),
      s.n, s.types.size, s.sumValue)

  /** Streaming form: event-time timeout needs a watermark upstream. */
  def sessionize(events: Dataset[Event]): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(withTimeout = true))
  }

  /** Batch form of the same transition function (each key's whole history
    * arrives as one group; only gap-closed sessions emit — the trailing
    * open session per user stays un-emitted, exactly like streaming before
    * its timeout fires). */
  def sessionizeBatch(events: Dataset[Event]): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update(withTimeout = false))
  }
}
