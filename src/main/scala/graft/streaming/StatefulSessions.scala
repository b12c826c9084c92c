package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom stateful session tracking via `flatMapGroupsWithState` (SURVEY
  * §2-K: "KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState
  * for custom state") — the escape hatch when `session_window` can't
  * express the semantics (here: sessions additionally close after N events,
  * a cap no built-in window supports).
  *
  * State per user = (session start, last ts, count, sum). An incoming event
  * either extends the open session or closes it (gap > 30 min OR count cap)
  * and emits the closed one. Event-time timeout emits the final session
  * when the watermark passes lastTs + gap.
  *
  * Late events (cross-batch, within the watermark): events are sorted
  * within each batch, but a later BATCH can deliver an event whose ts is
  * older than the open session's lastTs. Such an event MERGES into the
  * open session — start/lastTs extend monotonically (min/max), so state
  * never regresses and the event-time timeout stays correct. An event
  * older than the watermark never reaches the function (Spark drops it);
  * an in-watermark event older than even the session start widens the
  * session backward rather than resurrecting a closed one — the
  * single-state-per-key trade-off, documented here and pinned in
  * StatefulSessionsSpec.
  *
  * 100 TB/stream note: state is one small record per active key; the
  * shuffle is on user_id. This is the pattern for arbitrary per-key
  * streaming state machines (fraud windows, funnels, CDC collapse).
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, sum_value: Double, reason: String)

  val GapMs: Long = 30 * 60 * 1000L
  val MaxEvents = 100

  def updateState(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    var out = List.empty[ClosedSession]
    if (state.hasTimedOut) {
      val s = state.get
      out ::= ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
        s.n, s.sum, "timeout")
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs > GapMs =>
            out ::= ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.lastTs),
              s.n, s.sum, "gap")
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) if s.n + 1 >= MaxEvents =>
            out ::= ClosedSession(userId, new Timestamp(math.min(s.start, t)),
              new Timestamp(math.max(s.lastTs, t)), s.n + 1, s.sum + e.value, "cap")
            cur = None
          case Some(s) =>
            // monotonic merge: a cross-batch late event (t <= lastTs, still
            // inside the watermark) must not regress lastTs or the timeout
            cur = Some(SessionState(math.min(s.start, t), math.max(s.lastTs, t),
              s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + GapMs)
        case None => state.remove()
      }
    }
    out.reverseIterator
  }

  /** Wire the state machine over a (possibly streaming) typed event set. */
  def sessions(events: Dataset[SessionEvent])(implicit s: SparkSession): Dataset[ClosedSession] = {
    import s.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateState)
  }
}
