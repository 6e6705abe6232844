package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with event-time timeout — the continuous
  * analogue of Sessionize.sessions: a user's session accumulates
  * until `gapMs` of event-time silence, then the closed session is
  * emitted exactly once.
  *
  * Uses flatMapGroupsWithState + EventTimeTimeout: state per active
  * (user) key only, closed by the watermark clock — the standard
  * unbounded-stream shape (state size = active sessions, not
  * history).
  */
object StreamingSessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Long, session_value: Double)

  /** @param watermarkDelayMs how long to admit late events before the
    *   watermark closes a session; defaults to half the session gap
    *   (floored at 1s) so lateness tolerance scales with the gap
    *   instead of a fixed literal.
    */
  def sessions(events: Dataset[SessionEvent], gapMs: Long,
               watermarkDelayMs: Long = -1L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val delay =
      if (watermarkDelayMs >= 0) watermarkDelayMs
      else math.max(gapMs / 2, 1000L)
    events
      .withWatermark("ts", s"$delay milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, batch, state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.end, s.n, s.total))
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end > gapMs =>
                  closed ::= ClosedSession(user, s.start, s.end, s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
