package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time user sessionization with a gap timeout, via
  * `flatMapGroupsWithState` — the custom-state Structured Streaming path.
  *
  * A session is a maximal run of a user's events where consecutive events
  * are less than `gapSeconds` apart. Sessions are emitted when the gap is
  * exceeded by a newer event (and, in streaming mode, when the event-time
  * timeout fires after the watermark passes the gap).
  *
  * State per user is O(1) (the open session aggregate, not the events), so
  * state size scales with active-user cardinality — the correct shape for
  * a 100 TB stream. Events inside one micro-batch are sorted in-memory per
  * user before folding; cross-batch ordering is the stream's job
  * (watermark + dropped-late rows).
  */
object Sessionize {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** start/end are epoch MICROseconds: the event data is
    * microsecond-granular, and comparing millisecond-truncated
    * `Timestamp.getTime` would disagree with the relational sessionizer
    * q32 (which splits on microsecond gaps) for boundary-window gaps.
    */
  case class SessionState(start: Long, end: Long, nEvents: Long, totalValue: Double)

  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long, total_value: Double, duration_sec: Long)

  private[streaming] def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTimestamp(us: Long): Timestamp = {
    val sec = math.floorDiv(us, 1000000L)
    val t = new Timestamp(sec * 1000L)
    t.setNanos(((us - sec * 1000000L) * 1000L).toInt)
    t
  }

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, toTimestamp(s.start), toTimestamp(s.end), s.nEvents,
      s.totalValue, (s.end - s.start) / 1000000L)

  /** Fold a user's new (batch-sorted) events into the open session,
    * emitting every session closed by a gap.
    */
  def updateUser(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      open match {
        // gap <= gapUs continues the session (split strictly-greater),
        // matching the relational sessionizer q32 (`us - prev > gapUs`
        // splits) so batch and streaming agree on boundary-exact gaps.
        case Some(s) if t - s.end <= gapUs =>
          open = Some(SessionState(s.start, math.max(s.end, t),
            s.nEvents + 1, s.totalValue + e.value))
        case Some(s) =>
          closed += toSession(userId, s)
          open = Some(SessionState(t, t, 1, e.value))
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        if (state.getOption.isDefined && !state.hasTimedOut) {
          // close the session once the watermark passes end + gap
          // timeout API is millisecond-based: round up so it fires
          // strictly after end + gap
          try state.setTimeoutTimestamp(math.floorDiv(s.end + gapUs, 1000L) + 1L)
          catch { case _: UnsupportedOperationException => () } // batch mode
        }
      case None => ()
    }
    closed.result().iterator
  }

  /** Sessionize an event stream (or bounded Dataset) by user with the
    * given gap. Streaming output mode: Append (sessions emitted once,
    * when closed by a gap or by the event-time timeout).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateUser(gapSeconds * 1000000L))
  }
}
