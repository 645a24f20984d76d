package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: inactivity-gap sessionization via
  * `flatMapGroupsWithState` — the arbitrary-state tier of Structured
  * Streaming (beyond watermarked tumbling windows), keyed by user with
  * event-time timeout.
  *
  * Emits one row per CLOSED session (closed by a longer-than-gap silence in
  * the user's own stream, or by watermark timeout); open sessions live in
  * the state store and survive restarts through the checkpoint. Scale:
  * state is hash-partitioned by key across executors; a micro-batch touches
  * only keys with new events plus timed-out keys.
  */
object Sessionize {

  case class Event(userId: Long, eventTime: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(userId: Long, startMillis: Long, endMillis: Long,
      nEvents: Long, sumValue: Double)

  /** `events` must already carry a watermark on `eventTime` (streaming) —
    * e.g. `ds.withWatermark("eventTime", "10 minutes")`.
    */
  def sessions(events: Dataset[Event], gapMillis: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId, evts, state) => updateUser(userId, evts, state, gapMillis))
  }

  /** Unit-testable core: fold a user's new events into session state, emit
    * sessions closed by the inactivity gap or by event-time timeout.
    */
  private[graft] def updateUser(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[SessionState],
      gapMillis: Long): Iterator[Session] = {
    val out = Seq.newBuilder[Session]
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += Session(userId, s.start, s.end, s.n, s.sum)
      }
      state.remove()
    } else {
      val sorted = evts.toArray.sortBy(_.eventTime.getTime)
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.eventTime.getTime
        cur match {
          case Some(s) if t - s.end <= gapMillis =>
            // out-of-order (late but above-watermark) events must not shrink
            // the session span — keep min(start), max(end)
            cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
              s.n + 1, s.sum + e.value))
          case Some(s) => // gap exceeded → close the old session, start fresh
            out += Session(userId, s.start, s.end, s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // flatMapGroupsWithState does NOT drop below-watermark input rows,
        // so a group fed only old events can compute s.end + gap <= watermark;
        // setTimeoutTimestamp then throws and fails the whole query. Clamp to
        // strictly above the watermark (such a session times out on the very
        // next batch, which is the correct outcome for expired events).
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(s.end + gapMillis, wm + 1))
      }
    }
    out.result().iterator
  }
}
