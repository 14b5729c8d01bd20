package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native stateful sessionization via
  * `flatMapGroupsWithState` — one open-session state per user. The
  * batch-declarative equivalent lives in [[EventStream.sessionize]];
  * this is the incremental form a live stream runs.
  *
  * State sizing: one `SessionState` per EVER-SEEN user under
  * `NoTimeout` (fine for the bounded harness data and the batch
  * parity spec). A production deployment adds
  * `GroupStateTimeout.EventTimeTimeout` + `setTimeoutTimestamp(last +
  * gap)` so idle users' sessions are closed and evicted by the
  * watermark — same `updateSessions` fold, plus an `if
  * (state.hasTimedOut)` flush branch.
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, tms: Long)
  final case class SessionState(sessionId: Long, startMs: Long, lastMs: Long, nEvents: Long)
  final case class SessionUpdate(user_id: Long, session_id: Long, n_events: Long,
      start_ms: Long, duration_ms: Long)

  val GapMs = 1800000L

  /** Incremental update: fold this batch's events into per-user open
    * sessions; emit the (possibly still-open) session row each time.
    */
  def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionUpdate] = {
    val sorted = events.toSeq.sortBy(e => (e.tms, e.event_id))
    var cur = state.getOption
    val out = Seq.newBuilder[SessionUpdate]
    sorted.foreach { e =>
      cur match {
        case Some(st) if e.tms - st.lastMs <= GapMs =>
          cur = Some(st.copy(lastMs = e.tms, nEvents = st.nEvents + 1))
        case Some(st) =>
          out += SessionUpdate(userId, st.sessionId, st.nEvents, st.startMs,
            st.lastMs - st.startMs)
          cur = Some(SessionState(st.sessionId + 1, e.tms, e.tms, 1))
        case None =>
          cur = Some(SessionState(1, e.tms, e.tms, 1))
      }
    }
    cur.foreach { st =>
      state.update(st)
      out += SessionUpdate(userId, st.sessionId, st.nEvents, st.startMs,
        st.lastMs - st.startMs)
    }
    out.result().iterator
  }

  /** Wire the stateful op over a (possibly streaming) typed Dataset. */
  def streamingSessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateSessions _)
  }
}
