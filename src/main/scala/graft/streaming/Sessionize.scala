package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native stateful sessionization via
  * `flatMapGroupsWithState` — one open-session state per user. The
  * batch-declarative equivalent lives in [[EventStream.sessionize]];
  * this is the incremental form a live stream runs.
  *
  * State sizing: [[streamingSessionize]] keeps one `SessionState` per
  * EVER-SEEN user (`NoTimeout` — fine for the bounded batch-parity
  * spec); [[streamingSessionizeEvicting]] is the production form —
  * `EventTimeTimeout` with a `lastMs + gap` timer per user, so an idle
  * user's open session is flushed and its state REMOVED once the
  * watermark passes the gap. State size is then O(active users in the
  * gap window), not O(all users ever).
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, tms: Long)
  /** Evicting-path input: carries the watermarked TIMESTAMP column
    * itself — event-time timeout requires the watermark tag to survive
    * into the grouped Dataset, and projecting `ts` to a long strips it.
    */
  final case class EventT(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
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

  /** Same fold as [[updateSessions]] plus state eviction: on a
    * watermark-past-timer callback the stored open session is flushed
    * one last time and its state removed; every live update re-arms
    * the timer at `lastMs + GapMs`. The flush row duplicates the
    * session's latest emission, which is the operator's contract
    * anyway (downstream keeps the last row per (user, session_id)).
    */
  def updateSessionsEvicting(userId: Long, events: Iterator[EventT],
      state: GroupState[SessionState]): Iterator[SessionUpdate] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(SessionUpdate(userId, st.sessionId, st.nEvents, st.startMs,
        st.lastMs - st.startMs))
    } else {
      val out = updateSessions(userId,
        events.map(e => Event(e.user_id, e.event_id, e.ts.getTime)), state)
      state.getOption.foreach { st =>
        // a timer must not be set behind the current watermark (Spark
        // rejects it); clamp when this group's data arrived late.
        // getCurrentWatermarkMs throws when no watermark exists (batch
        // execution of the same fold) — treat that as "no clamp".
        val target = st.lastMs + GapMs
        val armAt =
          try math.max(target, state.getCurrentWatermarkMs() + 1)
          catch { case _: UnsupportedOperationException => target }
        state.setTimeoutTimestamp(armAt)
      }
      out
    }
  }

  /** Wire the stateful op over a (possibly streaming) typed Dataset. */
  def streamingSessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateSessions _)
  }

  /** Production wiring: event-time timers evict idle users' state. The
    * input stream MUST carry a watermark (`withWatermark` upstream of
    * the `as[Event]` projection) — event-time timeout is driven by it.
    *
    * Contract note: once a user's state is evicted, a later return
    * restarts their per-user session counter at 1 — downstream
    * consumers must key sessions by (user_id, start_ms), not by the
    * counter alone. (The unbounded [[streamingSessionize]] keeps
    * counters globally monotone at the cost of unbounded state.)
    */
  def streamingSessionizeEvicting(spark: SparkSession,
      events: Dataset[EventT]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSessionsEvicting _)
  }
}
