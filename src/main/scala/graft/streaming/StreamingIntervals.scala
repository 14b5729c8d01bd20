package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch interval-algebra sweeps
  * ([[graft.operators.Intervals]], q134/q135): the same per-key
  * sorted sweep run INCREMENTALLY under `mapGroupsWithState`, with
  * the time axis partitioned by the advancing watermark instead of by
  * fixed ranges — the streaming analogue of the scaled paths' carry:
  * each trigger folds the ripe (≤ watermark) prefix into durable
  * state and carries exactly the sweep frontier forward.
  *
  * State per key is BOUNDED by the watermark lag, not by history:
  *
  *  - union length: a flushed `covered_ms` counter plus the disjoint
  *    coverage segments ending ABOVE the watermark. A segment ending
  *    at or below the watermark can never grow again (future interval
  *    starts exceed the watermark — that is the watermark contract),
  *    so its length flushes into the counter and the segment drops.
  *  - max concurrency: a flushed running max plus the open interval
  *    ends above the watermark (the sweep's carry set); ends at or
  *    below the watermark can never overlap a future start and drop.
  *
  * Each trigger emits the OPTIMISTIC value — durable state plus the
  * still-pending suffix folded on a scratch copy — so the emission
  * always equals the batch answer over every event seen so far and is
  * monotone non-decreasing; downstream takes the max per key
  * (StreamingSpec pins parity against the batch operators through a
  * MemoryStream delivery in slices). Arrivals at or below the
  * watermark violate the declared disorder bound and are dropped, the
  * same contract as [[FunnelStream]].
  */
object StreamingIntervals {

  final case class IEvent(k: Long, ts: java.sql.Timestamp, end_ms: Long)
  final case class LenState(flushedMs: Long, segments: Seq[(Long, Long)],
      pending: Seq[(Long, Long)])
  final case class MaxState(flushedMax: Long, openEnds: Seq[Long],
      pending: Seq[(Long, Long)])
  final case class IntervalUpdate(k: Long, value: Long)

  /** Sweep sorted-by-start intervals against the carried open-end
    * multiset; returns (max concurrency seen, open ends after) —
    * half-open, so an end AT a start closes first.
    */
  private def sweepOpens(openEnds: Seq[Long],
      ivs: Seq[(Long, Long)]): (Long, Seq[Long]) = {
    val heap = scala.collection.mutable.PriorityQueue.empty[Long](
      Ordering[Long].reverse) // min-heap of ends
    openEnds.foreach(heap.enqueue(_))
    var mx = heap.size.toLong // carried opens were concurrent at entry
    ivs.foreach { case (s, e) =>
      while (heap.nonEmpty && heap.head <= s) heap.dequeue()
      heap.enqueue(e)
      if (heap.size > mx) mx = heap.size
    }
    (mx, heap.dequeueAll.toSeq)
  }

  /** Merge sorted-by-start intervals into a disjoint segment list
    * seeded with `segments` (disjoint, sorted). Pure sweep — the same
    * max-prior-end argument as the batch operator.
    */
  private def mergeInto(segments: Seq[(Long, Long)],
      ivs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val all = (segments ++ ivs).sortBy(x => (x._1, x._2))
    if (all.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var (cs, ce) = all.head
    all.tail.foreach { case (s, e) =>
      if (s <= ce) { if (e > ce) ce = e } // half-open: touch at ce merges
      else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.toSeq
  }

  /** Streaming union-of-intervals length per key: intervals are
    * `[event-time, end_ms)`; emits the covered-ms-so-far per trigger.
    */
  def streamingIntervalLengthSum(events: DataFrame, keyCol: String,
      tsCol: String, endMsCol: String): Dataset[IntervalUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(endMsCol).cast("long").as("end_ms"))
      .as[IEvent]
      .groupByKey(_.k)
      .mapGroupsWithState[LenState, IntervalUpdate](
        GroupStateTimeout.NoTimeout) { (k, it, state) =>
        val st = state.getOption.getOrElse(LenState(0L, Seq.empty, Seq.empty))
        val wm = state.getCurrentWatermarkMs()
        val arrivals = it.map(e => (e.ts.getTime, e.end_ms))
          .filter(x => x._2 > x._1) // zero-length: no coverage
          .filter(_._1 > wm)        // late beyond disorder bound: drop
          .toSeq
        val all = (st.pending ++ arrivals).sortBy(x => (x._1, x._2))
        val (ripe, pend) = all.partition(_._1 <= wm)
        val merged = mergeInto(st.segments, ripe)
        // segments ending at/below the watermark are final: flush
        val (done, live) = merged.partition(_._2 <= wm)
        val flushed = st.flushedMs + done.map(x => x._2 - x._1).sum
        state.update(LenState(flushed, live, pend))
        val optimistic = flushed +
          mergeInto(live, pend).map(x => x._2 - x._1).sum
        IntervalUpdate(k, optimistic)
      }
  }

  /** Production wiring: EVENT-TIME EVICTION for the union-length
    * sweep. Once a key's frontier has fully drained (every coverage
    * segment flushed below the watermark, no pending events), no
    * FUTURE interval can touch what was already counted — future
    * starts exceed the watermark, which exceeds every flushed end —
    * so the accumulated counter is an EPOCH-final value: the timer
    * emits it and REMOVES the state. A returning key opens a fresh
    * epoch whose coverage is provably disjoint from every emitted
    * epoch, so downstream takes the SUM of finals per key (exact, not
    * a trade-off). State is O(keys with live coverage), not O(keys
    * ever). Only finals are emitted (Append mode): optimistic
    * per-trigger rows would double-count under the SUM contract —
    * the NoTimeout variant above is the monotone-emission form.
    */
  def streamingIntervalLengthSumEvicting(events: DataFrame, keyCol: String,
      tsCol: String, endMsCol: String): Dataset[IntervalUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(endMsCol).cast("long").as("end_ms"))
      .as[IEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState[LenState, IntervalUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k, it, state) =>
        if (state.hasTimedOut) {
          // the timer ripens only past every live end and pending
          // event (armed at horizon+1), but the watermark may have
          // advanced via OTHER keys with no final fold here — so fold
          // the leftover frontier before emitting the epoch total
          val st = state.get
          val total = st.flushedMs +
            mergeInto(st.segments, st.pending.sortBy(x => (x._1, x._2)))
              .map(x => x._2 - x._1).sum
          state.remove()
          Iterator.single(IntervalUpdate(k, total))
        } else {
          val st = state.getOption.getOrElse(LenState(0L, Seq.empty, Seq.empty))
          val wm = state.getCurrentWatermarkMs()
          val arrivals = it.map(e => (e.ts.getTime, e.end_ms))
            .filter(x => x._2 > x._1)
            .filter(_._1 > wm)
            .toSeq
          val all = (st.pending ++ arrivals).sortBy(x => (x._1, x._2))
          val (ripe, pend) = all.partition(_._1 <= wm)
          val merged = mergeInto(st.segments, ripe)
          val (done, live) = merged.partition(_._2 <= wm)
          val flushed = st.flushedMs + done.map(x => x._2 - x._1).sum
          state.update(LenState(flushed, live, pend))
          // the epoch is final once the watermark clears every live
          // end and the buffer has drained; clamp ahead of the
          // watermark (timers at or behind it are rejected)
          val horizon = (live.map(_._2) ++ pend.map(_._2)).foldLeft(wm)(math.max)
          state.setTimeoutTimestamp(math.max(horizon, wm) + 1)
          Iterator.empty
        }
      }
  }

  /** EVENT-TIME EVICTION for max concurrency: same epoch argument —
    * once every open end is below the watermark, no future interval
    * can overlap anything counted, the running max is epoch-final,
    * and max-of-finals downstream equals the global max (concurrency
    * never spans an idle gap). Emits finals only.
    */
  def streamingMaxIntersectionsEvicting(events: DataFrame, keyCol: String,
      tsCol: String, endMsCol: String): Dataset[IntervalUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(endMsCol).cast("long").as("end_ms"))
      .as[IEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState[MaxState, IntervalUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k, it, state) =>
        if (state.hasTimedOut) {
          // fold the leftover frontier (see the length-sum variant)
          val st = state.get
          val (mx, _) = sweepOpens(st.openEnds,
            st.pending.sortBy(x => (x._1, x._2)))
          state.remove()
          Iterator.single(IntervalUpdate(k, math.max(st.flushedMax, mx)))
        } else {
          val st = state.getOption.getOrElse(MaxState(0L, Seq.empty, Seq.empty))
          val wm = state.getCurrentWatermarkMs()
          val arrivals = it.map(e => (e.ts.getTime, e.end_ms))
            .filter(x => x._2 > x._1) // zero/negative length: no peak
            .filter(_._1 > wm)
            .toSeq
          val all = (st.pending ++ arrivals).sortBy(x => (x._1, x._2))
          val (ripe, pend) = all.partition(_._1 <= wm)
          val (mx1, opens) = sweepOpens(st.openEnds, ripe)
          val flushedMax = math.max(st.flushedMax, mx1)
          val live = opens.filter(_ > wm)
          state.update(MaxState(flushedMax, live, pend))
          val horizon = (live ++ pend.map(_._2)).foldLeft(wm)(math.max)
          state.setTimeoutTimestamp(math.max(horizon, wm) + 1)
          Iterator.empty
        }
      }
  }

  /** Streaming max simultaneously-open intervals per key; emits the
    * max-concurrency-so-far per trigger. Zero/negative-length
    * arrivals are dropped: a `[t, t)` interval's delta pair cancels
    * before any open in the batch sweep's (t, d) order, so its peak
    * contribution there is 0 — dropping is exact, not an
    * approximation (and e < s is malformed input).
    */
  def streamingMaxIntersections(events: DataFrame, keyCol: String,
      tsCol: String, endMsCol: String): Dataset[IntervalUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(endMsCol).cast("long").as("end_ms"))
      .as[IEvent]
      .groupByKey(_.k)
      .mapGroupsWithState[MaxState, IntervalUpdate](
        GroupStateTimeout.NoTimeout) { (k, it, state) =>
        val st = state.getOption.getOrElse(MaxState(0L, Seq.empty, Seq.empty))
        val wm = state.getCurrentWatermarkMs()
        val arrivals = it.map(e => (e.ts.getTime, e.end_ms))
          .filter(x => x._2 > x._1) // zero/negative length: no peak
          .filter(_._1 > wm)
          .toSeq
        val all = (st.pending ++ arrivals).sortBy(x => (x._1, x._2))
        val (ripe, pend) = all.partition(_._1 <= wm)
        val (mx1, opens) = sweepOpens(st.openEnds, ripe)
        val flushedMax = math.max(st.flushedMax, mx1)
        // ends at/below the watermark can never overlap a future start
        val live = opens.filter(_ > wm)
        state.update(MaxState(flushedMax, live, pend))
        val (mx2, _) = sweepOpens(live, pend) // optimistic: all seen so far
        IntervalUpdate(k, math.max(flushedMax, mx2))
      }
  }
}
