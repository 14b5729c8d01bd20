package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming `windowFunnel` — the incremental twin of
  * [[graft.operators.Funnel.windowFunnel]], running the SAME
  * dominance state machine (max chain anchor per depth) under
  * `mapGroupsWithState`.
  *
  * Exactness under out-of-order arrival: events BUFFER in state until
  * the watermark passes them (the watermark IS the stream's declared
  * disorder bound); only the ripe, time-sorted prefix folds into the
  * durable DP state, equal timestamps applied as one tie-group
  * exactly like the batch scan. Each trigger ALSO emits an OPTIMISTIC
  * level — the durable anchors plus the still-pending suffix folded
  * on a scratch copy — so the emitted level is always the batch
  * answer over every event seen so far, and is monotone
  * non-decreasing across triggers (take the max per user downstream).
  * State per user = n_stages longs + the in-flight buffer, bounded by
  * watermark lag × per-user event rate.
  */
object FunnelStream {

  final case class FEvent(user_id: Long, ts: java.sql.Timestamp, mask: Long)
  final case class FunnelState(anchors: Seq[Long], pending: Seq[(Long, Long)])
  final case class FunnelUpdate(user_id: Long, funnel_level: Long)

  /** The batch scan's tie-grouped DP, folding time-sorted (tms, mask)
    * events into the max-anchor-per-depth array in place.
    */
  private def foldInto(anchors: Array[Long], evs: Seq[(Long, Long)],
      windowMs: Long): Unit =
    foldMode(anchors, evs, windowMs, anchored = true)

  /** Shared tie-grouped DP: anchored mode carries the max chain
    * anchor per depth (windowFunnel); per-step mode carries the max
    * reachable event time per depth (sequenceMatch) — the same two
    * witnesses the batch `sortedDepthScan` keeps.
    */
  private def foldMode(anchors: Array[Long], evs: Seq[(Long, Long)],
      boundMs: Long, anchored: Boolean): Unit = {
    val n = anchors.length
    val upd = new Array[Long](n)
    var i = 0
    while (i < evs.length) {
      val t = evs(i)._1
      java.util.Arrays.fill(upd, Long.MinValue)
      var j = i
      while (j < evs.length && evs(j)._1 == t) {
        val m = evs(j)._2
        var k = 0
        while (k < n) {
          if ((m & (1L << k)) != 0L) {
            if (k == 0) { if (t > upd(0)) upd(0) = t }
            else if (anchors(k - 1) != Long.MinValue &&
                t <= anchors(k - 1) + boundMs) {
              val witness = if (anchored) anchors(k - 1) else t
              if (witness > upd(k)) upd(k) = witness
            }
          }
          k += 1
        }
        j += 1
      }
      var k = 0
      while (k < n) { if (upd(k) > anchors(k)) anchors(k) = upd(k); k += 1 }
      i = j
    }
  }

  private def depth(anchors: Array[Long]): Long = {
    var k = anchors.length - 1
    while (k >= 0) {
      if (anchors(k) != Long.MinValue) return k + 1L
      k -= 1
    }
    0L
  }

  def streamingWindowFunnel(events: DataFrame, userCol: String,
      tsCol: String, stages: Seq[Column],
      windowMs: Long): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stages.length
    require(n >= 1 && n <= 62, "1..62 stage predicates")
    val mask = stages.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    val ev = events.select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"), mask.as("mask"))
      .filter(col("mask") =!= 0L)
      .as[FEvent]
    ev.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout)(mkUpdate(n, windowMs, anchored = true))
  }

  /** Streaming `sequenceMatch` — the per-step-gap twin
    * ([[graft.operators.Funnel.sequenceMatch]] semantics): the same
    * watermark-buffered fold with the per-step witness (max reachable
    * stage time) instead of the chain anchor. Emissions are the
    * monotone `match_depth`; max per user equals the batch answer.
    */
  def streamingSequenceMatch(events: DataFrame, userCol: String,
      tsCol: String, stages: Seq[Column],
      gapMs: Long): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stages.length
    require(n >= 1 && n <= 62, "1..62 stage predicates")
    val mask = stages.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    val ev = events.select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"), mask.as("mask"))
      .filter(col("mask") =!= 0L)
      .as[FEvent]
    ev.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout)(mkUpdate(n, gapMs, anchored = false))
  }

  /** Production wiring: EVENT-TIME EVICTION. A chain anchored at `a`
    * can only extend with events `≤ a + windowMs`; once the watermark
    * passes `maxAnchor + windowMs` (and the pending buffer is empty)
    * NO future event can deepen this user's funnel — the state is
    * provably final, so the timer emits the final level and REMOVES
    * it. A returning user restarts a fresh DP, whose chains need a
    * fresh stage-1 anchor anyway — downstream takes the max per user
    * (emissions stay monotone), so eviction is EXACT, not a trade-off.
    * State size is O(users with a live window), not O(users ever).
    */
  def streamingWindowFunnelEvicting(events: DataFrame, userCol: String,
      tsCol: String, stages: Seq[Column],
      windowMs: Long): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stages.length
    require(n >= 1 && n <= 62, "1..62 stage predicates")
    val mask = stages.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    val ev = events.select(col(userCol).cast("long").as("user_id"),
        col(tsCol).as("ts"), mask.as("mask"))
      .filter(col("mask") =!= 0L)
      .as[FEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        mkEvictingUpdate(n, windowMs))
  }

  private def mkEvictingUpdate(n: Int, windowMs: Long): (Long,
      Iterator[FEvent], GroupState[FunnelState]) => Iterator[FunnelUpdate] =
    (user, it, state) => {
      if (state.hasTimedOut) {
        val anchors = state.get.anchors.toArray
        state.remove()
        Iterator.single(FunnelUpdate(user, depth(anchors)))
      } else {
        val upd = mkUpdate(n, windowMs, anchored = true)(user, it, state)
        state.getOption.foreach { st =>
          val maxAnchor = st.anchors.max
          val lastPending =
            if (st.pending.isEmpty) Long.MinValue else st.pending.map(_._1).max
          // final once the watermark clears every live window AND the
          // buffer has drained; clamp ahead of the watermark (Spark
          // rejects timers at or behind it)
          val target = math.max(
            if (maxAnchor == Long.MinValue) Long.MinValue else maxAnchor + windowMs,
            lastPending) + 1
          val armAt =
            try math.max(target, state.getCurrentWatermarkMs() + 1)
            catch { case _: UnsupportedOperationException => target }
          state.setTimeoutTimestamp(armAt)
        }
        Iterator.single(upd)
      }
    }

  /** Built OUTSIDE the plan-assembly scope so the task closure
    * captures only the two primitives, not DataFrames/Columns.
    */
  private def mkUpdate(n: Int, boundMs: Long, anchored: Boolean): (Long,
      Iterator[FEvent], GroupState[FunnelState]) => FunnelUpdate =
    (user, it, state) => {
      val st = state.getOption.getOrElse(
        FunnelState(Seq.fill(n)(Long.MinValue), Seq.empty))
      val wm = state.getCurrentWatermarkMs()
      // an arrival at or below the current watermark violates the
      // stream's declared disorder bound: DROP it (the standard
      // watermark contract — folding it would break the DP's
      // time-order invariant and could invent chains)
      val all = (st.pending ++
          it.map(e => (e.ts.getTime, e.mask)).filter(_._1 > wm))
        .sortBy(_._1)
      val (ripe, pend) = all.partition(_._1 <= wm)
      val anchors = st.anchors.toArray
      foldMode(anchors, ripe, boundMs, anchored)
      state.update(FunnelState(anchors.toSeq, pend))
      val scratch = anchors.clone()
      foldMode(scratch, pend, boundMs, anchored) // optimistic: all seen so far
      FunnelUpdate(user, depth(scratch))
    }
}
