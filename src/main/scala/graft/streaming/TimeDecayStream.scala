package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.timeDecayed]] —
  * exponentialTimeDecayedSum/Count/Avg at every event, incrementally:
  * per-key state is just (last event time, decayed sum, decayed
  * count), and each event folds in as
  * `sum' = v + sum·exp(−Δ/τ)` — O(1) state per key, O(1) work per
  * event, the recurrence the batch operator runs, so in-order
  * delivery gives EXACT (bit-identical) parity with the batch form
  * (pinned in StreamingSpec through multi-trigger state-store
  * round-trips).
  *
  * Late data: the STATE update is still correct for a late event
  * (`S(T) = Σ v_j·exp((t_j−T)/τ)` is order-free: adding
  * `v·exp((t−T)/τ)` with t < T folds it in exactly), but the late
  * row's own EMITTED value reflects arrival order, not event order —
  * the usual streaming contract (batch backfill is the order-exact
  * path).
  */
object TimeDecayStream {

  final case class Ev(key: Long, id: Long, tms: Long, value: Double)
  /** Evicting-path input: carries the watermarked timestamp column
    * (event-time timers need the watermark tag to survive grouping).
    */
  final case class EvT(key: Long, id: Long, ts: java.sql.Timestamp, value: Double)
  final case class DecayState(lastT: Long, dsum: Double, dcnt: Double)
  final case class DecayOut(key: Long, id: Long, tms: Long, value: Double,
      decayed_sum: Double, decayed_cnt: Double)

  /** Idle horizon (in τ units) after which state is evicted: a
    * surviving contribution is bounded by exp(−EvictTaus) ≈ 4e−18 of
    * its original weight — below double ulp relative to any
    * same-order sum, so for value ranges within ~100× of each other
    * eviction is value-invisible (the spec drives a gap past the
    * horizon and asserts EXACT batch parity). Streams whose decayed
    * sums span more than ~exp(EvictTaus)·ulp in magnitude trade that
    * last-ulp exactness for the state bound — the standard decay-
    * eviction contract.
    */
  val EvictTaus = 40.0

  private def fold(tauMs: Double, key: Long, sorted: Seq[Ev],
      st0: Option[DecayState]): (Seq[DecayOut], DecayState) = {
    var st = st0.getOrElse(DecayState(Long.MinValue, 0.0, 0.0))
    val out = Seq.newBuilder[DecayOut]
    sorted.foreach { e =>
      val f =
        if (st.lastT == Long.MinValue) 0.0
        else math.exp((st.lastT.toDouble - e.tms) / tauMs)
      val ds = e.value + st.dsum * f
      val dc = 1.0 + st.dcnt * f
      st = DecayState(e.tms, ds, dc)
      out += DecayOut(key, e.id, e.tms, e.value, ds, dc)
    }
    (out.result(), st)
  }

  def update(tauMs: Double)(key: Long, events: Iterator[Ev],
      state: GroupState[DecayState]): Iterator[DecayOut] = {
    val (out, st) = fold(tauMs, key,
      events.toSeq.sortBy(e => (e.tms, e.id)), state.getOption)
    state.update(st)
    out.iterator
  }

  /** Eviction variant: an event-time timer at `lastT + EvictTaus·τ`
    * removes the state of an idle key (no emission — decayed values
    * past the horizon are sub-ulp, see [[EvictTaus]]); any live event
    * re-arms it. State is then O(keys active within the horizon), the
    * bound a forever-stream needs.
    */
  def updateEvicting(tauMs: Double)(key: Long, events: Iterator[EvT],
      state: GroupState[DecayState]): Iterator[DecayOut] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val (out, st) = fold(tauMs, key,
        events.map(e => Ev(e.key, e.id, e.ts.getTime, e.value)).toSeq
          .sortBy(e => (e.tms, e.id)),
        state.getOption)
      state.update(st)
      val target = st.lastT + (EvictTaus * tauMs).toLong
      val armAt =
        try math.max(target, state.getCurrentWatermarkMs() + 1)
        catch { case _: UnsupportedOperationException => target }
      state.setTimeoutTimestamp(armAt)
      out.iterator
    }
  }

  def streamingTimeDecayed(spark: SparkSession, events: Dataset[Ev],
      tauMs: Double): Dataset[DecayOut] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update(tauMs) _)
  }

  /** Production wiring — the input must carry a watermark upstream of
    * the `as[EvT]` projection (event-time timers are watermark-driven).
    */
  def streamingTimeDecayedEvicting(spark: SparkSession, events: Dataset[EvT],
      tauMs: Double): Dataset[DecayOut] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateEvicting(tauMs) _)
  }
}
