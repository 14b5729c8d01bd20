package graft.streaming

import graft.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream transforms, written once and applied to BOTH batch and
  * streaming inputs (Structured Streaming's unified Dataset API — the
  * same plan runs incrementally with watermark state or as a batch).
  * `StreamingSpec` drives these through `readStream` + memory sink and
  * asserts equality with the batch result; the driver's correctness
  * gate checks the batch semantics against DuckDB.
  */
object EventStream {

  /** Tumbling 1-hour window per event type: count + exact-decimal sum.
    * On a stream: append-mode with a 1-hour watermark bounds state.
    */
  def tumblingCounts(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Parity.sumD(col("value")).as("total"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total"))
  }

  /** Sliding 1-hour window with a 15-minute slide, per event type:
    * every event lands in exactly size/slide = 4 overlapping windows
    * (Spark's `window()` generator expands them map-side, epoch-
    * aligned). On a stream the same plan runs append-mode with the
    * watermark bounding open-window state at 4× the tumbling
    * footprint — the size/slide ratio.
    */
  def slidingCounts(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Parity.sumD(col("value")).as("total"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total"))
  }

  /** Stream-stream join: each click joined to same-user purchases in
    * the preceding hour. On streams, the watermarks + the time-range
    * predicate bound both join-state buffers (rows older than
    * click-watermark − 1h are evicted) — the property that keeps a
    * stream-stream join running indefinitely. Same code path works in
    * batch (the spec proves stream == batch).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      withWatermark: Boolean = false): DataFrame = {
    val c = (if (withWatermark) clicks.withWatermark("ts", "1 hour") else clicks)
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = (if (withWatermark) purchases.withWatermark("ts", "2 hours") else purchases)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"),
        unix_millis(col("click_ts")).as("click_ms"),
        unix_millis(col("purchase_ts")).as("purchase_ms"),
        col("purchase_value"))
  }

  /** Stream-static enrichment: each event joined to a STATIC dimension
    * row (customer → market segment), rolled up per (segment,
    * event_type). A stream-static equi-join keeps NO join state in
    * Structured Streaming — the static side is simply re-planned
    * (here: re-broadcast) per micro-batch — which is why enrichment
    * should join the dim table in-stream rather than denormalizing
    * facts upstream. The dim side is explicitly broadcast (small by
    * construction); unmatched users keep their rows as 'UNKNOWN'
    * (left join), so a lagging dim backfill never silently drops
    * fact rows.
    */
  def enrichedSegmentTotals(events: DataFrame, dims: DataFrame): DataFrame = {
    val seg = broadcast(dims.select(col("c_custkey").as("user_id"),
      col("c_mktsegment").as("segment")))
    events.join(seg, Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("UNKNOWN")))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Parity.sumD(col("value")).as("total"))
  }

  /** Gap-based sessionization (30-minute inactivity): classic
    * lag + cumulative-flag windows over per-user event time. The
    * streaming-native equivalent uses mapGroupsWithState (see
    * `Sessionize.streamingSessionize`); this declarative form is the
    * batch/backfill path and the oracle semantics.
    */
  def sessionize(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tms"), col("event_id"))
    val withGap = events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("tms"))
      .withColumn("prev", lag(col("tms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("tms") - col("prev") > gapMs, 1L).otherwise(0L))
    withGap
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tms")).as("start_ms"),
        (max(col("tms")) - min(col("tms"))).as("duration_ms"))
  }
}
