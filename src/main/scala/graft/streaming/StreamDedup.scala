package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication — the exact-dedup operator (q30 semantics)
  * as an incremental stream stage, the front door of a streaming
  * ingestion pipeline (dedup before load, not after).
  *
  * Two state disciplines:
  *
  *  - [[dedupUnbounded]]: `dropDuplicates` on the stream — state keeps
  *    every key EVER seen. Correct for bounded replay/backfill runs;
  *    unbounded state growth on a live stream.
  *  - [[dedupWithinWatermark]]: `dropDuplicatesWithinWatermark` —
  *    emits the first arrival per key and evicts a key's state once
  *    the watermark passes its event time + delay. State is
  *    O(keys inside the watermark window), the only shape that
  *    survives an unbounded 100 TB/day stream; the contract weakens to
  *    "no duplicates closer than the watermark delay", which is the
  *    standard at-least-once-source dedup guarantee (re-deliveries
  *    arrive within retry horizons, not days later).
  *
  * Stream==batch parity and the state-eviction bound are pinned in
  * StreamingSpec.
  */
object StreamDedup {

  /** First row per key, state unbounded (backfill/replay discipline). */
  def dedupUnbounded(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicates(keyCols)

  /** First row per key with watermark-bounded state. `events` must
    * carry a watermark (`withWatermark` upstream) — eviction is driven
    * by it.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicatesWithinWatermark(keyCols)
}
