package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Event-sequence analytics in the ClickHouse style — the engine-side
  * equivalents of `windowFunnel` and `retention` (the reference's
  * target dialect; SURVEY.md §2.B kinship).
  *
  * `windowFunnel`/`sequenceMatch` run as a PER-USER SORTED SCAN (the
  * shape ClickHouse itself uses): one shuffle on the user key with a
  * secondary sort on time, then a streaming state machine of
  * O(n_stages) longs per user. The earlier per-stage user-keyed joins
  * were skew-unsafe — a bot user with 10⁵ events per stage produced
  * |stage-k| × |reachable| (10¹⁰) intermediate rows in one task; the
  * sorted scan is O(events·stages) per user with constant state, and
  * Spark's external sort spills, so a bot of any size streams through.
  */
object Funnel {

  /** Shared scan: filter to events matching ANY stage (a per-stage
    * bitmask column — non-matching events never shuffle), repartition
    * by user, sort within partitions by (user, time), and stream a
    * dominance state machine over each user's events:
    *
    *   - `state(k)` = the best witness that stage k+1 is reachable —
    *     the MAX anchor timestamp over all depth-(k+1) chains
    *     (anchored mode: extension needs `t ≤ anchor + bound`, larger
    *     anchors are strictly more permissive) or the MAX reachable
    *     stage-(k+1) event time (per-step mode: extension needs a
    *     predecessor in `[t − bound, t)`, and if the max recorded
    *     time is below `t − bound` every other one is too);
    *   - events sharing a timestamp are evaluated against the state
    *     BEFORE any of them is applied, so chains stay strictly
    *     increasing in time (equal timestamps never chain);
    *   - processing in time order guarantees every recorded chain's
    *     last event precedes the current one, so the max-witness
    *     dominance is exact, not a heuristic.
    */
  private def sortedDepthScan(events: DataFrame, userCol: String,
      tmsCol: String, stages: Seq[Column], boundMs: Long,
      anchored: Boolean, outCol: String): DataFrame = {
    val n = stages.length
    require(n >= 1 && n <= 62, "1..62 stage predicates")
    val mask = stages.zipWithIndex
      .map { case (c, i) => when(c, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _) // stage bits are disjoint: sum == bitwise-or
    val users = events.select(col(userCol).as("user_id")).distinct()
    val ev = events
      .select(col(userCol).as("user_id"),
        col(tmsCol).cast("long").as("tms"), mask.as("mask"))
      .filter(col("mask") =!= 0L)
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tms"))
    val outSchema = StructType(Seq(
      ev.schema.head, StructField(outCol, LongType, nullable = false)))
    val depths = ev.mapPartitions { it0 =>
      val it = it0.buffered
      new Iterator[Row] {
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val user = it.head.get(0)
          val state = Array.fill(n)(Long.MinValue)
          val upd = new Array[Long](n)
          while (it.hasNext && it.head.get(0) == user) {
            val t = it.head.getLong(1) // one strict-time tie group
            java.util.Arrays.fill(upd, Long.MinValue)
            while (it.hasNext && it.head.get(0) == user &&
                it.head.getLong(1) == t) {
              val m = it.next().getLong(2)
              var k = 0
              while (k < n) {
                if ((m & (1L << k)) != 0L) {
                  if (k == 0) { if (t > upd(0)) upd(0) = t }
                  else if (state(k - 1) != Long.MinValue &&
                      t <= state(k - 1) + boundMs) {
                    val witness = if (anchored) state(k - 1) else t
                    if (witness > upd(k)) upd(k) = witness
                  }
                }
                k += 1
              }
            }
            var k = 0
            while (k < n) { if (upd(k) > state(k)) state(k) = upd(k); k += 1 }
          }
          var depth = 0L
          var k = n - 1
          while (k >= 0 && depth == 0L) {
            if (state(k) != Long.MinValue) depth = k + 1L
            k -= 1
          }
          Row(user, depth)
        }
      }
    }(Encoders.row(outSchema))
    users.join(depths, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col(outCol), lit(0L)).as(outCol))
  }

  /** `windowFunnel`-style max funnel depth per user: the deepest `L`
    * such that events matching `stages(0..L-1)` occur at STRICTLY
    * increasing timestamps, all within `windowMs` of the stage-1
    * anchor event — the max over every possible anchor.
    *
    * Runs as the [[sortedDepthScan]] in anchored mode: `state(k)` is
    * the max anchor over depth-(k+1) chains, exact because a larger
    * anchor loosens the only constraint (`t ≤ anchor + window`) a
    * later extension must satisfy. All arithmetic is on BIGINT
    * epoch-millis — exact, and the oracle replays the same semantics
    * in plain SQL.
    *
    * @param events (userCol, tmsCol: epoch ms, …) event frame.
    * @param stages per-stage predicates over `events`' columns.
    * @return (user_id, funnel_level) for every distinct user, level 0
    *         when even stage 1 never fired.
    */
  def windowFunnel(events: DataFrame, userCol: String, tmsCol: String,
      stages: Seq[Column], windowMs: Long): DataFrame =
    sortedDepthScan(events, userCol, tmsCol, stages, windowMs,
      anchored = true, outCol = "funnel_level")

  /** `sequenceMatch`-style chaining with a PER-STEP gap bound: stage
    * k+1 must fire strictly after SOME reachable stage-k event and
    * within `gapMs` of it. Unlike [[windowFunnel]]'s stage-1-anchored
    * window, greedy earliest-next is WRONG here — minimizing t_k
    * tightens t_{k+1}'s upper bound, so a later stage-k event can
    * enable a chain the earliest one cannot. Correctness needs full
    * reachability, which the [[sortedDepthScan]] carries in per-step
    * mode: `state(k)` is the MAX reachable stage-(k+1) event time —
    * exact dominance, because an extension at time `t` needs a
    * reachable predecessor in `[t − gap, t)`, and if the max recorded
    * time misses that interval every smaller one does too.
    *
    * @return (user_id, match_depth): deepest stage any chain reaches,
    *         0 when stage 1 never fires.
    */
  def sequenceMatch(events: DataFrame, userCol: String, tmsCol: String,
      stages: Seq[Column], gapMs: Long): DataFrame =
    sortedDepthScan(events, userCol, tmsCol, stages, gapMs,
      anchored = false, outCol = "match_depth")

  /** `retention`-style cohort flags per user: `did(0)` is whether the
    * anchor condition ever fired; `did(i)` whether condition `i` fired
    * STRICTLY AFTER the user's first anchor event (our documented
    * ordering refinement — a retention step that precedes signup is
    * noise, not retention). One pass of conditional aggregates over
    * the anchor-joined frame; no per-user state.
    *
    * @return (user_id, r0, r1, …) boolean flags.
    */
  def retention(events: DataFrame, userCol: String, tmsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "need at least one condition")
    val anchor = events.filter(conds.head)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(col(tmsCol).cast("long")).as("t0"))
    val users = events.select(col(userCol).as("user_id")).distinct()
    val e = events.select(col(userCol).as("user_id") +:
      col(tmsCol).cast("long").as("tms") +:
      conds.zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
    val flags = e.join(anchor, Seq("user_id"), "left")
    val aggs = coalesce(max(col("c0")), lit(false)).as("r0") +:
      (1 until conds.length).map { i =>
        coalesce(max(col(s"c$i") && col("t0").isNotNull &&
          col("tms") > col("t0")), lit(false)).as(s"r$i")
      }
    users.join(flags, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
