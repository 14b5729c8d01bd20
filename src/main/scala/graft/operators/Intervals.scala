package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-algebra aggregates over (start, end] spans — the
  * `maxIntersections` / `intervalLengthSum` family of the reference
  * ecosystem's event analytics, re-expressed as window-function
  * sweep lines instead of in-memory sorted buffers.
  *
  * Both operators are one shuffle (the window's hash partition by
  * key) followed by a per-key SORTED SCAN with O(1) state — the
  * same shape as the funnel state machine (`Funnel.scala`): no
  * join fan-out, no per-key buffering beyond the sort Spark already
  * does for the window frame. At 100 TB the sort is the cost, and it
  * is the unavoidable one (both semantics are order-defined); a key
  * whose interval count exceeds a single task's sort budget would be
  * handled by time-range pre-partitioning with boundary-count
  * correction (each range sweep seeds its counter with the number of
  * intervals opened before the range start — one broadcast-able
  * per-range prefix aggregate), which preserves exactness; not
  * needed at gate scale, documented as the scale path.
  *
  * Intervals are HALF-OPEN `[start, end)` in integer epoch-ms: an
  * interval ending at t does not intersect one starting at t. The
  * sweep encodes that by sorting deltas `(t, d)` ascending with
  * d = −1 (close) before d = +1 (open) at equal t — exact integer
  * arithmetic end to end, no float comparisons.
  */
object Intervals {

  /** Max number of simultaneously open intervals per key, with the
    * count of intervals swept. The RANGE-framed running sum counts
    * all peers at the same (t, d) point, so two intervals opening on
    * the same millisecond both see each other — concurrency at an
    * instant is well-defined regardless of tie order.
    */
  def maxIntersections(
      df: DataFrame, key: Column, startMs: Column, endMs: Column): DataFrame = {
    val opens  = df.select(key.as("k"), startMs.as("t"), lit(1L).as("d"))
    val closes = df.select(key.as("k"), endMs.as("t"), lit(-1L).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("d"))
    opens.unionAll(closes)
      .withColumn("open_now", sum(col("d")).over(w))
      .groupBy(col("k"))
      .agg(max(col("open_now")).as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
  }

  /** The scale path for [[maxIntersections]]: a per-key sweep is
    * inherently sequential, so a key with billions of intervals
    * serializes into one task's sort. This variant pre-partitions the
    * TIME AXIS into `nRanges` fixed-width ranges and runs the sweep
    * per (key, range) — parallelism key×nRanges — then corrects each
    * range's counter with the number of intervals still open at its
    * start: the running sum at any point in range r equals
    * `(Σ delta of prior ranges) + local running sum`, because delta
    * points partition exactly by range. The prior-range prefix is a
    * window over the per-(key, range) TOTALS — nRanges tiny rows per
    * key — so the correction costs nothing at any scale. Exact for
    * any partition width (boundary points land in one range by
    * floor), proven output-identical to the direct sweep by the gate
    * sharing its oracle and by IntervalSpec's randomized equality.
    *
    * One extra 1-row aggregate derives the global [min, max] span
    * (broadcast, the θ-seed pattern); the heavy exchange remains a
    * single hash partition by (key, range).
    */
  def maxIntersectionsScaled(
      df: DataFrame, key: Column, startMs: Column, endMs: Column,
      nRanges: Int, collapseDups: Boolean = false): DataFrame = {
    val opens  = df.select(key.as("k"), startMs.as("t"), lit(1L).as("d"))
    val closes = df.select(key.as("k"), endMs.as("t"), lit(-1L).as("d"))
    val pts = opens.unionAll(closes)
    val span = pts.agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val withRange = pts.crossJoin(broadcast(span))
      .withColumn("rw",
        greatest(lit(1L), ceil((col("t1") - col("t0") + 1).cast("double") / nRanges).cast("long")))
      .withColumn("rid", ((col("t") - col("t0")) / col("rw")).cast("long"))
    // Pathological-skew path: range pre-partition parallelizes a hot
    // key across the TIME axis, but a key piling millions of rows on
    // few DISTINCT instants still serializes one range's sort.
    // Collapsing deltas to one NET row per (k, rid, t) fixes that
    // map-side (hash partial aggregate before the exchange, so the
    // hot instant's rows never travel). Output-identical: the RANGE-
    // framed running sum at instant t already includes every peer at
    // (t, d), so the per-instant NET running sum equals the tie-
    // ordered sweep's post-instant value, and the intermediate
    // closes-only value it drops is ≤ the previous instant's value
    // (or ≤ 0 at a range's first instant, matching net there) — never
    // the max. IntervalSpec pins equality on a duplicate-heavy set.
    val sweepIn =
      if (!collapseDups) withRange
      else withRange.groupBy(col("k"), col("rid"), col("t"))
        .agg(sum(col("d")).as("d"),
          sum(when(col("d") === 1L, 1L).otherwise(0L)).as("opens"))
    val w1 = Window.partitionBy(col("k"), col("rid")).orderBy(col("t"), col("d"))
    val perRange = sweepIn
      .withColumn("open_now", sum(col("d")).over(w1))
      .groupBy(col("k"), col("rid"))
      .agg(max(col("open_now")).as("local_max"),
        sum(col("d")).as("total_delta"),
        (if (collapseDups) sum(col("opens"))
         else sum(when(col("d") === 1L, 1L).otherwise(0L))).as("n_opens"))
    val w2 = Window.partitionBy(col("k")).orderBy(col("rid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perRange
      .withColumn("carry", coalesce(sum(col("total_delta")).over(w2), lit(0L)))
      .groupBy(col("k"))
      .agg(max(col("local_max") + col("carry")).as("max_concurrent"),
        sum(col("n_opens")).as("n_intervals"))
  }

  /** The scale path for [[intervalLengthSum]]: union length
    * decomposes EXACTLY over any partition of the time axis
    * (`|U ∩ [a,b)|` summed over disjoint `[a,b)` covering the axis),
    * so each interval is CLIPPED to the ranges it overlaps and the
    * per-(key, range) sweeps run independently — parallelism
    * key×nRanges, no cross-range carry needed at all (unlike the
    * counter in [[maxIntersectionsScaled]]). Fan-out is bounded by
    * nRanges per interval (a span-everything interval becomes
    * nRanges clips); with nRanges ~ number of cores that is noise
    * beside the shuffle it parallelizes. Gate shares the plain
    * sweep's oracle = output-identity proof.
    */
  def intervalLengthSumScaled(
      df: DataFrame, key: Column, startMs: Column, endMs: Column,
      nRanges: Int, withStats: Boolean = false,
      collapseDups: Boolean = false): DataFrame = {
    // Pathological-skew path (mirrors maxIntersectionsScaled): a hot
    // key replaying one identical interval millions of times defeats
    // range clipping (every copy clips to the same ranges). Union
    // coverage counts duplicates ONCE, so collapse to unique
    // (k, s, e) with a multiplicity — the hash partial aggregate
    // crushes the copies map-side — sweep unique intervals, and
    // weight n_intervals by the multiplicity. Duplicates contributed
    // 0 to the sweep before (prev_max_e ≥ their ce), so covered_ms
    // and span are untouched: output-identical, IntervalSpec-pinned.
    val raw = df.select(key.as("k"), startMs.as("s"), endMs.as("e"))
    val all =
      if (!collapseDups) raw.withColumn("n", lit(1L))
      else raw.groupBy(col("k"), col("s"), col("e"))
        .agg(count(lit(1)).as("n"))
    // span over ALL rows (not just positive-length ones): a null t0
    // from an empty filtered frame would null the range arithmetic
    // and silently drop every row
    val span = all.agg(min(col("s")).as("t0"),
      max(greatest(col("e"), col("s"))).as("t1"))
    // zero-length intervals clip to their first range alone (the
    // greatest() clamp guards the backwards sequence) and contribute
    // 0 coverage there — but still count once and stretch the span,
    // exactly like the plain sweep, WITHOUT a second source scan: the
    // r11 sf10 run measured the join-with-a-stats-scan variant at
    // 19.5 s vs 3.1 s for the bare clipped sweep
    val clipped = all.crossJoin(broadcast(span))
      .withColumn("rw",
        greatest(lit(1L), ceil((col("t1") - col("t0")).cast("double") / nRanges).cast("long")))
      .withColumn("rid0", ((col("s") - col("t0")) / col("rw")).cast("long"))
      .withColumn("rid",
        explode(sequence(col("rid0"),
          greatest(col("rid0"),
            ((col("e") - 1 - col("t0")) / col("rw")).cast("long")))))
      .withColumn("cs", greatest(col("s"), col("t0") + col("rid") * col("rw")))
      .withColumn("ce",
        least(col("e"), col("t0") + (col("rid") + 1) * col("rw")))
    val w = Window.partitionBy(col("k"), col("rid"))
      .orderBy(col("cs"), col("ce"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val swept = clipped
      .withColumn("prev_max_e", max(col("ce")).over(w))
      .withColumn("contrib",
        greatest(lit(0L), col("ce") -
          greatest(col("cs"), coalesce(col("prev_max_e"), col("cs")))))
    if (!withStats)
      swept.groupBy(col("k")).agg(sum(col("contrib")).as("covered_ms"))
    else
      // count each original interval once (its first clip), span from
      // the retained original bounds (duplication-invariant max/min)
      swept.groupBy(col("k")).agg(
        sum(col("contrib")).as("covered_ms"),
        sum(when(col("rid") === col("rid0"), col("n")).otherwise(0L))
          .as("n_intervals"),
        (max(col("e")) - min(col("s"))).as("span_ms"))
  }

  /** Total length of the UNION of each key's intervals (overlaps
    * counted once), in ms. Sorted by start, the coverage of all
    * prior intervals above the current start is exactly
    * `[start, max prior end)` — every prior interval starts at or
    * before the current one, so its part above `start` is a prefix-
    * anchored interval and the union of those is one interval. The
    * per-row contribution `max(0, end − max(start, maxPrevEnd))` is
    * therefore exact, and its SUM is tie-order invariant even though
    * individual contributions under equal starts are not (the spec
    * pins a tie case both ways).
    */
  def intervalLengthSum(
      df: DataFrame, key: Column, startMs: Column, endMs: Column,
      tieBreak: Column): DataFrame = {
    val base = df.select(key.as("k"), startMs.as("s"), endMs.as("e"),
      tieBreak.as("tb"))
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"), col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prev_max_e", max(col("e")).over(w))
      .withColumn("contrib",
        greatest(lit(0L), col("e") -
          greatest(col("s"), coalesce(col("prev_max_e"), col("s")))))
      .groupBy(col("k"))
      .agg(sum(col("contrib")).as("covered_ms"),
        count(lit(1)).as("n_intervals"),
        (max(col("e")) - min(col("s"))).as("span_ms"))
  }
}
