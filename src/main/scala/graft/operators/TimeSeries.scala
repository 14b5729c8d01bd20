package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-series time-series operators in the ClickHouse style:
  * `exponentialTimeDecayedSum/Count/Avg` (a decayed value AT EVERY
  * ROW, not one aggregate per group) and largest-triangle-three-
  * buckets downsampling (`lttb`).
  *
  * Both run as the funnel family's one-shuffle shape (Funnel.scala):
  * repartition on the series key, secondary-sort by (key, time, id),
  * then a single streaming pass per series. No joins, no window-
  * function state larger than the series scan itself, so the plan is
  * the same at 100 TB — one exchange keyed by series, after which
  * every series streams through one task (Spark's external sort
  * spills, so a hot series of any size still streams).
  */
object TimeSeries {

  /** Exponential time decay at every event: processing a series in
    * time order,
    *
    *   sum_i = v_i + sum_{i-1} · exp(−(t_i − t_{i-1})/τ)
    *   cnt_i = 1  + cnt_{i-1} · exp(−(t_i − t_{i-1})/τ)
    *
    * so `sum_i = Σ_{j≤i} v_j·exp(−(t_i−t_j)/τ)` and `avg = sum/cnt`
    * is the decay-weighted mean of the series so far — the
    * `exponentialTimeDecayedSum/Count/Avg` semantics. The recurrence
    * form is O(1) state per series and never materializes the
    * exploding `exp(t/τ)` rescaled prefix sums (the closed form a
    * window-function encoding would need overflows `double` once a
    * series spans ≳ 700·τ).
    *
    * Rows sharing a timestamp are processed in `idCol` order and each
    * sees the state INCLUDING earlier ties (Δ = 0 ⇒ factor 1), making
    * every output row deterministic for a fixed input set.
    *
    * Output: (key, id, tms, value, decayed_sum, decayed_cnt) — one row
    * per input event.
    */
  def timeDecayed(events: DataFrame, keyCol: String, tmsCol: String,
      idCol: String, valCol: String, tauMs: Double): DataFrame = {
    require(tauMs > 0, "tau must be positive")
    val ev = events
      .select(col(keyCol).cast("long").as("key"),
        col(tmsCol).cast("long").as("tms"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tms"), col("id"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("tms", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("decayed_sum", DoubleType, nullable = false),
      StructField("decayed_cnt", DoubleType, nullable = false)))
    ev.mapPartitions { it0 =>
      val it = it0.buffered
      new Iterator[Row] {
        private var curKey = 0L
        private var haveKey = false
        private var prevT = 0L
        private var dsum = 0.0
        private var dcnt = 0.0
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val r = it.next()
          val k = r.getLong(0); val t = r.getLong(1)
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; prevT = t; dsum = 0.0; dcnt = 0.0
          }
          val f = math.exp((prevT - t) / tauMs) // t >= prevT by sort
          dsum = r.getDouble(3) + dsum * f
          dcnt = 1.0 + dcnt * f
          prevT = t
          Row(k, r.getLong(2), t, r.getDouble(3), dsum, dcnt)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    * "Downsampling Time Series for Visual Representation", public
    * thesis algorithm) per series: keep the first and last points,
    * split the interior into `threshold − 2` equal-count buckets, and
    * from each bucket keep the point maximizing the triangle area
    * formed with the PREVIOUSLY selected point and the NEXT bucket's
    * centroid (the last bucket pairs with the final point). Ties on
    * area break to the earliest (tms, id) — every selected point is
    * deterministic for a fixed series.
    *
    * A series is buffered in its task (bucket boundaries need the
    * series length), which is inherent to LTTB — the per-series
    * memory is the series itself, the same bound ClickHouse's
    * `lttb` carries. Series stream one at a time, so the task high-
    * water mark is the largest single series, not the partition.
    *
    * Output: (key, id, tms, value, sel_idx) — `sel_idx` is the 0-based
    * output position within the series (0 = first point), so
    * `max(sel_idx)+1 = min(threshold, n)` per series.
    */
  def lttb(events: DataFrame, keyCol: String, tmsCol: String,
      idCol: String, valCol: String, threshold: Int): DataFrame = {
    require(threshold >= 3, "threshold >= 3 (first + last + 1 bucket)")
    val ev = events
      .select(col(keyCol).cast("long").as("key"),
        col(tmsCol).cast("long").as("tms"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tms"), col("id"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("tms", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("sel_idx", LongType, nullable = false)))
    ev.mapPartitions { it0 =>
      val it = it0.buffered
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = out.hasNext || it.hasNext
        def next(): Row = {
          if (!out.hasNext) {
            // buffer exactly one series
            val key = it.head.getLong(0)
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            while (it.hasNext && it.head.getLong(0) == key) {
              val r = it.next()
              buf += ((r.getLong(1), r.getLong(2), r.getDouble(3)))
            }
            out = selectLttb(buf.toIndexedSeq, threshold).zipWithIndex.iterator
              .map { case ((t, id, v), si) => Row(key, id, t, v, si.toLong) }
          }
          out.next()
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Audit twin of [[timeDecayed]]: the SAME quantity by genuinely
    * different arithmetic — per row a direct backward summation
    * `Σ_j v_j·exp(−(t_i−t_j)/τ)` with an early exit once the factor
    * underflows 1e-18 (no accumulated recurrence state), executed via
    * `groupByKey`+`flatMapGroups` (a different physical path than the
    * operator's series-streaming scan). Also emits the running
    * min/max/row-number the gate's bound checks need. O(n·w) per
    * series where w is the effective decay window — an audit cost,
    * not a production path.
    */
  def timeDecayedClosedForm(events: DataFrame, keyCol: String, tmsCol: String,
      idCol: String, valCol: String, tauMs: Double): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("key"),
        col(tmsCol).cast("long").as("tms"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val s = rows.toArray.sortBy(r => (r._2, r._3))
        val out = new Array[(Long, Long, Double, Double, Double, Double, Long)](s.length)
        var rmin = Double.MaxValue
        var rmax = Double.MinValue
        var i = 0
        while (i < s.length) {
          val ti = s(i)._2
          var sum = 0.0
          var cnt = 0.0
          var j = i
          var live = true
          while (j >= 0 && live) {
            val f = math.exp((s(j)._2 - ti) / tauMs)
            if (f < 1e-18) live = false
            else { sum += s(j)._4 * f; cnt += f }
            j -= 1
          }
          if (s(i)._4 < rmin) rmin = s(i)._4
          if (s(i)._4 > rmax) rmax = s(i)._4
          out(i) = (key, s(i)._3, sum, cnt, rmin, rmax, i.toLong)
          i += 1
        }
        out.iterator
      }
      .toDF("key", "id", "ref_sum", "ref_cnt", "run_min", "run_max", "row_no")
  }

  /** Audit twin of [[lttb]]: the same selection via
    * `groupByKey`+`flatMapGroups` (buffer, sort, [[selectLttb]]) — a
    * different physical execution of the same reference algorithm, so
    * the gate catches any series-assembly/partitioning fault in the
    * streaming operator. Algorithmic independence is the spec's job
    * (TimeSeriesSpec pins [[selectLttb]] against a naive
    * re-derivation and hand-computed cases).
    */
  def lttbReference(events: DataFrame, keyCol: String, tmsCol: String,
      idCol: String, valCol: String, threshold: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("key"),
        col(tmsCol).cast("long").as("tms"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val s = rows.toArray.sortBy(r => (r._2, r._3))
          .map(r => (r._2, r._3, r._4)).toIndexedSeq
        selectLttb(s, threshold).zipWithIndex.iterator
          .map { case ((_, id, _), si) => (key, id, si.toLong) }
      }
      .toDF("key", "id", "sel_idx")
  }

  /** Core LTTB selection over one (tms, id, value) series, already
    * sorted by (tms, id). Exposed for the spec's independent
    * cross-check.
    */
  def selectLttb(s: IndexedSeq[(Long, Long, Double)],
      threshold: Int): IndexedSeq[(Long, Long, Double)] = {
    val n = s.length
    if (n <= threshold) return s
    val nb = threshold - 2 // interior buckets over s(1 .. n-2)
    val interior = n - 2
    // bucket b covers interior indices [lo(b), lo(b+1)) with equal
    // real-valued widths — the thesis construction
    def lo(b: Int): Int = 1 + math.floor(b.toDouble * interior / nb).toInt
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    sel += s(0)
    var prev = s(0)
    var b = 0
    while (b < nb) {
      val start = lo(b)
      val end = lo(b + 1) // exclusive
      // next anchor: centroid of the following bucket, or the last point
      val (cx, cy) =
        if (b == nb - 1) (s(n - 1)._1.toDouble, s(n - 1)._3)
        else {
          val ns = lo(b + 1); val ne = lo(b + 2)
          var sx = 0.0; var sy = 0.0
          var i = ns
          while (i < ne) { sx += s(i)._1.toDouble; sy += s(i)._3; i += 1 }
          (sx / (ne - ns), sy / (ne - ns))
        }
      var best = start
      var bestArea = -1.0
      var i = start
      while (i < end) {
        val area = math.abs(
          (prev._1.toDouble - cx) * (s(i)._3 - prev._3) -
            (prev._1.toDouble - s(i)._1.toDouble) * (cy - prev._3)) / 2.0
        if (area > bestArea) { bestArea = area; best = i } // strict > = earliest tie wins
        i += 1
      }
      sel += s(best)
      prev = s(best)
      b += 1
    }
    sel += s(n - 1)
    sel.toIndexedSeq
  }
}
