package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random series: splitmix-ish arithmetic on the
  // index (no Random — reproducible across runs by construction)
  private def synth(nKeys: Int, perKey: Int): Seq[(Long, Long, Long, Double)] =
    for {
      k <- 0 until nKeys
      i <- 0 until perKey
    } yield {
      val h = (k * 1000003L + i * 2654435761L) & 0x7FFFFFFFL
      val tms = 1000000L + i * 60000L + (h % 45000L) // rising, jittered
      val v = 1.0 + (h % 1000L) / 100.0
      (k.toLong, tms, (k * perKey + i).toLong, v)
    }

  private def df(rows: Seq[(Long, Long, Long, Double)], parts: Int = 4) =
    rows.toDF("user_id", "tms", "event_id", "value").repartition(parts)

  test("timeDecayed recurrence equals a naive closed-form (independent) computation") {
    val tau = 120000.0
    val rows = synth(5, 200)
    val got = TimeSeries.timeDecayed(df(rows), "user_id", "tms", "event_id", "value", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    // naive O(n^2) reference computed in plain Scala, full summation
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(r => (r._2, r._3))
      s.indices.foreach { i =>
        val sum = (0 to i).map(j => s(j)._4 * math.exp((s(j)._2 - s(i)._2) / tau)).sum
        val cnt = (0 to i).map(j => math.exp((s(j)._2 - s(i)._2) / tau)).sum
        val (gs, gc) = got((s(i)._1, s(i)._3))
        assert(math.abs(gs - sum) <= 1e-9 * math.max(1.0, math.abs(sum)),
          s"sum at ${s(i)._3}: $gs vs $sum")
        assert(math.abs(gc - cnt) <= 1e-9 * math.max(1.0, cnt))
      }
    }
  }

  test("timeDecayed is partitioning-invariant and ties accumulate in id order") {
    val tau = 60000.0
    // 3 rows share one timestamp: later ids must include earlier ties
    val rows = Seq(
      (1L, 1000L, 1L, 10.0), (1L, 2000L, 2L, 20.0),
      (1L, 2000L, 3L, 30.0), (1L, 2000L, 4L, 40.0))
    def run(parts: Int) = TimeSeries
      .timeDecayed(df(rows, parts), "user_id", "tms", "event_id", "value", tau)
      .orderBy($"id").collect().map(r => (r.getLong(1), r.getDouble(4))).toSeq
    val one = run(1)
    assert(run(7) == one && run(3) == one)
    val f = math.exp(-1000.0 / tau)
    assert(math.abs(one(1)._2 - (20.0 + 10.0 * f)) < 1e-12)
    assert(math.abs(one(2)._2 - (30.0 + 20.0 + 10.0 * f)) < 1e-12)
    assert(math.abs(one(3)._2 - (40.0 + 30.0 + 20.0 + 10.0 * f)) < 1e-12)
  }

  test("timeDecayedClosedForm agrees with the recurrence on the events table") {
    val tau = 3600000.0
    val ev = Tables(spark, sf).events.withColumn("tms", unix_millis($"ts"))
    val a = TimeSeries.timeDecayed(ev, "user_id", "tms", "event_id", "value", tau)
    val b = TimeSeries.timeDecayedClosedForm(ev, "user_id", "tms", "event_id", "value", tau)
    val bad = a.join(b, Seq("key", "id"))
      .filter(abs($"decayed_sum" - $"ref_sum") >
        lit(1e-9) * greatest(abs($"ref_sum"), lit(1.0)))
      .count()
    assert(bad == 0L)
  }

  // independent naive LTTB written from the thesis construction —
  // deliberately NOT calling selectLttb internals
  private def naiveLttb(s: IndexedSeq[(Long, Long, Double)],
      threshold: Int): IndexedSeq[(Long, Long, Double)] = {
    val n = s.length
    if (n <= threshold) return s
    val nb = threshold - 2
    val every = (n - 2).toDouble / nb
    val sel = scala.collection.mutable.ArrayBuffer(s(0))
    for (b <- 0 until nb) {
      val start = (math.floor(b * every) + 1).toInt
      val end = (math.floor((b + 1) * every) + 1).toInt
      val (cx, cy) =
        if (b == nb - 1) (s(n - 1)._1.toDouble, s(n - 1)._3)
        else {
          val ns = (math.floor((b + 1) * every) + 1).toInt
          val ne = (math.floor((b + 2) * every) + 1).toInt
          val pts = (ns until ne).map(s)
          (pts.map(_._1.toDouble).sum / pts.size, pts.map(_._3).sum / pts.size)
        }
      val prev = sel.last
      val cand = (start until end).map { i =>
        val area = math.abs(
          (prev._1.toDouble - cx) * (s(i)._3 - prev._3) -
            (prev._1.toDouble - s(i)._1.toDouble) * (cy - prev._3)) / 2.0
        (i, area)
      }
      sel += s(cand.maxBy { case (i, a) => (a, -i) }._1)
    }
    sel += s(n - 1)
    sel.toIndexedSeq
  }

  test("selectLttb matches an independent naive implementation") {
    for (perKey <- Seq(3, 19, 20, 21, 57, 200)) {
      val s = synth(1, perKey).map(r => (r._2, r._3, r._4)).sortBy(p => (p._1, p._2))
        .toIndexedSeq
      assert(TimeSeries.selectLttb(s, 20) == naiveLttb(s, 20), s"n=$perKey")
    }
  }

  test("lttb keeps short series whole, retains endpoints, caps long series") {
    val rows = synth(6, 35) ++ synth(3, 8).map(r => (r._1 + 100, r._2, r._3 + 100000, r._4))
    val out = TimeSeries.lttb(df(rows), "user_id", "tms", "event_id", "value", 20)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    val byKey = out.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (k, g) =>
      val sel = byKey(k)
      assert(sel.size == math.min(g.size, 20), s"key $k")
      val sorted = g.sortBy(r => (r._2, r._3))
      val selTms = sel.sortBy(_._3).map(_._2)
      assert(selTms.head == sorted.head._2 && selTms.last == sorted.last._2)
    }
  }

  test("lttb distributed scan equals the per-group reference path") {
    val rows = synth(8, 77)
    val a = TimeSeries.lttb(df(rows), "user_id", "tms", "event_id", "value", 20)
      .select($"key", $"id", $"sel_idx")
    val b = TimeSeries.lttbReference(df(rows), "user_id", "tms", "event_id", "value", 20)
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
  }

  test("lttb selects an obvious spike") {
    // flat line with one tall spike mid-series: the spike's bucket
    // must select the spike point
    val rows = (0 until 100).map { i =>
      val v = if (i == 50) 100.0 else 1.0
      (1L, 1000L + i * 1000L, i.toLong, v)
    }
    val sel = TimeSeries.lttb(df(rows), "user_id", "tms", "event_id", "value", 10)
      .collect().map(_.getLong(1)).toSet
    assert(sel.contains(50L))
  }
}
