package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._

/** Interval-algebra sweeps (q134/q135): half-open semantics,
  * tie-order invariance, and closed-form overlap cases.
  */
class IntervalSpec extends SparkSpec {

  private def iv(rows: (String, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "s", "e", "id")
  }

  private def maxInt(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    Intervals.maxIntersections(df, $"k", $"s", $"e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def lenSum(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    Intervals.intervalLengthSum(df, $"k", $"s", $"e", $"id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("maxIntersections: overlap counting, half-open touch does not intersect") {
    val df = iv(
      ("a", 0L, 10L, 1L), ("a", 5L, 15L, 2L), ("a", 8L, 9L, 3L), // 3 open in [8,9)
      ("a", 20L, 30L, 4L),
      ("b", 0L, 10L, 5L), ("b", 10L, 20L, 6L), // [0,10) and [10,20) touch: max 1
      ("c", 0L, 5L, 7L))
    assert(maxInt(df) ==
      Map("a" -> ((3L, 4L)), "b" -> ((1L, 2L)), "c" -> ((1L, 1L))))
  }

  test("maxIntersections: simultaneous opens on the same instant all count") {
    val df = iv(("a", 7L, 8L, 1L), ("a", 7L, 9L, 2L), ("a", 7L, 10L, 3L))
    assert(maxInt(df) == Map("a" -> ((3L, 3L))))
  }

  test("intervalLengthSum: overlaps once, gaps excluded, containment collapses") {
    val df = iv(
      ("a", 0L, 10L, 1L), ("a", 5L, 15L, 2L),   // union [0,15) = 15
      ("a", 20L, 25L, 3L),                      // +5, gap [15,20) excluded
      ("b", 0L, 100L, 4L), ("b", 10L, 20L, 5L), // contained: 100
      ("c", 0L, 5L, 6L), ("c", 5L, 9L, 7L))     // adjacent: 9
    assert(lenSum(df) == Map(
      "a" -> ((20L, 3L, 25L)), "b" -> ((100L, 2L, 100L)), "c" -> ((9L, 2L, 9L))))
  }

  test("intervalLengthSum: equal starts sum identically under either tie order") {
    // the per-row contributions differ with tie order; the SUM must not
    val a = iv(("a", 0L, 10L, 1L), ("a", 0L, 5L, 2L))
    val b = iv(("a", 0L, 10L, 2L), ("a", 0L, 5L, 1L)) // swap tie-break ids
    assert(lenSum(a)("a")._1 == 10L)
    assert(lenSum(b)("a")._1 == 10L)
  }

  test("scaled sweep (range pre-partition + carry) equals the direct sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // long-lived intervals crossing many range boundaries + short ones
    val rows = (1L to 400L).map { id =>
      val s = rnd.nextInt(1000).toLong
      val len = if (id % 7 == 0) 500 + rnd.nextInt(500) else 1 + rnd.nextInt(30)
      (s"k${id % 5}", s, s + len, id)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val direct = Intervals.maxIntersections(df, $"k", $"s", $"e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (nRanges <- Seq(1, 3, 16, 64)) {
      val scaled = Intervals.maxIntersectionsScaled(df, $"k", $"s", $"e", nRanges)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(scaled == direct, s"nRanges=$nRanges")
    }
  }

  test("scaled sweep: boundary points and a degenerate all-equal-time set") {
    import spark.implicits._
    // every point at the same instant → range width clamps to 1
    val same = Seq(("a", 5L, 6L, 1L), ("a", 5L, 6L, 2L), ("a", 5L, 6L, 3L))
      .toDF("k", "s", "e", "id")
    val got = Intervals.maxIntersectionsScaled(same, $"k", $"s", $"e", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L))
  }

  test("scaled length sum (range clipping) equals the direct sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (1L to 300L).map { id =>
      val s = rnd.nextInt(1000).toLong
      val len = if (id % 5 == 0) 400 + rnd.nextInt(600) else 1 + rnd.nextInt(40)
      (s"k${id % 4}", s, s + len, id)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val direct = Intervals.intervalLengthSum(df, $"k", $"s", $"e", $"id")
      .select($"k", $"covered_ms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (nRanges <- Seq(1, 4, 32)) {
      val scaled = Intervals.intervalLengthSumScaled(df, $"k", $"s", $"e", nRanges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(scaled == direct, s"nRanges=$nRanges")
    }
  }

  test("scaled length sum withStats matches the direct sweep's full row") {
    import spark.implicits._
    val rnd = new scala.util.Random(55)
    val rows = (1L to 250L).map { id =>
      val s = rnd.nextInt(800).toLong
      val len = if (id % 6 == 0) 300 + rnd.nextInt(500) else 1 + rnd.nextInt(50)
      (s"k${id % 3}", s, s + len, id)
    } :+ (("kz", 5L, 5L, 999L)) // a key with ONLY a zero-length interval
    val df = rows.toDF("k", "s", "e", "id")
    val direct = Intervals.intervalLengthSum(df, $"k", $"s", $"e", $"id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val scaled = Intervals
      .intervalLengthSumScaled(df, $"k", $"s", $"e", 16, withStats = true)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(scaled == direct)
    assert(scaled("kz") == ((0L, 1L, 0L))) // covered 0, counted, zero span
  }

  test("collapse-first skew path equals the direct sweeps on duplicate-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // pathological shape: one hot key replaying a handful of identical
    // intervals many times (all copies land in the same time ranges),
    // plus normal keys; instants drawn from only 12 distinct values so
    // the per-instant net-delta collapse actually collapses
    val rows = (1L to 600L).map { id =>
      val k = if (id % 3 != 0) "hot" else s"k${id % 4}"
      val s = (rnd.nextInt(12) * 10).toLong
      val e = s + (1 + rnd.nextInt(3)) * 10
      (k, s, e, id)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val directMax = Intervals.maxIntersections(df, $"k", $"s", $"e")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val directLen = Intervals.intervalLengthSum(df, $"k", $"s", $"e", $"id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (nRanges <- Seq(1, 5, 32)) {
      val cMax = Intervals
        .maxIntersectionsScaled(df, $"k", $"s", $"e", nRanges, collapseDups = true)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(cMax == directMax, s"max nRanges=$nRanges")
      val cLen = Intervals
        .intervalLengthSumScaled(df, $"k", $"s", $"e", nRanges,
          withStats = true, collapseDups = true)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(cLen == directLen, s"len nRanges=$nRanges")
    }
  }

  test("sweep matches a brute-force point-wise oracle on a dense random set") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 200L).map { id =>
      val s = rnd.nextInt(500).toLong
      ("a", s, s + 1 + rnd.nextInt(60), id)
    }
    val df = iv(rows: _*)
    // brute force on integer points (intervals are integer-bounded)
    val cover = Array.fill(600)(0)
    rows.foreach { case (_, s, e, _) =>
      (s until e).foreach(t => cover(t.toInt) += 1) }
    val expectMax = cover.max.toLong
    val expectLen = cover.count(_ > 0).toLong
    assert(maxInt(df)("a")._1 == expectMax)
    assert(lenSum(df)("a")._1 == expectLen)
  }
}
