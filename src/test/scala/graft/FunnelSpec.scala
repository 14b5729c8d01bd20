package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** windowFunnel / retention sequence analytics (q108/q109). */
class FunnelSpec extends SparkSpec {

  private def ev(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "tms")
  }

  private def funnel(df: org.apache.spark.sql.DataFrame, windowMs: Long = 100L) = {
    import spark.implicits._
    Funnel.windowFunnel(df, "user_id", "tms",
        Seq($"event_type" === "a", $"event_type" === "b", $"event_type" === "c"),
        windowMs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("windowFunnel: depth per user, strict ordering, window anchored at stage 1") {
    val df = ev(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),   // full chain
      (2L, "a", 10L), (2L, "b", 20L),                   // stops at 2
      (3L, "b", 10L), (3L, "c", 20L),                   // never starts
      (4L, "a", 10L), (4L, "b", 200L), (4L, "c", 210L), // b outside window
      (5L, "a", 10L), (5L, "c", 20L), (5L, "b", 30L))   // c before b: depth 2
    assert(funnel(df) ==
      Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("windowFunnel: equal timestamps do not chain (strictly increasing)") {
    val df = ev((1L, "a", 10L), (1L, "b", 10L), (1L, "c", 11L))
    assert(funnel(df) == Map(1L -> 1L))
  }

  test("windowFunnel: a later anchor can reach deeper than the first") {
    // anchor at 10 only reaches b@20 (c@300 outside); anchor at 250
    // chains b@260, c@300 — max depth must consider every anchor
    val df = ev(
      (1L, "a", 10L), (1L, "b", 20L),
      (1L, "a", 250L), (1L, "b", 260L), (1L, "c", 300L))
    assert(funnel(df) == Map(1L -> 3L))
  }

  test("sequenceMatch: a later stage-k event enables chains greedy-min would miss") {
    import spark.implicits._
    // greedy earliest-next takes b@5, then finds no c in (5, 45];
    // reachability keeps b@30 too, which chains c@60 (60 <= 30+40)
    val df = ev(
      (1L, "a", 0L), (1L, "b", 5L), (1L, "b", 30L), (1L, "c", 60L))
    val got = Funnel.sequenceMatch(df, "user_id", "tms",
        Seq($"event_type" === "a", $"event_type" === "b", $"event_type" === "c"),
        gapMs = 40L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L), s"reachability must find the b@30 chain: $got")
    // sanity: the anchored-window funnel with window 40 cannot reach c@60
    assert(funnel(df, windowMs = 40L) == Map(1L -> 2L))
  }

  test("sequenceMatch: per-step gap bounds each hop, not the whole chain") {
    import spark.implicits._
    // chain spans 0 -> 90 -> 180: every hop <= 100 but total > 100 —
    // legal under per-step gaps, illegal under an anchored window
    val df = ev((1L, "a", 0L), (1L, "b", 90L), (1L, "c", 180L))
    val got = Funnel.sequenceMatch(df, "user_id", "tms",
        Seq($"event_type" === "a", $"event_type" === "b", $"event_type" === "c"),
        gapMs = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
    assert(funnel(df, windowMs = 100L) == Map(1L -> 2L))
  }

  test("a 100k-event-per-stage bot user streams through without a join blowup") {
    import spark.implicits._
    // 300k events for ONE user: 100k per stage, interleaved so full
    // chains exist. The old per-stage user joins built |stage-k| x
    // |reachable| (1e10) intermediate rows here; the sorted scan is
    // O(events * stages) and must finish promptly.
    val bot = (0 until 100000).flatMap { i =>
      val t = i.toLong * 10
      Seq((7L, "a", t), (7L, "b", t + 3), (7L, "c", t + 6))
    }
    val df = bot.toDF("user_id", "event_type", "tms")
    val t0 = System.nanoTime()
    assert(funnel(df) == Map(7L -> 3L))
    val gotSeq = Funnel.sequenceMatch(df, "user_id", "tms",
        Seq($"event_type" === "a", $"event_type" === "b", $"event_type" === "c"),
        gapMs = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotSeq == Map(7L -> 3L))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"bot user took $secs%.1f s - fanout is back")
  }

  test("retention: steps count only strictly after the first anchor") {
    import spark.implicits._
    val df = ev(
      (1L, "signup", 10L), (1L, "click", 20L),   // r0 r1
      (2L, "click", 10L), (2L, "signup", 20L),   // click precedes signup: r1 false
      (3L, "signup", 10L), (3L, "purchase", 5L), // purchase before: r2 false
      (4L, "click", 10L))                        // never signed up
    val got = Funnel.retention(df, "user_id", "tms",
        Seq($"event_type" === "signup", $"event_type" === "click",
          $"event_type" === "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got == Map(
      1L -> (true, true, false),
      2L -> (true, false, false),
      3L -> (true, false, false),
      4L -> (false, false, false)))
  }
}
