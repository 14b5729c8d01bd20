package graft.queries

import graft.{Parity, Tables}
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream semantics exposed through the driver contract: the
  * same transforms [[graft.streaming.EventStream]] runs incrementally
  * under Structured Streaming, evaluated here in batch mode against
  * the DuckDB oracle (plus JSON prop extraction).
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling event-time window aggregation (streaming operator run
    // in batch mode; StreamingSpec runs it with readStream+watermark).
    "q50_stream_tumbling_window" -> { (s, dir) =>
      import s.implicits._
      EventStream.tumblingCounts(Tables(s, dir).events)
        .orderBy($"window_start_ms", $"event_type")
    },

    // Sliding event-time windows (1 h window, 15 min slide): each
    // event in exactly 4 epoch-aligned windows — the overlapping-
    // window shape the oracle re-derives by explicit enumeration.
    // StreamingSpec runs the same transform as a true watermarked
    // stream and asserts batch parity.
    "q106_stream_sliding_window" -> { (s, dir) =>
      import s.implicits._
      EventStream.slidingCounts(Tables(s, dir).events)
        .orderBy($"window_start_ms", $"event_type")
    },

    // Gap-based sessionization (30 min); mapGroupsWithState runs the
    // same semantics incrementally (SessionizeSpec asserts equality).
    "q51_sessionize" -> { (s, dir) =>
      import s.implicits._
      EventStream.sessionize(Tables(s, dir).events)
        .orderBy($"user_id", $"session_id")
    },

    // Stream-stream join semantics (clicks × purchases within 1 hour,
    // per user), evaluated in batch; StreamingSpec runs it as a true
    // watermarked stream-stream join and asserts equality.
    "q56_interval_join" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      EventStream.clickPurchaseJoin(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .orderBy($"click_id", $"purchase_ms")
    },

    // Streaming dedup semantics in batch: an at-least-once source
    // re-delivers a deterministic subset (event_id % 7) and the dedup
    // stage must restore exactly the original set — the oracle
    // aggregates the ORIGINAL events, so any surviving duplicate (or
    // over-dropped row) breaks the count. StreamingSpec runs the
    // watermark-bounded variant as a true stream with state-eviction
    // assertions.
    "q76_stream_dedup" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
      val redelivered = ev.filter($"event_id" % 7 === 0)
      // id checksum is modular: raw sum(event_id) overflows BIGINT at
      // sf100 key magnitudes (~1e12 ids × 1e8 rows — the q74 lesson)
      graft.streaming.StreamDedup
        .dedupUnbounded(ev.unionAll(redelivered), Seq("event_id"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("users"),
          sum($"event_id" % 1000000007L).cast("long").as("id_sum"))
        .orderBy($"event_type")
    },

    // Stream-static enrichment join: events enriched with the static
    // customer dim (broadcast), rolled up per (segment, event_type).
    // StreamingSpec runs the same transform as a true stream against
    // the static dim and asserts batch parity.
    "q85_stream_static_enrich" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      EventStream.enrichedSegmentTotals(t.events, t.customer)
        .orderBy($"segment", $"event_type")
    },

    // windowFunnel-style sequence depth (ClickHouse's signature
    // sequence analytic, §2.B dialect kinship): deepest
    // view→click→purchase chain at strictly increasing timestamps
    // within 2 h of the view anchor. Greedy earliest-next chaining is
    // one user-key equi-join + min per stage — exact epoch-ms
    // arithmetic, plain-SQL oracle.
    "q108_window_funnel" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events.withColumn("tms", unix_millis($"ts"))
      graft.operators.Funnel.windowFunnel(ev, "user_id", "tms",
          Seq($"event_type" === "view", $"event_type" === "click",
            $"event_type" === "purchase"),
          windowMs = 7200000L)
        .orderBy($"user_id")
    },

    // retention-style cohort flags: signed up, clicked after first
    // signup, purchased after first signup — conditional aggregates
    // over the anchor-joined frame, no per-user state.
    "q109_retention" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events.withColumn("tms", unix_millis($"ts"))
      graft.operators.Funnel.retention(ev, "user_id", "tms",
          Seq($"event_type" === "signup", $"event_type" === "click",
            $"event_type" === "purchase"))
        .orderBy($"user_id")
    },

    // sequenceMatch-style chaining with a PER-STEP 30-minute gap:
    // reachability propagation (every qualifying event survives each
    // stage), because greedy earliest-next is provably wrong under
    // per-step bounds — FunnelSpec pins the distinguishing case.
    "q114_sequence_match" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events.withColumn("tms", unix_millis($"ts"))
      graft.operators.Funnel.sequenceMatch(ev, "user_id", "tms",
          Seq($"event_type" === "view", $"event_type" === "click",
            $"event_type" === "purchase"),
          gapMs = 1800000L)
        .orderBy($"user_id")
    },

    // maxIntersections — max simultaneously-open intervals per event
    // type, intervals = [ts, ts + value seconds) in exact integer ms.
    // Runs the RANGE-PARTITIONED sweep: 5 event types means 5 serial
    // sweep tasks in the plain form (measured 31.4 s at sf10 — the
    // low-key-cardinality wall), vs key×64 parallel tasks here; the
    // oracle runs the plain one-pass sweep in SQL, so the gate is
    // also the decomposition's output-identity proof.
    "q134_max_intersections" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .maxIntersectionsScaled(ev, $"event_type", $"sms", $"ems", nRanges = 64)
        .withColumnRenamed("k", "event_type")
        .orderBy($"event_type")
    },

    // intervalLengthSum — union length of each user's activity
    // intervals (overlaps counted once). Runs the CLIPPED scale path
    // (time-axis partition, key×16-parallel sweeps — 6.8× the plain
    // per-key sweep at sf100, docs/bench_notes.md r10) with the
    // per-key count/span stats joined back; the oracle remains the
    // plain one-pass sweep in SQL, so this gate doubles as the
    // decomposition's output-identity proof. The plain operator stays
    // gated via IntervalSpec's randomized equality.
    "q135_interval_length_sum" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .intervalLengthSumScaled(ev, $"user_id", $"sms", $"ems",
          nRanges = 16, withStats = true)
        .withColumnRenamed("k", "user_id")
        .orderBy($"user_id")
    },

    // deltaSum + boundingRatio per user in event-time order: sum of
    // positive adjacent value deltas (exact integer cents) and the
    // endpoint slope (value change per ms). One window shuffle; the
    // first/last endpoints come from lexicographic struct min/max on
    // the unique (tms, event_id) key — no tie nondeterminism.
    "q139_delta_sum" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir).events
        .withColumn("tms", unix_millis($"ts"))
        .withColumn("cents", round($"value" * 100).cast("long"))
      val w = Window.partitionBy($"user_id").orderBy($"tms", $"event_id")
      ev.withColumn("prev", lag($"cents", 1).over(w))
        .groupBy($"user_id")
        .agg(
          sum(when($"cents" > $"prev", $"cents" - $"prev").otherwise(0L))
            .as("delta_sum_cents"),
          min(struct($"tms", $"event_id", $"cents")).as("f"),
          max(struct($"tms", $"event_id", $"cents")).as("l"))
        .select($"user_id", $"delta_sum_cents",
          when($"l.tms" > $"f.tms",
            ($"l.cents" - $"f.cents").cast("double") / ($"l.tms" - $"f.tms"))
            .as("bounding_ratio"))
        .orderBy($"user_id")
    },

    // The maxIntersections SCALE PATH gated: time-range pre-partition
    // + boundary-count correction (sweep parallelism key×16 instead
    // of per-key serial), per-user concurrency this time — the
    // oracle runs the plain one-pass sweep, so the gate IS the
    // output-identity proof of the decomposition.
    "q144_max_intersections_scaled" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .maxIntersectionsScaled(ev, $"user_id", $"sms", $"ems", nRanges = 16)
        .withColumnRenamed("k", "user_id")
        .orderBy($"user_id")
    },

    // The intervalLengthSum SCALE PATH: union length decomposes
    // exactly over a time-axis partition, so intervals are CLIPPED
    // per range and the sweeps run key×range-parallel with no carry.
    // Oracle = the plain one-pass sweep.
    "q145_interval_length_scaled" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .intervalLengthSumScaled(ev, $"user_id", $"sms", $"ems", nRanges = 16)
        .withColumnRenamed("k", "user_id")
        .orderBy($"user_id")
    },

    // groupArrayMovingSum/Avg analogue — per-user 4-row moving sum /
    // average in event-time order (ROWS frame, exact integer cents;
    // the avg is one double division of exact integers, so both
    // engines produce the identical IEEE value).
    "q142_moving_window" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir).events
        .withColumn("tms", unix_millis($"ts"))
        .withColumn("cents", round($"value" * 100).cast("long"))
      val w = Window.partitionBy($"user_id").orderBy($"tms", $"event_id")
        .rowsBetween(-3, 0)
      ev.select($"user_id", $"event_id",
          sum($"cents").over(w).as("mov_sum4"),
          count(lit(1)).over(w).as("mov_cnt"))
        .withColumn("mov_avg4", $"mov_sum4".cast("double") / $"mov_cnt")
        .orderBy($"user_id", $"event_id")
    },

    // exponentialTimeDecayedSum/Count/Avg analogue (q151): the decayed
    // value AT EVERY EVENT via the O(1)-state recurrence
    // ([[graft.operators.TimeSeries.timeDecayed]]). Floating-point
    // recurrences aren't association-stable across engines, so the
    // gate is the q42-style self-audit: an INDEPENDENT closed-form
    // recomputation (direct early-exit summation, not the recurrence)
    // must agree to 1e-9 relative, plus structural bounds — booleans
    // DuckDB predicts TRUE, row count checked exactly.
    "q151_time_decayed" -> { (s, dir) =>
      import s.implicits._
      val tauMs = 3600000.0 // 1 hour
      val ev = Tables(s, dir).events
        .withColumn("tms", unix_millis($"ts"))
      val ema = graft.operators.TimeSeries.timeDecayed(
        ev, "user_id", "tms", "event_id", "value", tauMs)
      val ref = graft.operators.TimeSeries.timeDecayedClosedForm(
        ev, "user_id", "tms", "event_id", "value", tauMs)
      val j = ema.join(ref.select($"key", $"id",
          $"ref_sum", $"ref_cnt", $"run_min", $"run_max", $"row_no"),
        Seq("key", "id"))
      def relErr(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        abs(a - b) / greatest(abs(b), lit(1e-12))
      j.agg(
          count(lit(1)).as("n_rows"),
          coalesce(every(relErr($"decayed_sum", $"ref_sum") <= 1e-9 &&
            relErr($"decayed_cnt", $"ref_cnt") <= 1e-9), lit(true)).as("sums_match"),
          coalesce(every($"decayed_cnt" >= 1.0 - 1e-9 &&
            $"decayed_cnt" <= $"row_no" + 1.0 + 1e-9), lit(true)).as("cnt_bounded"),
          coalesce(every(
            $"decayed_sum" / $"decayed_cnt" >= $"run_min" - 1e-9 &&
              $"decayed_sum" / $"decayed_cnt" <= $"run_max" + 1e-9),
            lit(true)).as("avg_in_range"))
        .select($"n_rows".cast("long").as("n_rows"),
          $"sums_match", $"cnt_bounded", $"avg_in_range")
    },

    // LTTB downsampling (q152): 20 points per user series. The
    // selected-point COUNT is exactly predictable (min(n, 20) per
    // series — the oracle sums it), and the selection itself is
    // audited against an independent per-group execution of the
    // reference algorithm (mapGroups vs the operator's series-
    // streaming scan) plus endpoint checks.
    "q152_lttb_downsample" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("tms", unix_millis($"ts"))
      val sel = graft.operators.TimeSeries.lttb(
        ev, "user_id", "tms", "event_id", "value", threshold = 20)
      val ref = graft.operators.TimeSeries.lttbReference(
        ev, "user_id", "tms", "event_id", "value", threshold = 20)
      val matched = sel.join(ref, Seq("key", "id", "sel_idx"))
        .agg(count(lit(1)).as("n_matched"))
      // series endpoints from the RAW events; selected endpoints from
      // the selection (sel_idx rises with time, so min/max of the
      // (sel_idx, tms, id) struct are the first/last selected points)
      val serEnds = ev.groupBy(col("user_id").as("key")).agg(
        count(lit(1)).as("n_pts"),
        min(struct(unix_millis($"ts").as("tms"), $"event_id".as("id"))).as("first_pt"),
        max(struct(unix_millis($"ts").as("tms"), $"event_id".as("id"))).as("last_pt"))
      val selEnds = sel.groupBy($"key").agg(
        count(lit(1)).as("n_sel"),
        min($"sel_idx").as("min_si"), max($"sel_idx").as("max_si"),
        min(struct($"sel_idx", $"tms", $"id")).as("sfirst"),
        max(struct($"sel_idx", $"tms", $"id")).as("slast"))
      val endsOk = serEnds.join(selEnds, Seq("key")).agg(
        coalesce(every(
          $"n_sel" === least($"n_pts", lit(20L)) &&
            $"min_si" === 0L && $"max_si" === $"n_sel" - 1L &&
            $"sfirst.tms" === $"first_pt.tms" && $"sfirst.id" === $"first_pt.id" &&
            $"slast.tms" === $"last_pt.tms" && $"slast.id" === $"last_pt.id"),
          lit(true)).as("endpoints_ok"))
      sel.agg(countDistinct($"key").as("n_series"),
          count(lit(1)).as("sel_total"))
        .crossJoin(matched.select($"n_matched"))
        .crossJoin(endsOk)
        .select($"n_series".cast("long").as("n_series"),
          $"sel_total".cast("long").as("sel_total"),
          ($"n_matched" === $"sel_total").as("matches_reference"),
          $"endpoints_ok")
    },

    // JSON property extraction from the props column.
    "q52_json_extract" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .select(
          (get_json_object($"props", "$.k").cast("long") % 10).as("k_bucket"),
          $"value")
        .groupBy($"k_bucket")
        .agg(count(lit(1)).as("n"), Parity.sumD($"value").as("total"))
        .orderBy($"k_bucket")
    },

    // maxIntersections PATHOLOGICAL-SKEW path: collapse-first on top
    // of the range partition — net delta per (key, range, instant) via
    // a map-side hash partial aggregate, so a key piling rows onto few
    // distinct instants (range partitioning's blind spot: all copies
    // land in ONE range) never serializes a sort. Same 5-key
    // event_type shape and the SAME oracle as q134 — the gate is the
    // collapse's output-identity proof on real data.
    "q153_max_intersections_skew" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .maxIntersectionsScaled(ev, $"event_type", $"sms", $"ems",
          nRanges = 64, collapseDups = true)
        .withColumnRenamed("k", "event_type")
        .orderBy($"event_type")
    },

    // intervalLengthSum PATHOLOGICAL-SKEW path: unique-(s,e)-first
    // with multiplicity (union coverage counts duplicates once, so
    // replayed intervals collapse map-side before clipping fans them
    // out to ranges). Same oracle as q135 = output-identity proof.
    "q154_interval_length_skew" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .withColumn("sms", unix_millis($"ts"))
        .withColumn("ems", $"sms" + round($"value" * 1000).cast("long"))
      graft.operators.Intervals
        .intervalLengthSumScaled(ev, $"user_id", $"sms", $"ems",
          nRanges = 16, withStats = true, collapseDups = true)
        .withColumnRenamed("k", "user_id")
        .orderBy($"user_id")
    })

  val oracles: Map[String, String] = Map(
    "q76_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        | count(DISTINCT user_id) AS users,
        | CAST(sum(event_id % 1000000007) AS BIGINT) AS id_sum
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q85_stream_static_enrich" ->
      """SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
        | e.event_type, count(*) AS n,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY segment, event_type""".stripMargin,

    "q50_stream_tumbling_window" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin,

    // every event's 4 windows enumerated: start = (⌊tms/slide⌋−k)·slide
    // for k=0..3 (all valid: tms mod slide + k·slide < size always)
    "q106_stream_sliding_window" ->
      """WITH e AS (SELECT epoch_ms(ts) AS tms, event_type, value FROM events),
        |x AS (SELECT CAST(((tms // 900000) - k.k) * 900000 AS BIGINT) AS window_start_ms,
        |        event_type, value
        |      FROM e, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT window_start_ms, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM x
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin,

    "q51_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, tms,
        |    CASE WHEN prev IS NULL OR tms - prev > 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |g AS (
        |  SELECT user_id, tms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tms) AS start_ms, max(tms) - min(tms) AS duration_ms
        |FROM g
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q56_interval_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS purchase_ts, value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT click_id, c.user_id,
        |  epoch_ms(click_ts) AS click_ms,
        |  epoch_ms(purchase_ts) AS purchase_ms,
        |  purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND purchase_ts <= click_ts
        |  AND purchase_ts >= click_ts - INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_ms""".stripMargin,

    "q114_sequence_match" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |r1 AS (SELECT DISTINCT user_id, tms FROM e WHERE event_type = 'view'),
        |r2 AS (SELECT DISTINCT n.user_id, n.tms
        |       FROM e n JOIN r1 p ON n.user_id = p.user_id
        |         AND n.event_type = 'click'
        |         AND n.tms > p.tms AND n.tms <= p.tms + 1800000),
        |r3 AS (SELECT DISTINCT n.user_id, n.tms
        |       FROM e n JOIN r2 p ON n.user_id = p.user_id
        |         AND n.event_type = 'purchase'
        |         AND n.tms > p.tms AND n.tms <= p.tms + 1800000),
        |lv AS (SELECT DISTINCT user_id, 1 AS lvl FROM r1
        |       UNION ALL SELECT DISTINCT user_id, 2 FROM r2
        |       UNION ALL SELECT DISTINCT user_id, 3 FROM r3)
        |SELECT u.user_id, CAST(coalesce(max(lv.lvl), 0) AS BIGINT) AS match_depth
        |FROM u LEFT JOIN lv ON u.user_id = lv.user_id
        |GROUP BY 1
        |ORDER BY u.user_id""".stripMargin,

    "q108_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, tms AS t1, tms AS tk FROM e WHERE event_type = 'view'),
        |s2 AS (SELECT s.user_id, s.t1, min(n.tms) AS tk
        |       FROM s1 s JOIN e n ON n.user_id = s.user_id
        |         AND n.event_type = 'click'
        |         AND n.tms > s.tk AND n.tms <= s.t1 + 7200000
        |       GROUP BY 1, 2),
        |s3 AS (SELECT s.user_id, s.t1, min(n.tms) AS tk
        |       FROM s2 s JOIN e n ON n.user_id = s.user_id
        |         AND n.event_type = 'purchase'
        |         AND n.tms > s.tk AND n.tms <= s.t1 + 7200000
        |       GROUP BY 1, 2),
        |lv AS (SELECT DISTINCT user_id, 1 AS lvl FROM s1
        |       UNION ALL SELECT DISTINCT user_id, 2 FROM s2
        |       UNION ALL SELECT DISTINCT user_id, 3 FROM s3)
        |SELECT u.user_id, CAST(coalesce(max(lv.lvl), 0) AS BIGINT) AS funnel_level
        |FROM u LEFT JOIN lv ON u.user_id = lv.user_id
        |GROUP BY 1
        |ORDER BY u.user_id""".stripMargin,

    "q109_retention" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |a AS (SELECT user_id, min(tms) AS t0 FROM e
        |      WHERE event_type = 'signup' GROUP BY 1)
        |SELECT u.user_id,
        |  (a.user_id IS NOT NULL) AS r0,
        |  coalesce(bool_or(e.event_type = 'click'
        |    AND a.t0 IS NOT NULL AND e.tms > a.t0), FALSE) AS r1,
        |  coalesce(bool_or(e.event_type = 'purchase'
        |    AND a.t0 IS NOT NULL AND e.tms > a.t0), FALSE) AS r2
        |FROM u LEFT JOIN a ON u.user_id = a.user_id
        |LEFT JOIN e ON u.user_id = e.user_id
        |GROUP BY 1, 2
        |ORDER BY u.user_id""".stripMargin,

    "q134_max_intersections" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |p AS (SELECT event_type, s AS t, 1 AS d FROM e
        |      UNION ALL SELECT event_type, e, -1 FROM e),
        |c AS (SELECT event_type,
        |  CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d) AS BIGINT)
        |    AS open_now FROM p)
        |SELECT event_type, max(open_now) AS max_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_intervals
        |FROM c
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,

    "q135_interval_length_sum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s)))) AS BIGINT)
        |    AS covered_ms,
        |  count(*) AS n_intervals,
        |  max(e) - min(s) AS span_ms
        |FROM m
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    "q139_delta_sum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |x AS (SELECT user_id, tms, cents,
        |    lag(cents) OVER (PARTITION BY user_id ORDER BY tms, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tms, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tms DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN cents > prev THEN cents - prev ELSE 0 END) AS BIGINT)
        |    AS delta_sum_cents,
        |  CASE WHEN max(tms) > min(tms) THEN
        |    CAST(max(CASE WHEN rn_d = 1 THEN cents END) -
        |         max(CASE WHEN rn_a = 1 THEN cents END) AS DOUBLE)
        |      / (max(tms) - min(tms))
        |  END AS bounding_ratio
        |FROM x
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    "q144_max_intersections_scaled" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |p AS (SELECT user_id, s AS t, 1 AS d FROM e
        |      UNION ALL SELECT user_id, e, -1 FROM e),
        |c AS (SELECT user_id,
        |  CAST(sum(d) OVER (PARTITION BY user_id ORDER BY t, d) AS BIGINT)
        |    AS open_now FROM p)
        |SELECT user_id, max(open_now) AS max_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_intervals
        |FROM c
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    "q145_interval_length_scaled" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s)))) AS BIGINT)
        |    AS covered_ms
        |FROM m
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    "q142_moving_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id,
        |  CAST(sum(cents) OVER w AS BIGINT) AS mov_sum4,
        |  CAST(count(*) OVER w AS BIGINT) AS mov_cnt,
        |  CAST(CAST(sum(cents) OVER w AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) OVER w AS BIGINT) AS mov_avg4
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // float recurrences aren't association-stable across engines: the
    // gate checks the exact row count and the booleans the in-plan
    // self-audit (independent closed-form recompute, bound checks)
    // must earn — the q42 audit pattern
    "q151_time_decayed" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | TRUE AS sums_match, TRUE AS cnt_bounded, TRUE AS avg_in_range
        |FROM events""".stripMargin,

    // selected-point count is exactly min(series length, 20) per
    // series; selection equality + endpoint retention are the audit
    // booleans
    "q152_lttb_downsample" ->
      """WITH s AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_series,
        | CAST(sum(least(n, 20)) AS BIGINT) AS sel_total,
        | TRUE AS matches_reference, TRUE AS endpoints_ok
        |FROM s""".stripMargin,

    "q52_json_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1
        |ORDER BY k_bucket""".stripMargin,

    // same oracle as q134 (plain one-pass sweep): the skew gate is the
    // collapse-first decomposition's output-identity proof
    "q153_max_intersections_skew" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |p AS (SELECT event_type, s AS t, 1 AS d FROM e
        |      UNION ALL SELECT event_type, e, -1 FROM e),
        |c AS (SELECT event_type,
        |  CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d) AS BIGINT)
        |    AS open_now FROM p)
        |SELECT event_type, max(open_now) AS max_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_intervals
        |FROM c
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,

    // same oracle as q135 (plain one-pass sweep with stats)
    "q154_interval_length_skew" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS s,
        |  epoch_ms(ts) + CAST(round(value * 1000) AS BIGINT) AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s)))) AS BIGINT)
        |    AS covered_ms,
        |  count(*) AS n_intervals,
        |  max(e) - min(s) AS span_ms
        |FROM m
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin)
}
