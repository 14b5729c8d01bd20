package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics in the ClickHouse style — the engine-side
  * equivalents of `windowFunnel` and `retention` (the reference's
  * target dialect; SURVEY.md §2.B kinship), expressed as bounded
  * relational plans instead of per-user state machines.
  */
object Funnel {

  /** `windowFunnel`-style max funnel depth per user: the deepest `L`
    * such that events matching `stages(0..L-1)` occur at STRICTLY
    * increasing timestamps, all within `windowMs` of the stage-1
    * anchor event. Greedy earliest-next chaining per anchor is optimal
    * (the window is anchored at t1, so minimizing each intermediate
    * timestamp only widens what remains) — each stage is therefore one
    * equi-join on the user plus a `min` aggregate, `nStages − 1`
    * joins total, co-partitioned on the user key throughout.
    *
    * All arithmetic is on BIGINT epoch-millis — exact, and the oracle
    * replays the same joins in plain SQL.
    *
    * @param events (userCol, tmsCol: epoch ms, …) event frame.
    * @param stages per-stage predicates over `events`' columns.
    * @return (user_id, funnel_level) for every distinct user, level 0
    *         when even stage 1 never fired.
    */
  def windowFunnel(events: DataFrame, userCol: String, tmsCol: String,
      stages: Seq[Column], windowMs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage predicate")
    val e = events.select(col(userCol).as("user_id"),
      col(tmsCol).cast("long").as("tms"))
    val users = e.select(col("user_id")).distinct()
    val stageFrames = Seq.newBuilder[DataFrame]
    var cur = events.filter(stages.head)
      .select(col(userCol).as("user_id"),
        col(tmsCol).cast("long").as("t1"), col(tmsCol).cast("long").as("tk"))
    stageFrames += cur
    var k = 1
    while (k < stages.length) {
      val nxt = events.filter(stages(k))
        .select(col(userCol).as("user_id"), col(tmsCol).cast("long").as("nts"))
      cur = cur.join(nxt, Seq("user_id"))
        .filter(col("nts") > col("tk") && col("nts") <= col("t1") + windowMs)
        .groupBy(col("user_id"), col("t1"))
        .agg(min(col("nts")).as("tk"))
      stageFrames += cur
      k += 1
    }
    val levels = stageFrames.result().zipWithIndex
      .map { case (df, i) =>
        df.select(col("user_id")).distinct()
          .withColumn("lvl", lit((i + 1).toLong))
      }
      .reduce(_ unionAll _)
    users.join(levels, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(coalesce(max(col("lvl")), lit(0L)).as("funnel_level"))
  }

  /** `sequenceMatch`-style chaining with a PER-STEP gap bound: stage
    * k+1 must fire strictly after SOME reachable stage-k event and
    * within `gapMs` of it. Unlike [[windowFunnel]]'s stage-1-anchored
    * window, greedy earliest-next is WRONG here — minimizing t_k
    * tightens t_{k+1}'s upper bound, so a later stage-k event can
    * enable a chain the earliest one cannot. Correctness needs full
    * reachability: each stage keeps EVERY event with a qualifying
    * predecessor (a user-keyed join + distinct per stage — bounded by
    * per-user events per stage, the same co-partitioned shape).
    *
    * @return (user_id, match_depth): deepest stage any chain reaches,
    *         0 when stage 1 never fires.
    */
  def sequenceMatch(events: DataFrame, userCol: String, tmsCol: String,
      stages: Seq[Column], gapMs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one stage predicate")
    val users = events.select(col(userCol).as("user_id")).distinct()
    val stageFrames = Seq.newBuilder[DataFrame]
    var reach = events.filter(stages.head)
      .select(col(userCol).as("user_id"), col(tmsCol).cast("long").as("tms"))
      .distinct()
    stageFrames += reach
    var k = 1
    while (k < stages.length) {
      val nxt = events.filter(stages(k))
        .select(col(userCol).as("user_id"), col(tmsCol).cast("long").as("nts"))
      reach = nxt.join(reach, Seq("user_id"))
        .filter(col("nts") > col("tms") && col("nts") <= col("tms") + gapMs)
        .select(col("user_id"), col("nts").as("tms"))
        .distinct()
      stageFrames += reach
      k += 1
    }
    val levels = stageFrames.result().zipWithIndex
      .map { case (df, i) =>
        df.select(col("user_id")).distinct()
          .withColumn("lvl", lit((i + 1).toLong))
      }
      .reduce(_ unionAll _)
    users.join(levels, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(coalesce(max(col("lvl")), lit(0L)).as("match_depth"))
  }

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
