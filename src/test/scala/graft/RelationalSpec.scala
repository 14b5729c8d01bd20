package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    // q12 can legitimately be small; everything else must be non-empty.
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (name != "q12_anti_join_not_exists")
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("q01 aggregates match a hand-computed slice") {
    val df = Relational.queries("q01_agg_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(5)).sum <= 6000) // count_order sums to <= table size
    assert(rows.forall(_.getDouble(2) > 0))    // sum_qty positive
  }

  test("q02 pushes filters and prunes columns in the scan") {
    val df = Relational.queries("q02_filter_projection_pushdown")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("IsNotNull(l_returnflag)") || plan.contains("EqualTo(l_returnflag,R)"),
      s"expected pushed filter on l_returnflag in:\n$plan")
    // scan must read only the 5 referenced columns, not all 11
    assert(!plan.contains("l_tax"), "column pruning failed: l_tax read")
  }

  test("q03 broadcasts the dimension tables") {
    val df = Relational.queries("q03_join_revenue_by_nation")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q05 top-k plans as TakeOrderedAndProject (no global sort)") {
    val df = Relational.queries("q05_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("weighted median: range-partitioned carry path == plain window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // adversarial value sets: duplicates across keys, skewed weights,
    // values denser than the bucket grid, single-value keys — every
    // (key, v) row is unique after the groupBy, as in q110
    val rows = for {
      k <- Seq("A", "B", "C")
      i <- 0 until 500
    } yield (k, BigDecimal((i % 97) * 7 + (if (k == "B") 3000 else 0), // B shifted
        ).setScale(2), BigDecimal(1 + (i * i) % 13).setScale(2))
    val byVal = rows.toDF("k", "vr", "wr")
      .groupBy($"k", $"vr".cast("decimal(12,2)").as("v"))
      .agg(sum($"wr".cast("decimal(12,2)")).as("w"))
    def plain(df: org.apache.spark.sql.DataFrame) = {
      val win = Window.partitionBy($"k").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totals = df.groupBy($"k").agg(sum($"w").as("tw"))
      df.withColumn("cum", sum($"w").over(win))
        .join(broadcast(totals), "k")
        .filter($"cum" * 2 >= $"tw")
        .groupBy($"k").agg(min($"v").cast("double").as("wmedian"))
    }
    val want = plain(byVal).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    for (buckets <- Seq(1, 2, 7, 32, 1000)) { // incl. degenerate + over-split
      val got = Relational.weightedMedianRanged(byVal, "k", buckets)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == want, s"buckets=$buckets: $got vs $want")
    }
    // and the scaled plan really has no window keyed by `k` alone
    val plan = Relational.weightedMedianRanged(byVal, "k", 32)
      .queryExecution.optimizedPlan.toString
    val winSpecs = "windowspecdefinition\\((.*?)specifiedwindowframe".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toList
    assert(winSpecs.nonEmpty)
    assert(winSpecs.forall(_.contains("b#")),
      s"window keyed by the low-cardinality key alone in:\n$plan")
  }
}
