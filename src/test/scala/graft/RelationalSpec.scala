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
}
