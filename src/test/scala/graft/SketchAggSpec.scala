package graft

import org.apache.spark.sql.functions._

class SketchAggSpec extends SparkSpec {

  test("approx_count_distinct is within HLL error of the exact count") {
    val t = Tables(spark, sf).lineitem
    val rows = t.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("exact"),
        approx_count_distinct("l_orderkey").as("approx"))
      .collect()
    rows.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"flag=${r.getString(0)} exact=$exact approx=$approx")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val t = Tables(spark, sf).lineitem
    val r = t.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_median"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
