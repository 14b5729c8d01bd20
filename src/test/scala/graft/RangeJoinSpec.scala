package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bin-based range join equals the naive non-equi join") {
    import spark.implicits._
    val points = Tables(spark, sf).part
      .select($"p_partkey", $"p_size".cast("long").as("p_size"))
    val intervals = Seq(("a", 0L, 7L), ("b", 5L, 22L), ("c", 23L, 50L))
      .toDF("band", "lo", "hi") // overlapping intervals on purpose
    val binned = RangeJoin.byBinning(points, intervals, "p_size", "lo", "hi", 10L)
      .select("p_partkey", "band").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals,
        $"p_size" >= $"lo" && $"p_size" <= $"hi")
      .select("p_partkey", "band").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("bin-based range join plans an equi-join, not a nested loop") {
    import spark.implicits._
    val points = Tables(spark, sf).part
      .select($"p_partkey", $"p_size".cast("long").as("p_size"))
    val intervals = Seq(("a", 0L, 7L)).toDF("band", "lo", "hi")
    val p = RangeJoin.byBinning(points, intervals, "p_size", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), s"expected hash/SMJ equi-join:\n$p")
  }
}
