package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match rows whose point value falls inside
  * `[lo, hi]` intervals — another operator Spark has no native node
  * for; the naive plan is BroadcastNestedLoopJoin (every row × every
  * interval), quadratic on big inputs.
  *
  * Scalable composition: bucketize the number line into fixed-width
  * bins; an interval registers in every bin it overlaps, a point in
  * exactly one — the join becomes an equi-join on bin plus a cheap
  * residual filter. Shuffle is keyed and linear; bin width trades
  * interval replication against bin occupancy (pick ≈ median interval
  * width).
  */
object RangeJoin {

  /** `points ⋈ intervals ON lo <= pointCol <= hi` (inner). Interval
    * frames are expected to carry `lo`/`hi` columns named by the
    * params; all columns of both sides survive.
    */
  def byBinning(points: DataFrame, intervals: DataFrame, pointCol: String,
      lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // floored INTEGER bin division: Spark's `/` on longs is double
    // division, which misbins values above 2^53 (e.g. nanosecond
    // epochs); (x - pmod(x, w)) div w stays in long arithmetic at any
    // magnitude and floors negatives correctly (pmod is the
    // non-negative remainder).
    def bin(name: String): Column =
      expr(s"(`$name` - pmod(`$name`, ${binWidth}L)) div ${binWidth}L")
    val p = points.withColumn("_bin", bin(pointCol))
    val i = intervals.withColumn("_bin",
      explode(sequence(bin(lo), bin(hi))))
    p.join(i, Seq("_bin"))
      .filter(col(pointCol) >= col(lo) && col(pointCol) <= col(hi))
      .drop("_bin")
  }
}
