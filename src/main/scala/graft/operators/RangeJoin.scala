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
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("_bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    p.join(i, Seq("_bin"))
      .filter(col(pointCol) >= col(lo) && col(pointCol) <= col(hi))
      .drop("_bin")
  }
}
