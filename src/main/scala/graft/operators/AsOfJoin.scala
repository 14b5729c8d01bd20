package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent
  * right row with `right.ts <= left.ts` on the same key — the classic
  * time-series enrichment operator, which Spark has no native node
  * for.
  *
  * Implemented by composition (SURVEY.md preference order (a)):
  * union-tag both sides, one shuffle by key, sort within partition by
  * (ts, side), and carry the right payload forward with
  * `last(ignoreNulls)` — O(n log n) per key-partition, ONE exchange
  * total, versus the naive range-join (key-equal × ts-filter × argmax)
  * which explodes quadratically on hot keys. This plan holds at
  * 100 TB: it is a window over a single co-partitioned sort, and AQE
  * can split skewed keys.
  *
  * Right rows sort before left rows at equal timestamps, so an exact
  * tie matches (DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics —
  * the oracle for q47).
  */
object AsOfJoin {

  /** Inner as-of join. `payload` = right columns carried to the left
    * rows. Left columns are preserved. Timestamps are compared on
    * `tsCol` (must exist in both frames, orderable).
    */
  def asOfInner(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) :+ col("_side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_p_$p")): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select((leftCols.map(c =>
        if (c == key || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("_side")) ++
        payload.map(p => col(p).as(s"_p_$p")): _*)
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"_f_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("_side") === 1 && payload.map(p => col(s"_f_$p").isNotNull).reduce(_ && _))
      .select(leftCols.map(col) ++ payload.map(p => col(s"_f_$p").as(p)): _*)
  }
}
