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
    *
    * The payload is carried as ONE struct, not per-column fills: a
    * right row whose payload values are partially NULL must still
    * match as a unit (per-column `last(ignoreNulls)` would stitch
    * together columns from different right rows).
    */
  def asOfInner(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    // SQL join semantics: a NULL key or NULL timestamp never matches
    // (Window.partitionBy would happily group NULL keys together and
    // nulls-first ordering would leak a NULL-ts right row's payload) —
    // filter both sides up front; inner semantics drop such left rows.
    val notNull = col(key).isNotNull && col(tsCol).isNotNull
    val l = left.filter(notNull)
      .withColumn("_side", lit(1))
      .select(leftCols.map(col) :+ col("_side") :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("_p"): _*)
    val r = right.filter(notNull)
      .withColumn("_side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("_side") :+
        payloadStruct.as("_p"): _*)
    val unioned = l.unionByName(r)
    // `_p` as the final sort key makes the pick among right rows that
    // share (key, ts) deterministic across partitionings/reruns
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_f", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_f").isNotNull)
      .select(leftCols.map(col) ++ payload.map(p => col(s"_f.$p").as(p)): _*)
  }
}
