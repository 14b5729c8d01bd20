package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** Ingest-time data-quality profiling (the Deequ/great-expectations
  * stage of a production pipeline): per-column completeness,
  * cardinality, bounds, and an exact money-semantics sum, computed in
  * ONE pass over the table, plus the constraint verdicts a loader
  * gates on (complete? non-negative?) derived from the same
  * statistics. The reference pipeline trusts its upstream Hive tables
  * blindly (arity validation aside — op #10); a 100 TB ingest cannot,
  * and the profile is what stands between a silently-broken upstream
  * partition and a poisoned load.
  *
  * Scale shape: a single `agg` over the scan — every statistic is a
  * partial-aggregable expression, so the shuffle carries one partial
  * row per task. The exact `countDistinct` per column rewrites to an
  * expand (×(cols+1) on the PROFILED columns only, which the scan
  * prunes to); past ~10 columns or very high cardinality swap it for
  * the mergeable HLL of the q48 family — the profile's other columns
  * don't change. The long-format pivot at the end is a 1-row explode
  * on the driver-sized aggregate, not a data-path operation.
  */
object Profiling {

  /** One-pass numeric profile: a row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_d, max_d, sum_d,
    * complete, non_negative). `sum_d` is decimal(18,2)-exact then
    * cast to double (the [[graft.Parity]] money convention), so the
    * value is engine-exact for 2-decimal monetary columns.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        graft.Parity.sumD(col(c)).as(s"${c}__sum"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), $"n_rows",
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_d"),
        col(s"${c}__max").as("max_d"),
        col(s"${c}__sum").as("sum_d"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select($"p.*")
      .withColumn("complete", $"n_nulls" === 0L)
      .withColumn("non_negative", $"min_d" >= 0d)
  }
}
