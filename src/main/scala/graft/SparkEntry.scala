package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory: one entry per
  * implemented operator from SURVEY.md §2 (ETL pipeline ops, delegated
  * relational surface, and the large-scale pipeline extensions).
  * `oracleSql` carries a DuckDB-runnable oracle per query where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Etl.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Events.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Etl.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Events.oracles
}
