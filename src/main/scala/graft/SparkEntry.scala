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

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's §3.1 direct-load pipeline end to end — scan →
    * positional exclude → stringly parity mode → null-normalize →
    * sanitize → dt/additional columns → wire rows → weighted
    * murmur3_128 shard assignment → per-shard load summary.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.config.LoaderConfig
    import graft.operators.{Sharding, ShardSpec, TransformStage}
    import org.apache.spark.sql.functions._
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
    val cfg = LoaderConfig(dt = "2017-01-07", additionalCols = Seq("graft"))
    val excluded = TransformStage.excludeFields(li, Seq(0, 10))
    val wire = TransformStage.transform(excluded, cfg,
      stringCols = Set("l_returnflag", "l_linestatus", "dt", "additional_0"))
    Sharding.assign(wire, "l_partkey", ShardSpec(Seq(1, 2, 1)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("wire_row"))).cast("long").as("wire_chars"))
      .orderBy(col("shard"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Etl.queries ++
      graft.queries.Pipeline.queries ++ graft.queries.Events.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Etl.oracles ++
      graft.queries.Pipeline.oracles ++ graft.queries.Events.oracles
}
