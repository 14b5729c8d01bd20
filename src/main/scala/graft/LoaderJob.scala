package graft

import graft.catalog.TargetSchema
import graft.config.LoaderConfig
import graft.operators.{Sharding, ShardSpec, TransformStage}
import graft.sinks.{BatchExecutor, DirectSink, LoadMetrics, LoadReport, StagedSink}
import graft.sources.Readers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end load job — the engine's equivalent of the
  * reference's `ClickhouseHdfsLoader.run()` driver
  * (`ClickhouseHdfsLoader.java:68-214`), §3.1/§3.2 as one declarative
  * pipeline:
  *
  *   read (text/ORC/parquet) → exclude fields → stringly parity →
  *   null-normalize + sanitize → dt/additional columns → wire rows →
  *   weighted shard assignment → co-locate by shard →
  *   direct sink (micro-batched, retried) | staged temp-table commit
  *
  * A user of the reference maps their CLI invocation onto
  * [[LoaderConfig]] (see [[graft.cli.Args]]) and gets the same load
  * semantics with Catalyst planning the physical execution.
  */
object LoaderJob {

  /** Build the transform half (everything before the sink): returns
    * the wire-row frame with a `shard` column. Pure plan — no actions.
    */
  def plan(spark: SparkSession, cfg: LoaderConfig, target: TargetSchema,
      shards: ShardSpec): DataFrame = {
    val src = Readers.read(spark, cfg)
    val excluded = TransformStage.excludeFields(src, cfg.excludeFields)
    val wire = TransformStage.transform(excluded, cfg, target.stringCols)
    target.validate(wire.drop("wire_row"))
    val keyCol = target.shardingKey.getOrElse(wire.columns.head)
    Sharding.partitionByShard(
      Sharding.assign(wire, keyCol, shards), shards, cfg.loaderTaskExecutor)
  }

  /** Direct load (§3.1, `--direct true`): per-partition micro-batched
    * inserts through `executor` with retry + metrics; fails the job if
    * any batch exhausted its retries (the reference's counters
    * contract, `ClickhouseHdfsLoader.java:203-207`).
    */
  def runDirect(spark: SparkSession, cfg: LoaderConfig, target: TargetSchema,
      shards: ShardSpec, executor: BatchExecutor): LoadReport = {
    val metrics = LoadMetrics(spark)
    val report = new DirectSink(executor, cfg, metrics)
      .write(plan(spark, cfg, target, shards), cfg.table)
    report.failIfAnyFailed()
    report
  }

  /** Two-phase load (§3.2, `--direct false`) into a catalog table:
    * stage, then one atomic `INSERT INTO target SELECT * FROM temp`.
    */
  def runStaged(spark: SparkSession, cfg: LoaderConfig, target: TargetSchema,
      shards: ShardSpec, jobId: String): Unit = {
    val staged = plan(spark, cfg, target, shards).drop("wire_row", "shard")
    new StagedSink(spark).write(staged, cfg.table, jobId)
  }

  /** Two-phase load through the DSv2 connector
    * ([[graft.sinks.v2.StagedSource]]): per-task staging + job-level
    * commit/abort are owned by the connector's `BatchWrite`, so task
    * retries and job failure cleanup follow Spark's commit protocol
    * instead of driver-side bookkeeping. `backend` = "memory" (tests)
    * or "jdbc" (+ url/user/password options via `extraOptions`).
    */
  def runStagedV2(spark: SparkSession, cfg: LoaderConfig, target: TargetSchema,
      shards: ShardSpec, backend: String,
      extraOptions: Map[String, String] = Map.empty): Unit = {
    val wire = plan(spark, cfg, target, shards).select("wire_row")
    wire.write.format("graft-staged")
      .option("target", cfg.table)
      .option("backend", backend)
      .option("batchsize", cfg.batchSize.toString)
      .options(extraOptions)
      .mode("append")
      .save()
  }
}
