package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming load path: `writeStream.foreachBatch` into a partitioned
  * target with the micro-batch id as a partition column, overwritten
  * dynamically — so re-processing a batch (failure/restart replay)
  * rewrites exactly its own partition instead of duplicating rows.
  * Structured Streaming's at-least-once delivery + idempotent
  * per-batch overwrite = effectively-once, the streaming analogue of
  * the reference's temp-table two-phase commit (SURVEY.md §2.A #15).
  */
object StreamingLoad {

  def ensureTarget(spark: SparkSession, table: String, like: DataFrame): Unit = {
    val cols = like.schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table ($cols, _batch_id BIGINT) " +
        "USING parquet PARTITIONED BY (_batch_id)")
  }

  /** Start an effectively-once streaming load of `stream` into
    * `table`. Caller awaits/stops the returned query.
    *
    * Two correctness subtleties inside foreachBatch:
    * - the batch frame is bound to the stream's CLONED session (conf
    *   snapshotted at start()), so the dynamic-overwrite mode must be
    *   set on `batch.sparkSession` — setting it on the outer session
    *   would leave the clone in static mode, and each batch's
    *   overwrite would truncate every other batch's partition;
    * - `insertInto` resolves by POSITION, so columns are aligned to
    *   the target table's order explicitly.
    */
  def start(spark: SparkSession, stream: DataFrame, table: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val targetCols = s.table(table).columns
        batch.withColumn("_batch_id", lit(batchId))
          .select(targetCols.map(col).toIndexedSeq: _*)
          .write.mode("overwrite").insertInto(table)
      }
      .start()
}
