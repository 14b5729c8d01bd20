package graft

import graft.config.LoaderConfig
import graft.sinks._
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {

  private def wireFrame(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("i").select(concat(lit("row-"), col("i")).as("wire_row"))
  }

  test("DirectSink micro-batches by batchSize and counts success records") {
    CollectingExecutor.clear()
    val metrics = LoadMetrics(spark)
    val sink = new DirectSink(CollectingExecutor, LoaderConfig(batchSize = 100), metrics)
    val report = sink.write(wireFrame(1050).repartition(3), "t1")
    assert(report.success == 1050 && report.failed == 0)
    assert(CollectingExecutor.totalRows("t1") == 1050)
    // 3 partitions × (ceil(rows/batch)) batches; all bounded by batchSize
    val sizes = CollectingExecutor.batches.toArray.map(_.asInstanceOf[(String, Int)]._2)
    assert(sizes.forall(_ <= 100))
    report.failIfAnyFailed()
  }

  test("DirectSink retries transient failures with backoff and succeeds") {
    val metrics = LoadMetrics(spark)
    val sink = new DirectSink(new FlakyExecutor(failures = 2),
      LoaderConfig(batchSize = 1000, maxTries = 3), metrics)
    val report = sink.write(wireFrame(10).coalesce(1), "t2")
    assert(report.success == 10 && report.failed == 0)
  }

  test("DirectSink exhausted retries count failed records and fail the load") {
    val metrics = LoadMetrics(spark)
    val sink = new DirectSink(new FlakyExecutor(failures = 99),
      LoaderConfig(batchSize = 1000, maxTries = 2), metrics)
    val report = sink.write(wireFrame(10).coalesce(1), "t3")
    assert(report.failed == 10)
    intercept[IllegalStateException](report.failIfAnyFailed())
  }

  test("Retry backoff is exponential (not the reference's XOR bug)") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    intercept[RuntimeException] {
      Retry.withRetries(4, baseDelayMs = 100, sleep = (l: Long) => sleeps += l)(_ =>
        throw new RuntimeException("always"))
    }
    assert(sleeps.toSeq == Seq(200, 400, 800)) // 2^1, 2^2, 2^3 × 100ms
  }

  test("V2 staged write commits all tasks' stagings and leaves none behind") {
    import graft.sinks.v2.InMemoryStagingStore
    InMemoryStagingStore.clear()
    wireFrame(1050).repartition(3)
      .write.format("graft-staged")
      .option("target", "db.v2t")
      .option("batchsize", "100")
      .mode("append").save()
    assert(InMemoryStagingStore.targetRows("db.v2t").size == 1050)
    assert(InMemoryStagingStore.liveStagings.isEmpty,
      s"stagings not cleaned: ${InMemoryStagingStore.liveStagings}")
    // second append accumulates
    wireFrame(50).write.format("graft-staged")
      .option("target", "db.v2t").mode("append").save()
    assert(InMemoryStagingStore.targetRows("db.v2t").size == 1100)
  }

  test("V2 staged write overwrite mode truncates the target atomically") {
    import graft.sinks.v2.InMemoryStagingStore
    InMemoryStagingStore.clear()
    wireFrame(100).write.format("graft-staged")
      .option("target", "db.v2o").mode("append").save()
    wireFrame(7).write.format("graft-staged")
      .option("target", "db.v2o").mode("overwrite").save()
    assert(InMemoryStagingStore.targetRows("db.v2o").size == 7)
    assert(InMemoryStagingStore.liveStagings.isEmpty)
  }

  test("V2 staged write abort leaves the target untouched and drops stagings") {
    import graft.sinks.v2.InMemoryStagingStore
    import spark.implicits._
    InMemoryStagingStore.clear()
    wireFrame(10).write.format("graft-staged")
      .option("target", "db.v2a").mode("append").save()
    val poison = udf((i: Int) =>
      if (i == 666) throw new RuntimeException("poison row") else s"row-$i")
    val bad = (1 to 1000).toDF("i")
      .repartition(4)
      .select(poison(col("i")).as("wire_row"))
    intercept[Exception] {
      bad.write.format("graft-staged")
        .option("target", "db.v2a")
        .option("batchsize", "10")
        .mode("append").save()
    }
    assert(InMemoryStagingStore.targetRows("db.v2a").size == 10,
      "aborted write must not change the committed target")
    assert(InMemoryStagingStore.liveStagings.isEmpty,
      s"abort must drop every staging: ${InMemoryStagingStore.liveStagings}")
  }

  test("StagedSink commits via INSERT INTO … SELECT and drops the temp table") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS staged LOCATION '$wh'")
    spark.sql("CREATE TABLE IF NOT EXISTS staged.target (k INT, v STRING) USING parquet")
    val sink = new StagedSink(spark)
    sink.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), "staged.target", "job1")
    sink.write(Seq((3, "c")).toDF("k", "v"), "staged.target", "job2")
    assert(spark.table("staged.target").count() == 3)
    assert(!spark.catalog.tableExists("temp_staged_target_job1"))
    assert(!spark.catalog.tableExists("temp_staged_target_job2"))
  }
}
