package graft

import graft.catalog.TargetSchema
import graft.cli.Args
import graft.config.{InputFormat, WireFormat}
import graft.operators.{ShardSpec, Skew}
import graft.sinks.{CollectingExecutor, PartitionedSink}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class LoaderJobSpec extends SparkSpec {

  test("CLI args parse the reference's quick-start invocation") {
    // doc/quick-start.md:76-89 flag surface
    val cfg = Args.parse(Seq(
      "--table", "test.t_lzj_test01",
      "--export-dir", "/warehouse/t/dt=2017-01-07",
      "--fields-terminated-by", "|",
      "--exclude-fields", "0,9,10,13,14,15,16,17,18",
      "--clickhouse-format", "TabSeparated",
      "--input-split-max-bytes", "8589934592",
      "--batch-size", "200000",
      "--dt", "2017-01-07",
      "--input-format", "text"))
    assert(cfg.table == "test.t_lzj_test01")
    assert(cfg.excludeFields == Seq(0, 9, 10, 13, 14, 15, 16, 17, 18))
    assert(cfg.batchSize == 200000)
    assert(cfg.inputSplitMaxBytes == 8589934592L)
    assert(cfg.clickhouseFormat == WireFormat.TabSeparated)
    assert(cfg.escapeNull && cfg.direct && cfg.maxTries == 3) // defaults
  }

  test("CLI rejects unknown enum values") {
    intercept[IllegalArgumentException](Args.parse(Seq("--input-format", "avro")))
    intercept[IllegalArgumentException](Args.parse(Seq("--mode", "sideways")))
  }

  test("direct load end-to-end: text source → wire rows → batched sink") {
    val dir = Files.createTempDirectory("graft-job")
    Files.writeString(dir.resolve("data.txt"),
      (1 to 100).map(i => s"$i|name_$i|\\N|val_$i").mkString("\n"))
    val cfg = Args.parse(Seq(
      "--export-dir", dir.toString,
      "--table", "target_t",
      "--batch-size", "30",
      "--dt", "2017-01-07"))
    val target = TargetSchema.fromDDL(
      "c0 STRING, c1 STRING, c2 STRING, c3 STRING, dt STRING",
      shardingKey = Some("c1"))
    CollectingExecutor.clear()
    val report = LoaderJob.runDirect(spark, cfg, target, ShardSpec(Seq(1, 1)),
      CollectingExecutor)
    assert(report.success == 100 && report.failed == 0)
    assert(CollectingExecutor.totalRows("target_t") == 100)
    // micro-batches bounded by batchSize
    CollectingExecutor.batches.forEach { case (_, sz) => assert(sz <= 30) }
  }

  test("staged load lands rows in the catalog target atomically") {
    val dir = Files.createTempDirectory("graft-job2")
    Files.writeString(dir.resolve("data.txt"), "1|a\n2|b\n3|\\N\n")
    val wh = Files.createTempDirectory("graft-wh2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS jobdb LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS jobdb.tgt")
    // staged frame carries the transform output incl. dt column
    spark.sql("CREATE TABLE jobdb.tgt (c0 STRING, c1 STRING, dt STRING) USING parquet")
    val cfg = Args.parse(Seq(
      "--export-dir", dir.toString, "--table", "jobdb.tgt",
      "--dt", "2017-01-07", "--direct", "false"))
    val target = TargetSchema.fromDDL("c0 STRING, c1 STRING, dt STRING")
    LoaderJob.runStaged(spark, cfg, target, ShardSpec(Seq(1)), "job42")
    val rows = spark.table("jobdb.tgt").orderBy("c0").collect()
    assert(rows.length == 3)
    assert(rows(2).getString(1) == "") // \N → nullString for a STRING target col
    assert(rows.forall(_.getString(2) == "2017-01-07"))
    assert(!spark.catalog.tableExists("temp_jobdb_tgt_job42"))
  }

  test("staged load through the DSv2 connector lands wire rows in the backend") {
    import graft.sinks.v2.InMemoryStagingStore
    val dir = Files.createTempDirectory("graft-job3")
    Files.writeString(dir.resolve("data.txt"), "1|a\n2|b\n3|\\N\n")
    val cfg = Args.parse(Seq(
      "--export-dir", dir.toString, "--table", "db.v2tgt",
      "--dt", "2017-01-07", "--direct", "false"))
    val target = TargetSchema.fromDDL("c0 STRING, c1 STRING, dt STRING")
    InMemoryStagingStore.clear()
    LoaderJob.runStagedV2(spark, cfg, target, ShardSpec(Seq(1)), "memory")
    val rows = InMemoryStagingStore.targetRows("db.v2tgt").sorted
    assert(rows == Seq("1\ta\t2017-01-07", "2\tb\t2017-01-07", "3\t\t2017-01-07"))
    assert(InMemoryStagingStore.liveStagings.isEmpty)
  }

  test("partitioned sink: dynamic overwrite is per-partition idempotent") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-wh3").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS psdb LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS psdb.pt")
    val sink = new PartitionedSink(spark)
    val day1 = Seq((1, "a", "2017-01-01"), (2, "b", "2017-01-01")).toDF("k", "v", "dt")
    val day2 = Seq((3, "c", "2017-01-02")).toDF("k", "v", "dt")
    sink.ensureTarget("psdb.pt", day1, "dt")
    sink.overwritePartitions(day1, "psdb.pt")
    sink.overwritePartitions(day2, "psdb.pt")
    // re-load day1 with corrected data: replaces ONLY day1
    val day1Fixed = Seq((9, "z", "2017-01-01")).toDF("k", "v", "dt")
    sink.overwritePartitions(day1Fixed, "psdb.pt")
    val rows = spark.table("psdb.pt").orderBy("k").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(3, 9))
    // expiry drops old partitions
    val dropped = sink.dropExpired("psdb.pt", "dt", cutoff = "2017-01-02")
    assert(dropped == Seq("dt=2017-01-01"))
    assert(spark.table("psdb.pt").count() == 1)
  }

  test("salted join equals the plain join (skew mitigation is transparent)") {
    val t = Tables(spark, sf)
    val plain = t.lineitem.join(t.orders, Seq("l_orderkey" -> "o_orderkey")
        .map(_ => col("l_orderkey") === col("o_orderkey")).reduce(_ && _))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val renamed = t.orders.withColumnRenamed("o_orderkey", "l_orderkey")
    val salted = Skew.saltedJoin(t.lineitem, renamed, "l_orderkey",
        saltBy = "l_partkey", saltFactor = 8)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
