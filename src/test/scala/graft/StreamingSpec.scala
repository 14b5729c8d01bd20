package graft

import graft.streaming.{EventStream, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  private def eventsDir: String = {
    // readStream wants a directory; stage the single events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    Tables(spark, sf).events.write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling-window agg equals the batch result") {
    val dir = eventsDir
    val batchEvents = spark.read.parquet(dir)
    val expected = EventStream.tumblingCounts(batchEvents)
      .orderBy("window_start_ms", "event_type").collect().toSeq

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val q = EventStream.tumblingCounts(stream, withWatermark = true)
      .writeStream
      .outputMode("complete") // finite input; complete mode emits all windows
      .format("memory")
      .queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("win_out")
      .orderBy("window_start_ms", "event_type").collect().toSeq
    assert(got == expected)
  }

  test("mapGroupsWithState sessionization equals the declarative batch form") {
    import spark.implicits._
    val events = Tables(spark, sf).events
    val typed = events
      .select($"user_id", $"event_id", unix_millis($"ts").as("tms"))
      .as[Sessionize.Event]
    val got = Sessionize.streamingSessionize(spark, typed)
      .collect().map(u => (u.user_id, u.session_id, u.n_events, u.start_ms, u.duration_ms))
      .toSet
    val expected = EventStream.sessionize(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming load via foreachBatch is effectively-once (batch replay idempotent)") {
    import graft.streaming.StreamingLoad
    val dir = eventsDir
    val src = spark.read.parquet(dir)
    val wh = java.nio.file.Files.createTempDirectory("graft-swh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS streamdb LOCATION '$wh'")
    spark.sql("DROP TABLE IF EXISTS streamdb.loaded")
    StreamingLoad.ensureTarget(spark, "streamdb.loaded", src)
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val q = StreamingLoad.start(spark, stream, "streamdb.loaded", ckpt)
    q.awaitTermination(120000)
    val n = src.count()
    assert(spark.table("streamdb.loaded").count() == n)
    // replay batch 0 manually (simulated failure re-delivery): dynamic
    // overwrite of its partition must not duplicate rows
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    src.withColumn("_batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.mode("overwrite").insertInto("streamdb.loaded")
    assert(spark.table("streamdb.loaded").count() == n)
  }

  test("multimodal feature extraction matches the column-level formula") {
    import graft.operators.Multimodal
    val media = Multimodal.asBinaryFrame(Tables(spark, sf).documents, "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature == (f.n_bytes * 31 + f.head) % 997)
    }
  }

  test("multimodal resize + frame sampling keeps batch shape and budgets") {
    import graft.operators.Multimodal
    val media = Multimodal.asBinaryFrame(
      Tables(spark, sf).documents.limit(50), "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, nFrames = 4, targetBytes = 64)
      .collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.length <= 4)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      assert(fs.map(_.n_bytes).sum <= 64) // resize budget bounds total bytes
    }
  }
}
