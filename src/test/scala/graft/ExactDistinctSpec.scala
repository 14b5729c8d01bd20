package graft

import graft.functions.Bitmap
import org.apache.spark.sql.functions._

class ExactDistinctSpec extends SparkSpec {

  import spark.implicits._

  private def ev = Tables(spark, sf).events

  test("uniqUpTo equals LEAST(count distinct, n+1) in both regimes") {
    val got = ev.groupBy($"event_type")
      .agg(Bitmap.uniq_up_to($"user_id", 40).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> math.min(r.getLong(1), 41L)).toMap
    assert(got == exact)
    assert(exact.values.exists(_ == 41L) || exact.values.forall(_ < 41L))
    // small-cardinality regime really is exact, not just capped
    val small = Seq(1L, 2L, 2L, 3L).toDF("user_id")
      .agg(Bitmap.uniq_up_to($"user_id", 40)).collect()(0).getLong(0)
    assert(small == 3L)
  }

  test("uniqUpTo is partitioning-invariant") {
    def u(parts: Int) = ev.repartition(parts).groupBy($"event_type")
      .agg(Bitmap.uniq_up_to($"user_id", 40).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u(1) == u(32))
  }

  test("bitmap distinct is exact, mergeable two-level, and handles negatives") {
    val twoLevel = ev
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(Bitmap.bitmap_agg($"user_id").as("st"))
      .groupBy($"event_type")
      .agg(Bitmap.bitmap_count(Bitmap.bitmap_merge_agg($"st")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel == exact)
    // negative ids exercise the arithmetic-shift bucket key
    val neg = Seq(-1L, -1L, -65537L, 0L, 65536L).toDF("user_id")
      .agg(Bitmap.bitmap_count(Bitmap.bitmap_agg($"user_id")))
      .collect()(0).getLong(0)
    assert(neg == 4L)
  }

  test("bitmap states round-trip parquet and still merge exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm-roll").toString
    ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(Bitmap.bitmap_agg($"user_id").as("st"))
      .write.mode("overwrite").parquet(dir)
    val rolled = spark.read.parquet(dir)
      .groupBy($"event_type")
      .agg(Bitmap.bitmap_count(Bitmap.bitmap_merge_agg($"st")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == exact)
  }
}
