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

  test("bitmap pair algebra matches set arithmetic across bucket boundaries") {
    val rnd = new scala.util.Random(23)
    // ids spanning several 65536-id buckets, negatives included
    val setA = Set.fill(3000)(rnd.nextInt(400000).toLong - 100000L)
    val setB = Set.fill(3000)(rnd.nextInt(400000).toLong - 100000L)
    val df = setA.toSeq.map(("a", _)).++(setB.toSeq.map(("b", _)))
      .toDF("side", "id")
    val sk = df.groupBy($"side").agg(Bitmap.bitmap_agg($"id").as("st"))
    val r = sk.filter($"side" === "a").as("x")
      .crossJoin(sk.filter($"side" === "b").as("y"))
      .select(
        Bitmap.bitmap_and_count(col("x.st"), col("y.st")).as("and"),
        Bitmap.bitmap_andnot_count(col("x.st"), col("y.st")).as("andnot"),
        Bitmap.bitmap_xor_count(col("x.st"), col("y.st")).as("xor"))
      .collect()(0)
    assert(r.getLong(0) == (setA & setB).size.toLong)
    assert(r.getLong(1) == (setA -- setB).size.toLong)
    assert(r.getLong(2) == ((setA -- setB).size + (setB -- setA).size).toLong)
  }

  test("bitmap pair algebra: disjoint bucket ranges (left/right-only containers)") {
    val a = (0L to 100L).toSet                 // bucket 0
    val b = (1000000L to 1000100L).toSet       // far bucket
    val df = a.toSeq.map(("a", _)).++(b.toSeq.map(("b", _))).toDF("side", "id")
    val sk = df.groupBy($"side").agg(Bitmap.bitmap_agg($"id").as("st"))
    val r = sk.filter($"side" === "a").as("x")
      .crossJoin(sk.filter($"side" === "b").as("y"))
      .select(
        Bitmap.bitmap_and_count(col("x.st"), col("y.st")).as("and"),
        Bitmap.bitmap_andnot_count(col("x.st"), col("y.st")).as("andnot"),
        Bitmap.bitmap_xor_count(col("x.st"), col("y.st")).as("xor"))
      .collect()(0)
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 101L)
    assert(r.getLong(2) == 202L)
  }

  test("sumMap sums exactly per key and is partitioning-invariant") {
    import graft.functions.SumMap
    val rows = (1 to 5000).map { i =>
      (i % 3, Seq((i % 7).toLong, 100L + i % 4), Seq(i.toLong, 2L))
    }
    def run(parts: Int) = rows.toDF("g", "ks", "vs").repartition(parts)
      .groupBy($"g")
      .agg(SumMap.sum_map_agg($"ks", $"vs").as("m"))
      .select($"g", $"m")
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    val got = run(1)
    assert(got == run(13))
    // brute force
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.flatMap(r => r._2.zip(r._3))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        .toSeq.sortBy(_._1)
    }
    assert(got.view.mapValues(_.toSeq).toMap == expect)
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
