package graft

import graft.functions.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  import spark.implicits._

  private def tokensOf(dir: String) = Tables(spark, dir).documents
    .select(explode(split($"text", " ")).as("token"))
    .filter(length($"token") > 0)

  test("estimate lands inside 3 sigma of the exact distinct count") {
    val toks = tokensOf(sf).cache()
    val p = 12
    val exact = toks.select(countDistinct($"token")).collect()(0).getLong(0)
    val est = toks
      .agg(Hll.hll_estimate(Hll.hll_agg(xxhash64($"token"), p)))
      .collect()(0).getLong(0)
    val bound = math.max(3 * 1.04 / math.sqrt((1 << p).toDouble) * exact, 1.0)
    assert(math.abs(est - exact) <= bound,
      s"est=$est exact=$exact bound=$bound")
  }

  test("registers are partitioning-invariant (max-merge is order-free)") {
    val toks = tokensOf(sf)
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .agg(Hll.hll_agg(xxhash64($"token"), 10))
      .collect()(0).getSeq[Long](0)
    assert(regs(toks) == regs(toks.repartition(13)))
  }

  test("merging per-group sketches equals the sketch of the union") {
    // register-for-register, not just estimate-close: max-merge of the
    // per-source partials must equal one pass over everything
    val t = Tables(spark, sf).documents
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
    val perSource = t.groupBy($"source")
      .agg(Hll.hll_agg(xxhash64($"token"), 10).as("sk"))
      .collect().map(_.getSeq[Long](1))
    val merged = perSource.reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
    val whole = t.agg(Hll.hll_agg(xxhash64($"token"), 10))
      .collect()(0).getSeq[Long](0)
    assert(merged == whole)
  }

  test("small cardinalities resolve exactly through linear counting") {
    val df = Seq("a", "b", "c", "a", "b", "a").toDF("v")
    val est = df.agg(Hll.hll_estimate(Hll.hll_agg(xxhash64($"v"), 12)))
      .collect()(0).getLong(0)
    assert(est == 3L, s"m=4096 over 3 distinct values is exact: $est")
  }

  test("persisted states merge register-exactly to the direct sketch") {
    // the uniqState/uniqMerge contract: write per-group partial states
    // to parquet, read them back, HllMergeAgg them — the result must
    // equal a direct single-pass HllAgg REGISTER-FOR-REGISTER (merge
    // is lossless), so rollups of rollups compose to any granularity
    val t = Tables(spark, sf).documents
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-roll").toString
    t.groupBy($"source")
      .agg(Hll.hll_agg(xxhash64($"token"), 10).as("state"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(Hll.hll_merge_agg($"state"))
      .collect()(0).getSeq[Long](0)
    val direct = t.agg(Hll.hll_agg(xxhash64($"token"), 10))
      .collect()(0).getSeq[Long](0)
    assert(merged == direct)
  }

  test("merging states of different width fails loudly") {
    val a = Seq("x", "y").toDF("v")
      .agg(Hll.hll_agg(xxhash64($"v"), 10).as("state"))
    val b = Seq("z").toDF("v")
      .agg(Hll.hll_agg(xxhash64($"v"), 12).as("state"))
    val ex = intercept[Exception] {
      a.unionAll(b).agg(Hll.hll_merge_agg($"state")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("max-merge absorbs replayed partials (idempotent under re-delivery)") {
    val toks = tokensOf(sf)
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .agg(Hll.hll_agg(xxhash64($"token"), 10))
      .collect()(0).getSeq[Long](0)
    assert(regs(toks.unionAll(toks)) == regs(toks),
      "duplicated input must not move any register")
  }
}
