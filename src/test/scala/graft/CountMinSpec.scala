package graft

import graft.functions.{CountMinAgg, CountMinEstimate}
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private def tokensOf(dir: String) = Tables(spark, dir).documents
    .select(explode(split($"text", " ")).as("token"))

  test("estimates never under-count, for EVERY token in the corpus") {
    val toks = tokensOf(sf).cache()
    val sketch = toks.agg(
      CountMinAgg.countmin_agg(xxhash64($"token"), 5, 2048).as("sk"))
    val under = toks.groupBy($"token").agg(count(lit(1)).as("exact_n"))
      .crossJoin(broadcast(sketch))
      .filter(CountMinEstimate.countmin_estimate(
        xxhash64($"token"), $"sk", 5) < $"exact_n")
      .count()
    assert(under == 0)
  }

  test("estimates stay inside the e/width error envelope") {
    val toks = tokensOf(sf).cache()
    val depth = 5; val width = 2048
    val sketch = toks.agg(
      CountMinAgg.countmin_agg(xxhash64($"token"), depth, width).as("sk"))
    val outside = toks.groupBy($"token").agg(count(lit(1)).as("exact_n"))
      .crossJoin(broadcast(sketch))
      .select($"exact_n",
        CountMinEstimate.countmin_estimate(xxhash64($"token"), $"sk", depth).as("est"),
        element_at($"sk", depth * width + 1).as("n"))
      .filter($"est" > $"exact_n" + lit(math.E / width) * $"n")
      .count()
    assert(outside == 0)
  }

  test("sketch counters are partitioning-invariant (sum-merge is order-free)") {
    val toks = tokensOf(sf)
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .agg(CountMinAgg.countmin_agg(xxhash64($"token"), 5, 512))
      .collect()(0).getSeq[Long](0)
    assert(sk(toks) == sk(toks.repartition(13)))
  }

  test("a deliberately tiny sketch over-counts but still never under-counts") {
    // width 16 with a ~40-token vocabulary forces heavy collisions:
    // the overestimate-only contract is what must survive
    val toks = tokensOf(sf).cache()
    val sketch = toks.agg(
      CountMinAgg.countmin_agg(xxhash64($"token"), 3, 16).as("sk"))
    val stats = toks.groupBy($"token").agg(count(lit(1)).as("exact_n"))
      .crossJoin(broadcast(sketch))
      .select($"exact_n",
        CountMinEstimate.countmin_estimate(xxhash64($"token"), $"sk", 3).as("est"))
      .agg(count(when($"est" < $"exact_n", 1)).as("under"),
        count(when($"est" > $"exact_n", 1)).as("over"))
      .collect()(0)
    assert(stats.getAs[Long]("under") == 0L)
    assert(stats.getAs[Long]("over") > 0L, "width 16 should visibly collide")
  }

  test("CMS-prescreened frequent tokens equal the exact computation") {
    val toks = tokensOf(sf).cache()
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .crossJoin(toks.agg(count(lit(1)).as("nt")))
      .filter($"n" >= lit(0.02) * $"nt")
      .select($"token", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaSketch = graft.operators.HeavyHitters
      .frequentTokens(toks, "token", minFraction = 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && viaSketch == exact)
    // a saturated sketch lets extra candidates through but the exact
    // verify still trims to the same answer (no-false-negative chain)
    val tiny = graft.operators.HeavyHitters
      .frequentTokens(toks, "token", minFraction = 0.02, depth = 3, width = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(tiny == exact)
  }

  test("the total slot equals the input row count") {
    val toks = tokensOf(sf)
    val sk = toks.agg(CountMinAgg.countmin_agg(xxhash64($"token"), 5, 512))
      .collect()(0).getSeq[Long](0)
    assert(sk.last == toks.count())
  }
}
