package graft

import graft.functions.{BloomAgg, BloomMightContain}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every inserted hash probes positive") {
    val hashes = (1L to 5000L).map(i => i * 0x87C37B91114253D5L) // spread bits
    val df = hashes.toDF("h").cache()
    val bloom = df.agg(BloomAgg.bloom_agg($"h", 1 << 14, 5).as("bf"))
    val misses = df.join(broadcast(bloom))
      .filter(!BloomMightContain.might_contain($"h", $"bf", 5))
      .count()
    assert(misses == 0)
  }

  test("false-positive rate stays near the analytic bound") {
    val inserted = (1L to 1000L).map(i => i * 0x87C37B91114253D5L)
    val probes = (2000001L to 2100000L).map(i => i * 0x87C37B91114253D5L)
    val bloom = inserted.toDF("h")
      .agg(BloomAgg.bloom_agg($"h", 1 << 14, 5).as("bf"))
    val fp = probes.toDF("h").join(broadcast(bloom))
      .filter(BloomMightContain.might_contain($"h", $"bf", 5))
      .count()
    val fpr = fp.toDouble / probes.size
    // theory: (1 - e^(-kn/m))^k ≈ 0.13% for n=1000, m=16384, k=5;
    // allow 3× for hash-derived bit correlation
    assert(fpr <= 0.004, s"FPR $fpr")
    assert(fpr > 0, "a filter this loaded should show SOME false positive")
  }

  test("filter bits are partitioning-invariant (OR-merge is order-free)") {
    val df = (1L to 10000L).map(i => i * 31L).toDF("h")
    val a = df.agg(BloomAgg.bloom_agg($"h", 1 << 12, 5)).collect()(0).getSeq[Long](0)
    val b = df.repartition(13)
      .agg(BloomAgg.bloom_agg($"h", 1 << 12, 5)).collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("bloom-prescreened decontamination equals the exact broadcast scan") {
    val docs = Tables(spark, sf).documents
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val evalSet = docs.filter($"doc_id" % 97 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(Dedup.contaminationScan(corpus, evalSet, "doc_id", "text", 4))
    val bloom = asMap(Dedup.contaminationScanBloom(corpus, evalSet, "doc_id", "text", 4))
    assert(exact.nonEmpty, "test data should contain contaminated docs")
    assert(bloom == exact)
  }

  test("a tiny over-loaded filter still loses nothing (FPs only)") {
    // 5k inserts into 256 bits: FPR ~1 — everything flags — but the
    // exact verify still yields the exact answer. Pins the
    // no-false-negative contract under the worst sizing.
    val docs = Tables(spark, sf).documents
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val evalSet = docs.filter($"doc_id" % 97 === 0)
    val exact = Dedup.contaminationScan(corpus, evalSet, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tiny = Dedup.contaminationScanBloom(corpus, evalSet, "doc_id", "text", 4,
        numBits = 256, numHashes = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny == exact)
  }
}
