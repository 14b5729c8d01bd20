package graft

import graft.functions.{MinHashAgg, Murmur3, ShingleHash64}
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {

  test("group signature equals the signature of the group's shingle union") {
    val docs = Tables(spark, sf).documents
    val sigs = docs.groupBy(col("source"))
      .agg(MinHashAgg.minhash_agg(ShingleHash64.shingle_hashes(col("text"), 3), 64)
        .as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap

    // driver-side ground truth: union shingle hashes per source, then min
    val rows = docs.select(col("source"), col("text")).collect()
    val unions = rows.groupBy(_.getString(0)).map { case (src, rs) =>
      src -> rs.flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        toks.sliding(3).filter(_.length == 3).map(s => Murmur3.hash64(s.mkString(" ")))
      }.toSet
    }
    unions.foreach { case (src, hashes) =>
      val expected = Array.tabulate(64) { i =>
        hashes.map(h => graft.functions.Mix64.family(i, h)).min
      }
      assert(sigs(src).toSeq == expected.toSeq, s"source $src")
    }
  }

  test("estimated jaccard between group signatures tracks exact jaccard") {
    val docs = Tables(spark, sf).documents
    val sigs = docs.groupBy(col("source"))
      .agg(MinHashAgg.minhash_agg(ShingleHash64.shingle_hashes(col("text"), 3), 128)
        .as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val rows = docs.select(col("source"), col("text")).collect()
    val unions = rows.groupBy(_.getString(0)).map { case (src, rs) =>
      src -> rs.flatMap { r =>
        r.getString(1).split(" ", -1).sliding(3).filter(_.length == 3)
          .map(s => Murmur3.hash64(s.mkString(" ")))
      }.toSet
    }
    val srcs = unions.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val exact = (unions(a) & unions(b)).size.toDouble / (unions(a) | unions(b)).size
      val est = MinHashAgg.estimatedJaccard(sigs(a), sigs(b))
      assert(math.abs(est - exact) < 0.15, s"($a,$b) exact=$exact est=$est")
    }
  }
}
