package graft

import graft.operators.{Compaction, Sampling}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("deterministic split is a pure function of the key") {
    val docs = Tables(spark, sf).documents
    val a = Sampling.withSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment at any partitioning and under data growth (a
    // subset sees identical buckets)
    val b = Sampling.withSplit(docs.repartition(13).limit(100), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    b.foreach { case (id, s) => assert(a(id) == s, s"doc $id flipped split") }
    // proportions roughly 80/10/10
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("valid") - 0.1) < 0.04, frac.toString)
  }

  test("deterministic sample equals the split's bucket predicate") {
    val docs = Tables(spark, sf).documents
    val n = Sampling.sampled(docs, "doc_id", permille = 100).count()
    val total = docs.count()
    assert(n > 0 && n < total)
    assert(math.abs(n.toDouble / total - 0.1) < 0.04, s"$n/$total")
  }

  test("compaction bounds rows per file and range-clusters footer stats") {
    import java.nio.file.{Files => JFiles, Paths}
    val docs = Tables(spark, sf).documents.select(col("doc_id"), col("source"))
    val total = docs.count()
    val dir = JFiles.createTempDirectory("graft-compact").toString
    Compaction.compactTo(docs, dir, maxRecordsPerFile = 100,
      nFiles = math.ceil(total / 100.0).toInt, clusterBy = Seq("doc_id"))
    val files = JFiles.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(files.length >= total / 100,
      s"expected >=${total / 100} files, got ${files.length}")
    assert(files.forall(_.endsWith(".zstd.parquet")),
      s"compacted files should carry the zstd codec: ${files.head}")
    // per-file row bound AND non-overlapping doc_id ranges (footer
    // stats selective => downstream scans can prune)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f)
      assert(d.count() <= 100, s"file $f exceeds maxRecordsPerFile")
      val r = d.agg(min("doc_id"), max("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "file key ranges overlap")
      case _ =>
    }
  }
}
