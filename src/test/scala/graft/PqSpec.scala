package graft

import graft.functions.PqAdcScore
import graft.functions.VectorFunctions._
import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus =
    Similarity.prepare(Tables(spark, sf).embeddings, "vec_id", "embedding")
      .cache()

  test("codebooks have k entries per subspace and codes stay in range") {
    val cb = Pq.trainCodebooks(corpus, m = 8, k = 16, dim = 64)
    val bySub = cb.groupBy($"sub")
      .agg(count(lit(1)).as("n"), min($"code").as("lo"), max($"code").as("hi"))
      .collect()
    assert(bySub.length == 8)
    bySub.foreach { r =>
      assert(r.getAs[Long]("n") <= 16 && r.getAs[Long]("n") >= 2)
      assert(r.getAs[Int]("lo") >= 0 && r.getAs[Int]("hi") < 16)
    }
    val enc = Pq.encode(corpus, cb, m = 8, dim = 64)
    assert(enc.count() == corpus.count())
    val badLen = enc.filter(size($"codes") =!= 8).count()
    assert(badLen == 0)
  }

  test("ADC lookup-sum equals the direct sum of subspace dot products") {
    // the flattened-table + PqAdcScore path must reproduce, exactly,
    // what it tabulates: sum over subspaces of q_sub · codebook[code]
    val cb = Pq.trainCodebooks(corpus, m = 8, k = 16, dim = 64).cache()
    val queries = corpus.filter($"vid" < 10)
    val adc = Pq.encode(corpus, cb, m = 8, dim = 64)
      .join(broadcast(Pq.queryTables(queries, cb, m = 8, k = 16, dim = 64)
        .select($"vid".as("q_vid"), $"qtab")))
      .select($"q_vid", $"vid",
        PqAdcScore.pq_adc($"codes", $"qtab", 16).as("adc"))
    // independent recomputation: join each (vid, sub, code) assignment
    // with the codebook and the query subvectors, sum the dot products
    val assigned = Pq.encode(corpus, cb, m = 8, dim = 64)
      .select($"vid", posexplode($"codes"))
      .select($"vid", $"pos".cast("int").as("sub"), $"col".as("code"))
    val direct = assigned
      .join(cb, Seq("sub", "code"))
      .join(Pq.subvectors(queries, m = 8, dim = 64)
        .select($"vid".as("q_vid"), $"sub", $"sqv".as("q_sqv")), Seq("sub"))
      .groupBy($"q_vid", $"vid")
      .agg(sum(dotQ($"q_sqv", $"c_sqv")).as("direct"))
    val diff = adc.join(direct, Seq("q_vid", "vid"))
      .filter($"adc" =!= $"direct").count()
    assert(diff == 0)
    cb.unpersist()
  }

  test("codebooks, codes and ADC ranking are partitioning-invariant") {
    val cb1 = Pq.trainCodebooks(corpus, m = 8, k = 16, dim = 64)
    val cb2 = Pq.trainCodebooks(corpus.repartition(13), m = 8, k = 16, dim = 64)
    assert(cb1.orderBy($"sub", $"code").collect().toSeq ==
      cb2.orderBy($"sub", $"code").collect().toSeq)
    val q = corpus.filter($"vid" < 50)
    val r1 = Pq.adcTopK(q, corpus, topK = 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    val r2 = Pq.adcTopK(q, corpus.repartition(7), topK = 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(r1 == r2)
  }

  test("ADC recall against exact brute force clears the gate bound") {
    val queries = corpus.filter($"vid" < 100)
    val approx = Pq.adcTopK(queries, corpus, topK = 5)
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 5)
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / truth.count()
    // q91's audit bound is 0.25; require headroom here so corpus
    // drift shows up in the spec before it flips the gate
    assert(recall >= 0.35, s"ADC recall $recall")
  }

  test("IVF-PQ prunes to probed cells yet clears the same recall bound") {
    val queries = corpus.filter($"vid" < 100)
    val approx = Pq.ivfAdcTopK(queries, corpus, topK = 5)
    val truth = Similarity.bruteForceTopK(queries, corpus, k = 5)
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / truth.count()
    assert(recall >= 0.3, s"IVF-PQ recall $recall")
    // pruning really happened: every reported neighbor's cell was probed
    val centroids = Similarity.coarseCentroids(corpus, 50, 64, 2)
    val memberCells = Similarity.cellsFor(corpus, centroids, 1, "m_")
      .select($"m_vid".as("neighbor_id"), $"cid")
    val probedCells = Similarity.cellsFor(queries, centroids, 3, "q_")
      .select($"q_vid".as("query_id"), $"cid")
    val outside = approx.join(memberCells, Seq("neighbor_id"))
      .join(probedCells, Seq("query_id", "cid"), "left_anti").count()
    assert(outside == 0, "a neighbor came from an unprobed cell")
  }

  test("persisted PQ: append with frozen codebooks == encoding the union") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-pq-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-pq-b").toString
    val half1 = corpus.filter($"vid" % 2 === 0)
    val half2 = corpus.filter($"vid" % 2 =!= 0)
    Pq.buildPqIndex(half1, dirA)
    Pq.appendPqIndex(spark, half2, dirA)
    // B shares A's frozen codebooks AND layout meta; the union
    // encodes in one shot
    for (sub <- Seq("codebooks", "meta"))
      spark.read.parquet(s"$dirA/$sub")
        .write.mode("overwrite").parquet(s"$dirB/$sub")
    Pq.appendPqIndex(spark, half1.unionAll(half2), dirB)
    def probe(d: String) =
      Pq.pqProbeIndexed(spark, d, corpus.filter($"vid" < 200), topK = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(dirA) == probe(dirB), "refresh path must equal one-shot encode")
    assert(probe(dirA).nonEmpty)
  }

  test("persisted PQ: the index owns its (m, k, dim) layout meta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-m4").toString
    // non-default m: append and probe must follow the RECORDED meta,
    // not a caller-passed constant (neither call takes one anymore)
    Pq.buildPqIndex(corpus.filter($"vid" % 2 === 0), dir, m = 4, k = 16)
    assert(spark.read.parquet(s"$dir/meta")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((4, 16, 64)))
    Pq.appendPqIndex(spark, corpus.filter($"vid" % 2 =!= 0), dir)
    // m=4 codes really are 4 entries wide — append encoded in the
    // build's layout
    import org.apache.spark.sql.functions.size
    assert(spark.read.parquet(s"$dir/codes")
      .select(size($"codes")).distinct().collect().map(_.getInt(0)).toSeq ==
      Seq(4))
    val out = Pq.pqProbeIndexed(spark, dir, corpus.filter($"vid" < 100), topK = 3)
    assert(out.count() > 0)
  }

  test("the ADC scans rank with a bounded partial aggregate, no window") {
    val q = corpus.filter($"vid" < 20)
    for (df <- Seq(Pq.adcTopK(q, corpus, topK = 5),
        Pq.ivfAdcTopK(q, corpus, topK = 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"no candidate window expected:\n$p")
      assert(p.toLowerCase.contains("partial_topkagg"),
        s"expected map-side partial top-k aggregate:\n$p")
      assert(!p.contains("CartesianProduct"), s"bad join shape:\n$p")
    }
  }
}
