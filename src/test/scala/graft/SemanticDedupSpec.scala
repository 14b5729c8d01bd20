package graft

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private def corpusOf(vecs: (Long, Array[Float])*) =
    Similarity.prepare(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")

  test("keep-first-by-id: each similarity group keeps its smallest id") {
    // two tight direction groups + one singleton, far apart
    val corpus = corpusOf(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.999f, 0.01f, 0f, 0f),
      2L -> Array(0.998f, 0.02f, 0f, 0f),
      3L -> Array(0f, 1f, 0f, 0f),
      4L -> Array(0f, 0.999f, 0.01f, 0f),
      5L -> Array(0f, 0f, 1f, 0f))
    // single cluster (stride > corpus, untrained) isolates the dedup rule
    val res = Similarity.semanticDedup(corpus, tau = 0.95, dim = 4,
        centroidStride = 100, trainIters = 0)
      .select($"vid", $"keep_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(res == Map(0L -> None, 1L -> Some(0L), 2L -> Some(0L),
      3L -> None, 4L -> Some(3L), 5L -> None))
  }

  test("chains drop transitively-reachable members even when the middle is dropped") {
    // x1 within tau of x0 and x2; x0 vs x2 below tau. keep-first drops
    // x1 (by x0) AND x2 (by x1 — a smaller-id similar neighbor exists,
    // kept or not). Pin this: semantic dedup collapses CHAINS, the
    // same contract exact-dedup's min-id-per-group has.
    val th1 = math.toRadians(15); val th2 = math.toRadians(30)
    val corpus = corpusOf(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(math.cos(th1).toFloat, math.sin(th1).toFloat, 0f, 0f),
      2L -> Array(math.cos(th2).toFloat, math.sin(th2).toFloat, 0f, 0f))
    val res = Similarity.semanticDedup(corpus, tau = 0.95, dim = 4,
        centroidStride = 100, trainIters = 0)
      .select($"vid", $"keep_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(res == Map(0L -> None, 1L -> Some(0L), 2L -> Some(1L)))
  }

  test("audit invariants hold on the sf corpus with trained clusters") {
    val tau = 0.92
    val corpus = Similarity.prepare(
      Tables(spark, sf).embeddings, "vec_id", "embedding")
    val res = Similarity.semanticDedup(corpus, tau = tau, dim = 64,
      centroidStride = 50, trainIters = 2).localCheckpoint()
    val withVec = res.join(corpus, Seq("vid")).cache()

    assert(res.count() == corpus.count(), "one row per vector")
    assert(res.select($"vid").distinct().count() == corpus.count())

    // every drop really has its smaller-id same-cluster neighbor at >= tau
    val badDrops = withVec.filter($"keep_id".isNotNull).as("d")
      .join(withVec.as("k"), col("d.keep_id") === col("k.vid"))
      .filter(!(col("d.keep_id") < col("d.vid") &&
        col("k.cid") === col("d.cid") &&
        cosineQ(col("d.qv"), col("k.qv"), col("d.nrm"), col("k.nrm")) >= tau))
      .count()
    assert(badDrops == 0)

    // the kept set has no remaining within-cluster near-dup pair
    val kept = withVec.filter($"keep_id".isNull)
    val dirty = kept.as("x").join(kept.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .filter(cosineQ(col("x.qv"), col("y.qv"),
        col("x.nrm"), col("y.nrm")) >= tau)
      .count()
    assert(dirty == 0)
    withVec.unpersist()
  }

  test("the semantic-dedup plan broadcasts centroids; pair join is cid-keyed") {
    val corpus = Similarity.prepare(
      Tables(spark, sf).embeddings, "vec_id", "embedding")
    val plan = Similarity.semanticDedup(corpus, tau = 0.92, dim = 64,
      centroidStride = 50, trainIters = 0).queryExecution.executedPlan.toString
    // corpus × broadcast(centroids) is the intended broadcast cross
    // (same shape as IVF's scorer); what must NOT appear is a
    // non-broadcast cartesian — the within-cluster self-join has to
    // stay an equi-join on cid.
    assert(!plan.contains("CartesianProduct"), s"bad join shape:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"centroid side should broadcast:\n$plan")
    assert(plan.contains("cid"), s"pair join should key on cid:\n$plan")
  }

  test("collapse-first equals direct on a replicated corpus") {
    // the ScaleUp shape: every embedding appears 3x under offset ids.
    // Centroids train on the full replicated corpus on BOTH paths, so
    // clustering is identical and the reduction must match row-for-row
    // (vid, cid, keep_id), including cross-group keep_ids where a
    // replica's keeper lives in a DIFFERENT exact-dup group.
    val base = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding")
    val dup = base
      .unionAll(base.select($"vec_id" + 1000000, $"embedding"))
      .unionAll(base.select($"vec_id" + 2000000, $"embedding"))
    val corpus = Similarity.prepare(dup, "vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"vid", $"cid", $"keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    // tau = 0.4: the smallest threshold with real cross-vector pairs
    // in this corpus (>= 0.5 has none), so cross-group keep_ids exist
    val direct = key(Similarity.semanticDedup(corpus, tau = 0.4, dim = 64,
      centroidStride = 50, trainIters = 2))
    val collapsed = key(Similarity.collapsedSemanticDedup(corpus, tau = 0.4,
      dim = 64, centroidStride = 50, trainIters = 2))
    assert(collapsed == direct)
    // replication really created cross-group drops (keep_id pointing
    // outside the dropped vector's own 3-replica id family)
    assert(direct.exists { case (vid, _, keep) =>
      keep.exists(k => k % 1000000 != vid % 1000000) })
  }

  test("unique-trained equals direct on a duplicate-free corpus") {
    // with no duplicates reps == corpus, so the quantizer trains on
    // the same rows with the same parameters and the reduction is
    // row-identical to the direct form
    val corpus = Similarity.prepare(
      Tables(spark, sf).embeddings, "vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"vid", $"cid", $"keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    val direct = key(Similarity.semanticDedup(corpus, tau = 0.4, dim = 64,
      centroidStride = 50, trainIters = 2))
    val unique = key(Similarity.uniqueTrainedSemanticDedup(corpus, tau = 0.4,
      dim = 64, centroidStride = 50, trainIters = 2))
    assert(unique == direct)
  }

  test("unique-trained on a replicated corpus: audits hold, every copy drops") {
    val tau = 0.92
    val base = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding")
    val dup = base
      .unionAll(base.select($"vec_id" + 1000000, $"embedding"))
      .unionAll(base.select($"vec_id" + 2000000, $"embedding"))
    val corpus = Similarity.prepare(dup, "vec_id", "embedding")
    val res = Similarity.uniqueTrainedSemanticDedup(corpus, tau = tau,
      dim = 64, centroidStride = 50, trainIters = 2).localCheckpoint()
    val withVec = res.join(corpus, Seq("vid")).cache()
    assert(res.count() == corpus.count(), "one row per vector")
    // every replica beyond its group's min id drops (cos(v,v) = 1 in
    // the same cell), with keep_id at or below the group min
    val undropped = withVec.filter($"vid" >= 1000000 && $"keep_id".isNull)
      .count()
    assert(undropped == 0, "every non-first copy must drop")
    // drops witnessed: smaller-id same-cell neighbor at >= tau
    val badDrops = withVec.filter($"keep_id".isNotNull).as("d")
      .join(withVec.as("k"), col("d.keep_id") === col("k.vid"))
      .filter(!(col("d.keep_id") < col("d.vid") &&
        col("k.cid") === col("d.cid") &&
        cosineQ(col("d.qv"), col("k.qv"), col("d.nrm"), col("k.nrm")) >= tau))
      .count()
    assert(badDrops == 0)
    // kept set pair-clean within cells
    val kept = withVec.filter($"keep_id".isNull)
    val dirty = kept.as("x").join(kept.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .filter(cosineQ(col("x.qv"), col("y.qv"),
        col("x.nrm"), col("y.nrm")) >= tau)
      .count()
    assert(dirty == 0)
    withVec.unpersist()
  }
}
