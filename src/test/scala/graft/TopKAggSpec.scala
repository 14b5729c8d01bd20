package graft

import graft.functions.{TopKAgg, TopKState}
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the ordering contract of the shared ANN ranking primitive
  * ([[TopKAgg]], under q35/q36/q42): score order must match Spark
  * SQL's double ordering — NaN greatest, -0.0 == 0.0 — with ties
  * broken by id ascending, so the aggregate is interchangeable with
  * the `row_number()` window idiom it replaced.
  */
class TopKAggSpec extends SparkSpec {

  /** The window-idiom oracle over an arbitrary (query_id, cand_id,
    * cos) candidate frame: Spark's own sort order is the ground truth
    * TopKAgg must reproduce.
    */
  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"))
  }

  test("zero-norm embedding (NaN cosine) through bruteForceTopK matches the window oracle") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    // vec 3 has zero norm, so cosine(q, 3) = 0/0 = NaN for every query
    // (and every cosine is NaN for query 3). A >/== comparator here
    // violates the TimSort contract; a raw Double.compare survives but
    // must still agree with Spark's NaN-greatest sort.
    val raw = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f)), // zero norm
      (4L, Array(0.5f, 0.5f, 0f)),
      (5L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val corpus = Similarity.prepare(raw, "vec_id", "embedding").cache()

    // (a) no sort-contract exception
    val got = Similarity.bruteForceTopK(corpus, corpus, 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // (b) NaN ranks greatest: the zero-norm vector is every query's #1
    for (q <- Seq(0L, 1L, 2L, 4L, 5L))
      assert(got.contains((q, 1L, 3L)), s"query $q should rank NaN (vec 3) first")
    // for query 3 ALL cosines are NaN — pure id tie-break
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3)) ==
      Set((1L, 0L), (2L, 1L), (3L, 2L)))

    // (c) full parity with the row_number window oracle on the same frame
    val scored = broadcast(
        corpus.select($"vid".as("query_id"), $"qv".as("q_qv"), $"nrm".as("q_nrm")))
      .join(corpus, $"query_id" =!= $"vid")
      .select($"query_id", $"vid".as("cand_id"),
        cosineQ($"q_qv", $"qv", $"q_nrm", $"nrm").as("cos"))
    val want = windowTopK(scored, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("-0.0 and 0.0 tie at a k boundary exactly like Spark's ordering") {
    import spark.implicits._
    // Spark treats -0.0 == 0.0 (SQLOrderingUtil), so the k=2 cut must
    // fall to the id tie-break: {1, 2}. A bare java.lang.Double.compare
    // ranks 0.0 above -0.0 and would pick {1, 4} instead.
    val scored = Seq(
      (7L, 1L, 0.0), (7L, 2L, -0.0), (7L, 3L, -0.0), (7L, 4L, 0.0)
    ).toDF("query_id", "cand_id", "cos").repartition(3)
    val got = scored.groupBy($"query_id")
      .agg(TopKAgg.topk_by_score($"cos", $"cand_id", 2).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", ($"pos" + 1).cast("long").as("rank"), $"col.id".as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1L, 1L), (7L, 2L, 2L)))
    val want = windowTopK(scored, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("TopKState compaction keeps a total order under NaN, infinities and signed zeros") {
    // enough entries to force several mid-stream compactions (stage = 2k)
    val st = new TopKState(4)
    val scores = Seq(
      Double.NaN, 1.0, -0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN, 0.5, -0.5, 0.0, -0.0, 2.0, Double.NaN, 1.5, -1.5, 3.0,
      Double.MinPositiveValue, -Double.MinPositiveValue, 0.25, -0.25)
    scores.zipWithIndex.foreach { case (s, i) => st.add(s, i.toLong) }
    st.compact()
    val kept = (0 until st.n).map(i => (st.scores(i), st.ids(i)))
    // NaN > +Inf > finite; among the three NaNs ids ascend
    assert(kept.map(_._2) == Seq(0L, 6L, 12L, 4L))
    assert(kept.take(3).forall(_._1.isNaN))
    assert(kept(3)._1 == Double.PositiveInfinity)
  }
}
