package graft

import graft.operators.Graph

/** Integer fixed-point PageRank (q105): pinned against an independent
  * in-memory simulation of the same exact arithmetic.
  */
class GraphSpec extends SparkSpec {

  private val Scale = 1000000000L
  private val Base = 150000000L

  private def simulate(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var pr = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        85L * pr(u) / (100L * out(u))
      }.sum).toMap
      pr = nodes.map(n => n -> (Base + in.getOrElse(n, 0L))).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankFixed(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 2-cycle conserves mass exactly: both ranks stay at scale") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assert(run(edges, 5) == Map(1L -> Scale, 2L -> Scale))
  }

  test("asymmetric graphs match the independent integer simulation") {
    // triangle + chain + a dangling sink (5 leaks mass), multi-out node
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L))
    for (iters <- Seq(0, 1, 3, 5))
      assert(run(edges, iters) == simulate(edges, iters), s"iters=$iters")
  }

  test("a dangling sink leaks mass: totals shrink but stay deterministic") {
    val edges = Seq((1L, 2L)) // 2 has no out-edges
    val got = run(edges, 2)
    assert(got == simulate(edges, 2))
    assert(got.values.sum < 2 * Scale, "dangling mass must leak, not recirculate")
  }

  test("partitioning does not change the ranks") {
    import spark.implicits._
    val edges = (0L until 60L).flatMap(i => Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60)))
    val a = run(edges, 4)
    val b = Graph.pageRankFixed(edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a == simulate(edges, 4))
  }
}
