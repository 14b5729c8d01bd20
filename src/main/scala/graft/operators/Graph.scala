package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the link-graph side of
  * corpus curation (PageRank-style quality/centrality signals are a
  * standard web-corpus filtering input).
  */
object Graph {

  /** PageRank in EXACT integer fixed-point arithmetic: ranks are
    * BIGINTs at `scale` (1.0 == scale), each iteration computing
    *
    *   pr'(v) = (1−d)·scale  +  Σ_{u→v} ⌊d · pr(u) / outdeg(u)⌋
    *
    * with d = dampNum/dampDen and the floor division applied per
    * contribution — every operation is BIGINT multiply/floor-divide/
    * sum, so the result after a FIXED iteration count is deterministic
    * under any partitioning and re-derivable by a plain-SQL oracle
    * (unrolled, one CTE per iteration). Dangling nodes (no out-edges)
    * simply leak their mass, the standard simplification; quantization
    * error is bounded by one unit per in-edge per iteration.
    *
    * Scale shape: out-degrees and ranks are node-cardinality frames;
    * each iteration is one shuffle of edge contributions on dst (the
    * join with ranks broadcasts when nodes fit, hash-partitions on src
    * otherwise — Catalyst/AQE picks), and `localCheckpoint` flattens
    * the lineage per round exactly like the q44 cluster propagation,
    * keeping plan size constant over iterations.
    *
    * @param edges (src, dst) BIGINT edge list.
    * @return (node, pr) for every node appearing in `edges`.
    */
  def pageRankFixed(edges: DataFrame, iterations: Int,
      scale: Long = 1000000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampNum > 0 && dampDen > dampNum, "need 0 < dampNum < dampDen")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val base = (dampDen - dampNum) * scale / dampDen // exact: positive floor
    var pr = nodes.withColumn("pr", lit(scale))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          expr(s"(${dampNum}L * pr) div (${dampDen}L * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_sum"), lit(0L))).as("pr"))
        .localCheckpoint()
      i += 1
    }
    pr
  }
}
