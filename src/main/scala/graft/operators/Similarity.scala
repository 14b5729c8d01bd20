package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.syntax._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * - Brute force: query-side broadcast × corpus scan — exact, O(n·q),
  *   the right baseline and the verifier for the approximate paths.
  * - LSH (random hyperplanes): deterministic planes hashed from
  *   (plane, dim) indexes; bucket join bounds the candidate set, the
  *   100 TB scale path. Recall measured against brute force in tests.
  *
  * All cosines use quantized integer vectors ([[graft.functions.VectorFunctions]])
  * so results are bit-deterministic at any parallelism.
  */
object Similarity {

  /** Corpus prepared with quantized vectors + norms (do once, reuse). */
  def prepare(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), quantize(col(vecCol)).as("qv"))
      .withColumn("nrm", normQ($"qv"))

  /** Exact top-k cosine neighbors for each query row (excluding self).
    * `queries` and `corpus` are [[prepare]]d frames; the query side is
    * broadcast (it is the small side by construction).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select($"vid".as("query_id"), $"qv".as("q_qv"), $"nrm".as("q_nrm")))
    val pairs = q.join(corpus, $"query_id" =!= $"vid")
      .withColumn("cos", cosineQ($"q_qv", $"qv", $"q_nrm", $"nrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vid")
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vid".as("neighbor_id"), $"cos")
  }

  /** Each row's single nearest neighbor (argmax cosine) — the
    * embedding near-dup primitive.
    */
  def nearestNeighbor(corpus: DataFrame): DataFrame = {
    val a = corpus.select($"vid".as("a"), $"qv".as("a_qv"), $"nrm".as("a_nrm"))
    val pairs = a.join(corpus, $"a" =!= $"vid")
      .withColumn("cos", cosineQ($"a_qv", $"qv", $"a_nrm", $"nrm"))
    val w = Window.partitionBy($"a").orderBy($"cos".desc, $"vid")
    pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"a".as("vec_id"), $"vid".as("nn_id"), $"cos")
  }

  /** Approximate top-k via multi-table LSH: candidates share a bucket
    * in ANY of `nTables` independent hyperplane tables (union boosts
    * recall; each table's join stays bounded by bucket occupancy, so
    * the whole thing scales linearly with corpus size instead of the
    * O(n²) brute-force pair space). Buckets come from one native
    * expression pass ([[graft.functions.LshBuckets]]) — an
    * element_at-per-dim column formulation would be ~2500 expression
    * nodes per union branch and minutes of janino compile time.
    */
  def lshTopK(corpus: DataFrame, dim: Int, nPlanes: Int, k: Int,
      nTables: Int = 8): DataFrame = {
    val bucketed = corpus.select($"vid", $"qv", $"nrm",
        posexplode(graft.functions.LshBuckets.lsh_buckets($"qv", nTables, nPlanes, dim)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val cands = bucketed.as("x").join(bucketed.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") =!= col("y.vid"))
      .select(col("x.vid").as("query_id"), col("y.vid").as("cand_id"),
        cosineQ(col("x.qv"), col("y.qv"), col("x.nrm"), col("y.nrm")).as("cos"))
      .distinct()
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id".as("neighbor_id"), $"cos")
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — every
    * `centroidStride`-th vector serves as a centroid — partitions the
    * corpus into cells; queries probe their `nProbe` nearest cells and
    * rank only those cells' members. The two joins are
    * (corpus × centroids) with the centroid side broadcast, and a
    * cell-keyed equi-join — both linear in corpus size. At real scale
    * the centroids come from k-means; the assignment/probe machinery
    * is identical.
    */
  def ivfTopK(corpus: DataFrame, k: Int, centroidStride: Int = 50,
      nProbe: Int = 2): DataFrame = {
    val centroids = broadcast(
      corpus.filter($"vid" % centroidStride === 0)
        .select($"vid".as("cid"), $"qv".as("c_qv"), $"nrm".as("c_nrm")))

    // cell assignment: argmax centroid cosine (deterministic ties by cid)
    def cellsFor(df: DataFrame, n: Int, outPrefix: String): DataFrame = {
      val scored = df.join(centroids)
        .withColumn("c_cos", cosineQ($"qv", $"c_qv", $"nrm", $"c_nrm"))
      val w = Window.partitionBy($"vid").orderBy($"c_cos".desc, $"cid")
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= n)
        .select($"vid".as(s"${outPrefix}vid"), $"qv".as(s"${outPrefix}qv"),
          $"nrm".as(s"${outPrefix}nrm"), $"cid")
    }

    val members = cellsFor(corpus, 1, "m_")   // each vector lives in 1 cell
    val probes = cellsFor(corpus, nProbe, "q_") // queries probe nProbe cells

    val cands = probes.join(members, Seq("cid"))
      .filter($"q_vid" =!= $"m_vid")
      .select($"q_vid".as("query_id"), $"m_vid".as("cand_id"),
        cosineQ($"q_qv", $"m_qv", $"q_nrm", $"m_nrm").as("cos"))
      .distinct()
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"cand_id".as("neighbor_id"), $"cos")
  }
}
