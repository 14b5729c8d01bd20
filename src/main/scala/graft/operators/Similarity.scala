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

  /** Tile count for the exact tiled joins, from the corpus row count:
    * one tile side ≈ `rowsPerTile` rows (sized so a tile's hash side
    * fits executor memory — ~100k 64-dim quantized vectors ≈ 50 MB),
    * clamped to [32, 4096] so local runs keep parallelism and huge
    * corpora don't explode the tile pairing. Callers that know the
    * count (catalog stats, a prior `count()`) pass it here instead of
    * hand-picking `nBlocks`.
    */
  def blocksFor(corpusRows: Long, rowsPerTile: Long = 100000L): Int =
    math.min(4096L, math.max(32L,
      (corpusRows + rowsPerTile - 1) / rowsPerTile)).toInt

  /** Per-query top-k over a (query_id, cand_id, cos) candidate stream
    * via the bounded [[graft.functions.TopKAgg]] partial aggregate.
    * The `row_number().over(partitionBy(query_id))` idiom this
    * replaces shuffles EVERY candidate row to its query's partition
    * before ranking; the aggregate forwards at most k partial rows per
    * (query, map partition), so shuffle volume is candidate-count
    * independent — the shape that survives a 100× candidate blow-up
    * (hot LSH buckets, wide IVF probes). Ordering contract unchanged:
    * cos desc, id asc.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topk_by_score($"cos", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("neighbor_id"), $"col.score".as("cos"))

  /** Exact top-k cosine neighbors for each query row (excluding self).
    * `queries` and `corpus` are [[prepare]]d frames; the query side is
    * broadcast (it is the small side by construction).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select($"vid".as("query_id"), $"qv".as("q_qv"), $"nrm".as("q_nrm")))
    val pairs = q.join(corpus, $"query_id" =!= $"vid")
      .select($"query_id", $"vid".as("cand_id"),
        cosineQ($"q_qv", $"qv", $"q_nrm", $"nrm").as("cos"))
    rankTopK(pairs, k)
  }

  /** Each row's single nearest neighbor (argmax cosine) — the
    * embedding near-dup primitive. Exact, via a tiled block
    * cross-join: every vector gets a block id (`vid % nBlocks`), the
    * streamed side is replicated once per block, and the tile pairing
    * is an EQUI-join on the block id — so the plan is a shuffled
    * hash/sort-merge join whose tasks each hold one corpus block
    * (bounded memory, even distribution across executors), not a
    * BroadcastNestedLoopJoin of the whole corpus. The argmax is a
    * map-side partial `max(struct(cos, -id))` aggregation, so the only
    * full-width shuffle is O(n·nBlocks) replicated vectors and the
    * post-tile traffic is one (vec_id, best) row per vector per tile —
    * never the O(n²) pair stream.
    *
    * Why exact-tiled and not LSH/IVF candidates: all-NN over
    * embeddings with no cluster structure (this corpus: NN cosine
    * median ≈ 0.37 ≈ the random-pair tail) provably needs ~all pairs
    * for exact answers — measured here, candidate generation only
    * reaches full recall after examining MORE pairs than brute force.
    * The O(n²) dot products are inherent to exactness; tiling fixes
    * what scale actually breaks (memory, skew, shuffle volume). For
    * recall-tolerant workloads use [[lshTopK]]/[[ivfTopK]].
    *
    * At scale pick `nBlocks ≈ n / rowsPerTile` with rowsPerTile sized
    * so a tile's hash side fits in executor memory (~100k 64-dim
    * vectors ≈ 50 MB).
    */
  def nearestNeighbor(corpus: DataFrame, nBlocks: Int = 32): DataFrame = {
    // Upper-triangle tiling (same scheme as [[thresholdPairs]]): each
    // unordered pair's dot product is computed ONCE, then both
    // directions are emitted from the same row via explode — the
    // follow-up shuffle carries narrow (vec, nn, cos) rows into a
    // map-side partial argmax. Halves the dot products vs. the full
    // n² pairing without recomputing the join per direction.
    val blk = pmod($"vid", lit(nBlocks)).cast("int")
    val left = corpus
      .select($"vid".as("x"), $"qv".as("x_qv"), $"nrm".as("x_nrm"), blk.as("x_blk"))
      .withColumn("j", explode(sequence($"x_blk", lit(nBlocks - 1))))
    val right = corpus
      .select($"vid".as("y"), $"qv".as("y_qv"), $"nrm".as("y_nrm"), blk.as("y_blk"))
      .withColumn("i", explode(sequence(lit(0), $"y_blk")))
    left.join(right,
        $"x_blk" === $"i" && $"j" === $"y_blk" &&
          ($"x_blk" =!= $"y_blk" || $"x" < $"y"))
      .select($"x", $"y", cosineQ($"x_qv", $"y_qv", $"x_nrm", $"y_nrm").as("cos"))
      .select(explode(array(
          struct($"x".as("vec_id"), $"y".as("nn"), $"cos"),
          struct($"y".as("vec_id"), $"x".as("nn"), $"cos"))).as("d"))
      .select($"d.vec_id".as("vec_id"), $"d.nn".as("nn"), $"d.cos".as("cos"))
      .groupBy($"vec_id")
      .agg(max(struct($"cos", (-$"nn").as("neg"))).as("best"))
      .select($"vec_id", (-$"best.neg").as("nn_id"), $"best.cos".as("cos"))
  }

  /** All unordered pairs with cosine ≥ `threshold` (exact). Tiled like
    * [[nearestNeighbor]] but over the upper block triangle only: the x
    * side of a pair is replicated to tiles (x_blk, j≥x_blk), the y
    * side to tiles (i≤y_blk, y_blk), and the composite-key equi-join
    * pairs each unordered block tile exactly once — halving the dot
    * products and keeping every tile the same (n/nBlocks)² size (no
    * triangle skew across tasks).
    */
  def thresholdPairs(corpus: DataFrame, threshold: Double,
      nBlocks: Int = 32): DataFrame = {
    val blk = pmod($"vid", lit(nBlocks)).cast("int")
    val left = corpus
      .select($"vid".as("x"), $"qv".as("x_qv"), $"nrm".as("x_nrm"), blk.as("x_blk"))
      .withColumn("j", explode(sequence($"x_blk", lit(nBlocks - 1))))
    val right = corpus
      .select($"vid".as("y"), $"qv".as("y_qv"), $"nrm".as("y_nrm"), blk.as("y_blk"))
      .withColumn("i", explode(sequence(lit(0), $"y_blk")))
    left.join(right,
        $"x_blk" === $"i" && $"j" === $"y_blk" &&
          ($"x_blk" =!= $"y_blk" || $"x" < $"y"))
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"),
        cosineQ($"x_qv", $"y_qv", $"x_nrm", $"y_nrm").as("cos"))
      .filter($"cos" >= threshold)
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
      nTables: Int = 8, nProbe: Int = 1): DataFrame = {
    // Bucket join carries only ids; a pair colliding in m of the
    // nTables tables appears m times, so the distinct runs on NARROW
    // (query, cand) rows and the cosine is computed once per unique
    // pair after re-attaching vectors via two id-keyed joins (small
    // dim tables broadcast; at corpus scale they are plain shuffled
    // equi-joins — still linear).
    //
    // Multi-probe (nProbe > 1, Lv et al. VLDB'07): the QUERY side also
    // visits the nProbe-1 buckets across its lowest-margin planes —
    // recall of ~2× the table count at the cost of nProbe× query-side
    // bucket rows, with the member side (the corpus-sized one)
    // unchanged.
    val bucketed = corpus.select($"vid",
        posexplode(graft.functions.LshBuckets.lsh_buckets($"qv", nTables, nPlanes, dim)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val probed =
      if (nProbe <= 1) bucketed
      else corpus.select($"vid",
          posexplode(graft.functions.LshProbes.lsh_probes($"qv", nTables, nPlanes, dim, nProbe)))
        .select($"vid", (col("pos") / nProbe).cast("int").as("tbl"),
          col("col").as("bucket"))
    val cands = probed.as("x").join(bucketed.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") =!= col("y.vid"))
      .select(col("x.vid").as("query_id"), col("y.vid").as("cand_id"))
      .distinct()
    val scored = cands
      .join(corpus.select($"vid".as("query_id"), $"qv".as("q_qv"), $"nrm".as("q_nrm")), "query_id")
      .join(corpus.select($"vid".as("cand_id"), $"qv".as("c_qv"), $"nrm".as("c_nrm")), "cand_id")
      .select($"query_id", $"cand_id",
        cosineQ($"q_qv", $"c_qv", $"q_nrm", $"c_nrm").as("cos"))
    rankTopK(scored, k)
  }

  /** Lloyd's k-means over the quantized grid — the IVF coarse
    * quantizer trainer. Init is the deterministic stride sample; each
    * round is (broadcast centroids → nearest-centroid argmax as a
    * map-side partial `max(struct)` aggregation → per-cell elementwise
    * mean via [[graft.functions.VecMeanAgg]]). No window shuffle, no
    * posexplode row blow-up: per round the shuffle carries one
    * (dim+1)-long partial per (partition, cell) — the classic scalable
    * k-means shape (centroids broadcast, data never re-partitioned).
    * Rounds materialize via localCheckpoint so the plan doesn't nest
    * (on a cluster with executor churn prefer `checkpoint()`).
    * Empty cells drop out (standard Lloyd's degeneracy handling).
    * Returns (cid, c_qv, c_nrm) — cids are the init sample's vids,
    * stable across rounds; centroid values are deterministic at any
    * partitioning because long sums are exact.
    */
  def trainCentroids(corpus: DataFrame, dim: Int, centroidStride: Int = 50,
      iters: Int = 3): DataFrame = {
    import graft.functions.VecMeanAgg
    var cents = corpus.filter($"vid" % centroidStride === 0)
      .select($"vid".as("cid"), $"qv".as("c_qv"))
    var it = 0
    while (it < iters) {
      val bc = broadcast(cents.withColumn("c_nrm", normQ($"c_qv")))
      cents = corpus.join(bc)
        .withColumn("c_cos", cosineQ($"qv", $"c_qv", $"nrm", $"c_nrm"))
        .groupBy($"vid")
        .agg(max(struct($"c_cos", (-$"cid").as("nc"), $"qv".as("v"))).as("best"))
        .groupBy((-$"best.nc").as("cid"))
        .agg(VecMeanAgg.vec_mean($"best.v", dim).as("c_qv"))
        .localCheckpoint()
      it += 1
    }
    cents.withColumn("c_nrm", normQ($"c_qv"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into cells; queries probe their `nProbe` nearest cells and rank
    * only those cells' members. The two joins are (corpus × centroids)
    * with the centroid side broadcast, and a cell-keyed equi-join —
    * both linear in corpus size. Centroids are the deterministic
    * stride sample by default, or k-means-trained ([[trainCentroids]])
    * when `trainIters > 0` — same assignment/probe machinery, tighter
    * cells, better recall at equal probes.
    */
  /** Broadcast coarse-quantizer centroids — trained k-means when
    * `trainIters > 0`, else the deterministic stride sample. Shared by
    * IVF, IVF-PQ and semantic dedup. */
  private[graft] def coarseCentroids(corpus: DataFrame,
      centroidStride: Int, dim: Int, trainIters: Int): DataFrame =
    broadcast(
      if (trainIters > 0) {
        require(dim > 0, "trained IVF needs the vector dimension")
        trainCentroids(corpus, dim, centroidStride, trainIters)
          .select($"cid", $"c_qv", $"c_nrm")
      } else
        corpus.filter($"vid" % centroidStride === 0)
          .select($"vid".as("cid"), $"qv".as("c_qv"), $"nrm".as("c_nrm")))

  def ivfTopK(corpus: DataFrame, k: Int, centroidStride: Int = 50,
      nProbe: Int = 2, dim: Int = 0, trainIters: Int = 0): DataFrame = {
    val centroids = coarseCentroids(corpus, centroidStride, dim, trainIters)

    val members = cellsFor(corpus, centroids, 1, "m_")   // each vector lives in 1 cell
    val probes = cellsFor(corpus, centroids, nProbe, "q_") // queries probe nProbe cells

    val cands = probes.join(members, Seq("cid"))
      .filter($"q_vid" =!= $"m_vid")
      .select($"q_vid".as("query_id"), $"m_vid".as("cand_id"),
        cosineQ($"q_qv", $"m_qv", $"q_nrm", $"m_nrm").as("cos"))
      .distinct()
    rankTopK(cands, k)
  }

  /** Cell assignment against a broadcast centroid set — argmax
    * centroid cosine (deterministic ties by cid). `n == 1` is the
    * member-side single-cell argmax (the same map-side partial
    * `max(struct)` shape trainCentroids uses: one partial row per
    * (partition, vid) instead of a full row_number window shuffle over
    * corpus×centroid scored rows); `n > 1` is the probe-side top-n via
    * the bounded TopKAgg partial aggregate — one k-bounded partial row
    * per (vid, map partition). qv/nrm are functionally dependent on
    * vid (`any_value` is deterministic here), so the group stays
    * narrow. Shared by IVF and the IVF-PQ composition.
    */
  private[graft] def cellsFor(df: DataFrame, centroids: DataFrame,
      n: Int, outPrefix: String): DataFrame = {
    val scored = df.join(centroids)
      .withColumn("c_cos", cosineQ($"qv", $"c_qv", $"nrm", $"c_nrm"))
    if (n == 1)
      scored.groupBy($"vid")
        .agg(max(struct($"c_cos", (-$"cid").as("nc"),
          $"qv".as("v"), $"nrm".as("nm"))).as("best"))
        .select($"vid".as(s"${outPrefix}vid"), $"best.v".as(s"${outPrefix}qv"),
          $"best.nm".as(s"${outPrefix}nrm"), (-$"best.nc").as("cid"))
    else
      scored.groupBy($"vid")
        .agg(
          graft.functions.TopKAgg.topk_by_score($"c_cos", $"cid", n).as("cells"),
          any_value($"qv").as("v"), any_value($"nrm").as("nm"))
        .select($"vid".as(s"${outPrefix}vid"), $"v".as(s"${outPrefix}qv"),
          $"nm".as(s"${outPrefix}nrm"), explode($"cells.id").as("cid"))
  }

  /** PERSISTED IVF index — the q116 persisted-BM25 story for vectors:
    * at 100 TB you train the coarse quantizer once, not per query
    * batch. `build` trains centroids and writes (centroids, members
    * partitioned by cell); `append` assigns a delta against the
    * FROZEN centroids (no retrain — append-then-probe is provably
    * identical to assigning the union against the same centroids,
    * SimilaritySpec pins it) and appends only delta-sized files;
    * `probe` broadcasts the centroid table, restricts the member scan
    * to the probed cells via an IN-list (partition pruning on the
    * cid directory layout — the probe reads probed cells only, not
    * the corpus), and ranks with the k-bounded aggregate. Nothing
    * scales with corpus × queries; the cell-id collect is bounded by
    * queries × nProbe (the θ-seed pattern). Centroid drift from
    * frozen-centroid appends is the standard IVF trade (FAISS `add`)
    * — recall is the gate's audited contract, not cell assignment.
    */
  def buildIvfIndex(corpus: DataFrame, dim: Int, dir: String,
      centroidStride: Int = 50, trainIters: Int = 2): Unit = {
    val cents = coarseCentroids(corpus, centroidStride, dim, trainIters)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    cellsFor(corpus, cents, 1, "m_")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/members")
  }

  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, dir: String): Unit = {
    val cents = broadcast(spark.read.parquet(s"$dir/centroids"))
    cellsFor(delta, cents, 1, "m_")
      .write.mode("append").partitionBy("cid").parquet(s"$dir/members")
  }

  def ivfProbeIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$dir/centroids"))
    val probes = cellsFor(queries, cents, nProbe, "q_")
    // bounded by |queries| × nProbe — the vocabulary-of-the-query collect
    val cellIds = probes.select($"cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val members = spark.read.parquet(s"$dir/members")
      .withColumn("cid", $"cid".cast("long")) // partition col inference
      .filter($"cid".isin(cellIds: _*))
    val cands = probes.join(members, Seq("cid"))
      .filter($"q_vid" =!= $"m_vid")
      .select($"q_vid".as("query_id"), $"m_vid".as("cand_id"),
        cosineQ($"q_qv", $"m_qv", $"q_nrm", $"m_nrm").as("cos"))
      .distinct()
    rankTopK(cands, k)
  }

  /** Maintenance compaction after repeated appends (the
    * compactBm25Index symmetry): each append adds one file per
    * touched cell, so a long append history fragments the member
    * directories. Rewrite = one shuffle by cell (one file per cell
    * after), swapped in via the storage-agnostic Hadoop FS rename.
    * Probe results are bit-identical before/after (the probe never
    * depends on file layout — SimilaritySpec pins it).
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val tmp = s"$dir/members_compacting"
    spark.read.parquet(s"$dir/members")
      .withColumn("cid", $"cid".cast("long"))
      .repartition($"cid")
      .write.mode("overwrite").partitionBy("cid").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/members")
    fs.delete(live, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), live)
    ()
  }

  /** Semantic deduplication (SemDeDup-shaped): cluster the corpus with
    * the same trained coarse quantizer IVF uses, then WITHIN each
    * cluster drop every vector that has a smaller-id neighbor with
    * cosine >= `tau` (keep-first-by-id — deterministic, no iteration).
    * Returns one row per vector: `(vid, keep_id)` where `keep_id` is
    * the smallest such earlier neighbor for dropped vectors and NULL
    * for kept ones.
    *
    * Scale design: the only non-broadcast join is the within-cluster
    * self-join, keyed on cluster id — quadratic in CLUSTER size, never
    * corpus size. Centroid count grows with the corpus
    * (`centroidStride` fixes the expected cluster population), so the
    * per-cluster pair work stays bounded as the corpus scales; a
    * pathological giant cluster is the same skew class the LSH paths
    * handle with hot-bucket caps and would be split by re-clustering
    * its members. Cluster assignment is the map-side `max(struct)`
    * argmax (one partial row per vector — no window shuffle).
    */
  def semanticDedup(corpus: DataFrame, tau: Double, dim: Int,
      centroidStride: Int = 50, trainIters: Int = 2): DataFrame = {
    val centroids = coarseCentroids(corpus, centroidStride, dim, trainIters)
    val members = cellsFor(corpus, centroids, 1, "")

    val dropped = members.as("x").join(members.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .filter(cosineQ(col("x.qv"), col("y.qv"),
        col("x.nrm"), col("y.nrm")) >= tau)
      .groupBy(col("y.vid").as("vid"))
      .agg(min(col("x.vid")).as("keep_id"))

    members.select($"vid", $"cid").join(dropped, Seq("vid"), "left")
  }

  /** Collapse-first [[semanticDedup]] — the q124/q125 pattern pointed
    * at vectors: group by 64-bit hash of the QUANTIZED vector, run
    * the within-cluster pair join over one representative per
    * distinct vector, and expand labels through membership. Output is
    * provably identical to [[semanticDedup]] (SimilaritySpec pins it
    * on a replicated corpus):
    *
    *  - centroids train on the FULL corpus (training is linear — the
    *    duplicated mass must shape the same centroids the direct path
    *    trains), and identical vectors land in the same cell, so a
    *    group lives in one cell;
    *  - cosine between members equals cosine between their reps, and
    *    within a group cosineQ(v, v) = dot/nrm² ≈ 1 ≥ tau, so with
    *    R(g) = min(rep(g), min similar-rep in cell) the direct rule
    *    keep_id(y) = min{x < y, same cell, cos ≥ tau} reduces to
    *    `R(g) if R(g) < y else NULL` — a rep smaller than y exists in
    *    a similar group iff that group's min (its rep) is smaller.
    *
    * The pair join drops from corpus-quadratic-per-cell to
    * unique-content-quadratic-per-cell; at a duplication factor d
    * that is d² less work, same as the text family.
    */
  def collapsedSemanticDedup(corpus: DataFrame, tau: Double, dim: Int,
      centroidStride: Int = 50, trainIters: Int = 2): DataFrame = {
    val member = corpus.select($"vid", xxhash64($"qv").as("gh"))
    val reps = corpus.groupBy(xxhash64($"qv").as("gh"))
      .agg(min($"vid").as("vid"), first($"qv").as("qv"), first($"nrm").as("nrm"))
    val centroids = coarseCentroids(corpus, centroidStride, dim, trainIters)
    val repCells = cellsFor(reps.select($"vid", $"qv", $"nrm"), centroids, 1, "")
    val minSim = repCells.as("x").join(repCells.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") =!= col("y.vid"))
      .filter(cosineQ(col("x.qv"), col("y.qv"),
        col("x.nrm"), col("y.nrm")) >= tau)
      .groupBy(col("y.vid").as("vid"))
      .agg(min(col("x.vid")).as("min_sim"))
    val gR = repCells.select($"vid", $"cid")
      .join(minSim, Seq("vid"), "left")
      .select($"vid".as("rep"), $"cid",
        least($"vid", coalesce($"min_sim", $"vid")).as("r0"))
    member
      .join(reps.select($"gh", $"vid".as("rep")), "gh")
      .join(gR, "rep")
      .select($"vid", $"cid", when($"r0" < $"vid", $"r0").as("keep_id"))
  }
}
