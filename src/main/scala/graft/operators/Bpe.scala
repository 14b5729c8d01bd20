package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich et al. 2016 —
  * public algorithm) — the tokenizer-building step of a training-data
  * pipeline, engine extension beyond the reference (SURVEY.md §7.1
  * item 8 family).
  *
  * Scale shape (the whole design): the corpus NEVER participates in
  * training beyond one word-frequency aggregation — the same
  * Heaps'-law collapse as the collapse-first dedup family. A 100 TB
  * corpus collapses to its unique-word table (~10⁸ rows at web
  * scale) in one shuffle; every training round then runs on that
  * table alone:
  *
  *   1. pair counts: map-side [[graft.functions.BpePairs]] explode +
  *      one partial-aggregated groupBy (pair cardinality ≤ vocab², in
  *      practice tiny);
  *   2. argmax: TakeOrdered of ONE row (count desc, then (l, r)
  *      lexicographic — deterministic across any partitioning);
  *   3. merge application: map-side [[graft.functions.BpeMergeApply]]
  *      with the driver-chosen pair embedded (the k-means-centroid
  *      pattern — Lloyd's rounds in Similarity.scala are the
  *      precedent for driver-looped training with k-bounded state).
  *
  * `localCheckpoint` per round keeps lineage flat (the Graph.scala
  * pattern). Encoding the corpus afterwards is a pure map
  * ([[graft.functions.BpeEncode]] carries the merge list as a
  * reference object) — zero shuffles over the 100 TB side.
  */
object Bpe {

  /** One learned merge: `left + right → left||right`, with the
    * greedy-application count that ranked it (see [[graft.functions.BpeOps]]
    * for the counting convention that makes counts exact).
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Trains `numMerges` merges over a unique-word frequency table
    * (`word: string, freq: long`). Returns the learned merges in rank
    * order and the final symbolized word table
    * (`word, freq, syms: array<string>`), whose `syms` equal
    * [[graft.functions.BpeEncode]] of `word` by construction —
    * the q155 gate audits that equality through a genuinely separate
    * evaluation.
    */
  def train(words: DataFrame, numMerges: Int): (Seq[Merge], DataFrame) = {
    import graft.functions.{BpeChars, BpeMergeApply, BpePairs}
    var cur = words
      .select(col("word"), col("freq"), BpeChars.bpe_chars(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = cur
        .select(explode(BpePairs.bpe_pairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("p.n") * col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) <= 0L) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        // checkpoint every 5th round, not every round: unlike the
        // clusterReps loop the lineage here is a LINEAR chain (one
        // bpe_merge expression per round, the frame referenced once),
        // so analysis stays cheap and the only cost of a longer chain
        // is re-applying <= 4 cheap map-side merges inside the next
        // pair-count job — while each skipped checkpoint saves a whole
        // materialization job per round (the q155 gate wall was ~2
        // jobs/round on a vocabulary-sized table)
        cur = cur.withColumn("syms", BpeMergeApply.bpe_merge(col("syms"), l, r))
        if (rank % 5 == 0) cur = cur.localCheckpoint()
        rank += 1
      }
    }
    (merges.toSeq, cur)
  }

  /** Corpus → unique-word frequency table (the one corpus-sized
    * shuffle of the whole training pipeline).
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
}
