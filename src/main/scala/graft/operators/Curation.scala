package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** End-to-end corpus curation funnel — the composition a training-data
  * pipeline actually runs (language filter → quality filter → exact
  * dedup → benchmark decontamination), with the per-stage audit counts
  * a production ingest must report (every dropped row accounted to the
  * stage that dropped it).
  *
  * Scale shape: the two filters are map-side (no shuffle); dedup is
  * one content-keyed shuffle (at corpus scale key it by a 64/128-bit
  * content hash so the exchange carries 8-byte keys — here the gate
  * groups by the text itself so the DuckDB oracle can re-derive the
  * stage); decontamination is the [[Dedup.contaminationScan]] inverted
  * n-gram join with the eval side broadcast. The audit counts ride the
  * SAME job as the final stage via `observe()` metrics — ONE pass over
  * the corpus, not one scalar-agg job per stage (5 scans of raw at
  * 100 TB).
  */
object Curation {

  /** The named stage frames, raw-to-final. */
  private def stages(docs: DataFrame, lang: String, n: Int,
      evalMod: Long): Seq[(String, DataFrame)] = {
    val s1 = docs.filter($"lang" === lang)
    val s2 = s1.filter(TextFunctions.isQuality($"text"))
    val s3 = s2.groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"text")
    val evalSet = docs.filter($"doc_id" % evalMod === 0)
    val contaminated = Dedup.contaminationScan(s3, evalSet, "doc_id", "text", n)
      .select($"doc_id")
    val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
    Seq("raw" -> docs, "lang" -> s1, "quality" -> s2,
      "dedup" -> s3, "decontaminated" -> s4)
  }

  /** The surviving documents after all four stages. */
  def curate(docs: DataFrame, lang: String, n: Int = 4,
      evalMod: Long = 97L): DataFrame =
    stages(docs, lang, n, evalMod).last._2

  /** Leakage-safe train/validation split: near-duplicate documents
    * must land on the SAME side, or the held-out set silently overlaps
    * training data through paraphrase-level copies — the internal twin
    * of the external-benchmark decontamination [[Dedup
    * .contaminationScan]] guards. Assignment is per-CLUSTER, not
    * per-document: docs cluster by n-gram-Jaccard connected components
    * ([[Dedup.ngramJaccardPairs]] → [[Dedup.clusterReps]]), singletons
    * are their own cluster, and the side is a DETERMINISTIC modular
    * hash of the cluster representative — reproducible run-to-run,
    * engine-exact for the oracle (no `rand()`), and uniform enough for
    * an 80/20 split because reps are arbitrary doc ids. Returns
    * (doc_id, rep, side) for every input document.
    *
    * Scale shape: clustering runs COLLAPSE-FIRST
    * ([[Dedup.collapsedClusterReps]] — output-identical to the direct
    * q44 pipeline by its oracle): exact-dup groups collapse before the
    * pair join, so a replicated web corpus costs pairs over UNIQUE
    * contents, not d² over copies (the q125-vs-q44 lesson at sf10).
    * Label propagation is the min-label loop whose per-round join is
    * exchange-free; the final assignment is one left join on doc id
    * plus a narrow hash — nothing quadratic or driver-bound.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, trainPct: Int = 80): DataFrame = {
    val reps = Dedup.collapsedClusterReps(docs, idCol, textCol, n, threshold)
    docs.select(col(idCol).as("doc"))
      .join(reps, Seq("doc"), "left")
      .select($"doc".as("doc_id"), coalesce($"cluster_rep", $"doc").as("rep"))
      // LCG-style modular hash, exact in int64 (rep folded below 2^20
      // first so the multiply cannot overflow) — identical arithmetic
      // runs in the DuckDB oracle
      .withColumn("side",
        when((($"rep" % 1000003L) * 1103515245L + 12345L) % 1000L <
            lit(trainPct * 10L), lit("train"))
          .otherwise(lit("valid")))
  }

  /** INCREMENTAL leakage-safe split — [[leakageSafeSplit]] for the
    * everyday shape at 100 TB, where the corpus already carries a
    * standing train/valid assignment and a NEW crawl batch must join
    * it without re-running corpus-wide clustering: each batch
    * document probes the persisted near-dup index
    * ([[Dedup.nearDupBestIndexed]] — candidate generation and the
    * exact verify follow unique content, cost follows the BATCH) and
    *  - a matched document INHERITS the side of its best match
    *    (highest jaccard, ties to the smallest indexed doc id) from
    *    the standing `sides` table — so a paraphrase of training
    *    data cannot land in validation;
    *  - an unmatched document is its own singleton cluster and takes
    *    the SAME deterministic LCG-of-rep side rule as
    *    [[leakageSafeSplit]] (rep = its own id), so batch and
    *    one-shot assignments agree on fresh content.
    * Residual risk, named: a batch document that BRIDGES two standing
    * clusters on different sides takes its best match's side — the
    * standing assignment is never rewritten (append-only contract);
    * a periodic full re-split reconciles bridges.
    * Returns (doc_id, best_b = null for fresh content, side).
    * FAILS (raise_error, job abort) if a matched best_b has no row in
    * `sides` — an out-of-sync index/assignment pair must be repaired,
    * not silently coalesced into the fresh-content rule.
    */
  def incrementalSplitAssign(spark: org.apache.spark.sql.SparkSession,
      idxDir: String, batch: DataFrame, sides: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      trainPct: Int = 80): DataFrame = {
    val best = Dedup.nearDupBestIndexed(spark, idxDir, batch,
        idCol, textCol, threshold)
      .select($"a".as("doc_id"), $"best_b")
    batch.select(col(idCol).as("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .join(sides.select($"doc_id".as("best_b"),
        $"side".as("match_side")), Seq("best_b"), "left")
      .select($"doc_id", $"best_b",
        coalesce($"match_side",
          // a MATCHED doc whose best_b has no side means the index
          // and the standing assignment are out of sync — in a
          // leakage-safety operator, silently falling through to the
          // fresh-content rule could place a near-duplicate of
          // training data in validation; refuse instead
          when($"best_b".isNotNull, raise_error(concat(
            lit("incrementalSplitAssign: best match "), $"best_b",
            lit(" of doc "), $"doc_id",
            lit(" has no side in the standing assignment — " +
              "near-dup index and sides table are out of sync")))),
          when((($"doc_id" % 1000003L) * 1103515245L + 12345L) % 1000L <
              lit(trainPct * 10L), lit("train"))
            .otherwise(lit("valid"))).as("side"))
  }

  /** The fresh-content (singleton) rule of [[incrementalSplitAssign]]
    * applied to a whole batch — the bootstrap form for the FIRST batch
    * of a standing split directory, where no index exists yet and
    * every document is its own cluster. Same output schema
    * (doc_id, best_b = null, side) and bit-identical side values to
    * what [[incrementalSplitAssign]] would emit for unmatched docs.
    */
  def leakageSafeSplitSingletons(batch: DataFrame, idCol: String,
      trainPct: Int = 80): DataFrame =
    batch.select(col(idCol).as("doc_id"),
      lit(null).cast("long").as("best_b"),
      when((($"doc_id" % 1000003L) * 1103515245L + 12345L) % 1000L <
          lit(trainPct * 10L), lit("train"))
        .otherwise(lit("valid")).as("side"))

  /** Compact a standing split directory's per-batch `sides` segments
    * to one row per document — the [[LangModel.compactLmCounts]]
    * treatment (staged swap, checked renames, unlogged-delta sweep)
    * for the assignment table
    * ([[graft.streaming.StreamingIndex.applySplitBatch]] appends one
    * segment per batch). Each doc is assigned in exactly ONE batch, so
    * the fold is a pass-through grouped by doc (min(struct) makes it
    * deterministic even against a corrupted double-assignment);
    * probes and side inheritance are identical before and after.
    * The near-dup tables in the same dir are
    * [[Dedup.compactNearDupIndex]]'s job — call both for a full
    * directory compaction.
    */
  def compactSplitAssign(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    def merged() = spark.read.parquet(s"$dir/sides")
      .groupBy($"doc_id")
      .agg(min(struct($"side", $"best_b")).as("m"))
      .select($"doc_id", $"m.best_b", $"m.side")
    LangModel.compactTables(spark, dir, Seq("sides" -> (() => merged())))
  }

  /** Stage-by-stage audit counts: (stage, stage_name, n), computed in
    * ONE job. `observe()` checkpoints on the raw→lang→quality→dedup
    * chain feed the left side of the final anti-join; the single
    * `count()` action fires every upstream metric, so the corpus is
    * scanned once instead of once per stage. The contamination branch
    * re-derives the dedup frame WITHOUT observes — a re-referenced
    * CollectMetrics subtree would double-fire its metric (and Spark's
    * physical reuse typically dedupes the repeated exchange anyway).
    * The returned frame is a materialized 5-row local result.
    */
  def funnel(docs: DataFrame, lang: String, n: Int = 4,
      evalMod: Long = 97L): DataFrame = {
    import org.apache.spark.sql.Observation
    val names = Seq("raw", "lang", "quality", "dedup", "decontaminated")
    val obs = names.init.map(nm => nm -> Observation()).toMap

    def dedupStage(d: DataFrame): DataFrame =
      d.filter($"lang" === lang)
        .filter(TextFunctions.isQuality($"text"))
        .groupBy($"text").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id", $"text")

    val docsO = docs.observe(obs("raw"), count(lit(1)).as("n"))
    val s1 = docsO.filter($"lang" === lang)
      .observe(obs("lang"), count(lit(1)).as("n"))
    val s2 = s1.filter(TextFunctions.isQuality($"text"))
      .observe(obs("quality"), count(lit(1)).as("n"))
    val s3 = s2.groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"text")
      .observe(obs("dedup"), count(lit(1)).as("n"))

    val evalSet = docs.filter($"doc_id" % evalMod === 0)
    val contaminated = Dedup
      .contaminationScan(dedupStage(docs), evalSet, "doc_id", "text", n)
      .select($"doc_id")
    val nDecontaminated = s3.join(contaminated, Seq("doc_id"), "left_anti").count()

    val spark = docs.sparkSession
    import spark.implicits._
    names.zipWithIndex.map { case (nm, i) =>
      val cnt =
        if (nm == "decontaminated") nDecontaminated
        else obs(nm).get("n").asInstanceOf[Long]
      (i.toLong, nm, cnt)
    }.toDF("stage", "stage_name", "n")
  }
}
