package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** Corpus-trained bigram language-model scoring — the
  * perplexity-filter stage of a training-data pipeline (CCNet /
  * Gopher-style quality filtering): train token-bigram statistics on
  * the corpus itself, then score every document by how SURPRISING its
  * token stream is under the model. Documents whose bigrams are rare
  * relative to their context score high and are the ones a quality
  * funnel inspects or drops.
  *
  * Arithmetic posture (the BM25 lesson, see
  * [[Retrieval.bm25TopK]]): the per-bigram score is the add-one
  * smoothed INVERSE conditional probability in integer fixed point —
  * `SCALE · (c(w1·) + V) div (c(w1 w2) + 1)` — not `-log p`. Inverse
  * probability is a strictly monotone transform of per-bigram
  * surprisal, every step is exact int64 arithmetic, and the summed
  * document score is therefore bit-deterministic at any parallelism
  * AND engine-exact against a SQL oracle; a float `log` would differ
  * in the last ulp between libm implementations and break the gate.
  * (The sum weights heavy-tail bigrams harder than an NLL sum would —
  * for a FILTER that ranks outliers first, that bias is the useful
  * direction.)
  *
  * Scale shape: bigrams are built per-row with `zip_with` over two
  * `slice`s of the token array — narrow, no shuffle, no join to
  * reassemble positions. Training is two hash aggregations on the
  * exploded bigram stream (map-side combined; keys are (w1,w2) and
  * w1). Scoring joins the per-occurrence stream back to the two count
  * tables on their natural keys — vocabulary-bounded equi-joins, the
  * postings shape of BM25, nothing broadcast except the 1-row corpus
  * stats. Every stage is linear in corpus tokens.
  */
object LangModel {

  private val Scale = 1000000L

  /** The exploded per-occurrence bigram stream: (doc_id, w1, w2),
    * one row per ADJACENT token pair occurrence. Docs with fewer than
    * two tokens contribute nothing (and are absent from scores —
    * a bigram model has no evidence on them either way).
    */
  private def bigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .select($"doc_id",
        explode(zip_with(
          slice($"toks", lit(1), greatest(size($"toks") - 1, lit(0))),
          slice($"toks", lit(2), greatest(size($"toks") - 1, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("bi"))
      .select($"doc_id", $"bi.w1", $"bi.w2")

  /** Per-document bigram surprisal under the corpus-trained add-one
    * model: (doc_id, n_bigrams, surprise_fp, avg_surprise_fp), with
    * `surprise_fp = Σ_occurrences SCALE·(c(w1·)+V) div (c(w1w2)+1)`
    * and the average its integer division by the occurrence count.
    * `c(w1·)` is the continuation count (bigrams starting w1 — the
    * exact MLE denominator) and V the corpus-wide distinct token
    * count, so smoothed probabilities sum to 1 per context.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bi = bigrams(docs, idCol, textCol)
    val c12 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy($"w1").agg(count(lit(1)).as("c1"))
    // corpus vocabulary over ALL token occurrences (not just bigram
    // firsts): the add-one mass covers every token the corpus knows
    val vocab = docs.select(explode(split(col(textCol), " ")).as("t"))
      .agg(countDistinct($"t").as("v"))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select($"doc_id",
        expr(s"(${Scale}L * (c1 + v)) div (c12 + 1)").as("term_fp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"term_fp").as("surprise_fp"))
      .select($"doc_id", $"n_bigrams", $"surprise_fp",
        expr("surprise_fp div n_bigrams").as("avg_surprise_fp"))
  }

  /** Stupid-backoff scoring (Brants et al. 2007 — the LM smoothing
    * built FOR web-scale counts: no discount fitting, just back off
    * to the lower order with a fixed α = 0.4) of a held-out document
    * set under a model trained on a DIFFERENT corpus slice — the real
    * deployment shape of a perplexity filter, and the one where the
    * backoff path is actually live (scoring the training corpus on
    * itself never sees an unseen bigram; a held-out slice does).
    *
    * Per bigram occurrence, in exact int64 fixed point (inverse
    * probability, the [[bigramSurprisal]] posture):
    *   - seen bigram:  `SCALE · c(w1·) div c(w1 w2)`   (1/p, p = MLE)
    *   - unseen:       `SCALE · 5·(T + V) div (2·(c(w2)+1))`
    *     (1/(α·p_uni), α = 0.4 = 2/5 kept rational, p_uni add-one
    *     smoothed so even unseen WORDS score finitely)
    * `T` = training token occurrences, `V` = training vocabulary.
    * At gate scales `SCALE·5·(T+V)` is far inside int64; past ~10^11
    * training tokens drop SCALE a decade to keep it there.
    *
    * Scale shape: three shuffle equi-joins of the scored occurrence
    * stream against vocabulary-bounded count tables (left joins —
    * misses ARE the signal), one broadcast 1-row stats frame; linear
    * in scored tokens, training-side cost is [[bigramSurprisal]]'s.
    */
  def stupidBackoffSurprisal(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val biT = bigrams(train, idCol, textCol)
    val c12 = biT.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = biT.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val uniT = train.select(explode(split(col(textCol), " ")).as("t"))
    val cw = uniT.groupBy($"t").agg(count(lit(1)).as("cw"))
      .select($"t".as("w2"), $"cw")
    val stats = uniT.agg(count(lit(1)).as("tt"), countDistinct($"t").as("v"))
    bigrams(score, idCol, textCol)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cw, Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .select($"doc_id", expr(
        s"""CASE WHEN c12 IS NOT NULL THEN (${Scale}L * c1) div c12
           |ELSE (${Scale}L * 5L * (tt + v)) div (2L * (coalesce(cw, 0L) + 1L))
           |END""".stripMargin).as("term_fp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"term_fp").as("surprise_fp"))
      .select($"doc_id", $"n_bigrams", $"surprise_fp",
        expr("surprise_fp div n_bigrams").as("avg_surprise_fp"))
  }
}
