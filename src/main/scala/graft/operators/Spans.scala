package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication: find every MAXIMAL run of
  * `k`-or-more consecutive tokens shared verbatim between two
  * documents (the "exact substring" dedup of training-data pipelines,
  * where duplicated passages — boilerplate, licenses, templated
  * intros — are detected at span granularity rather than whole-doc).
  *
  * Algorithm (inverted index over positional k-grams, then
  * diagonal-run merging — the Spark-shaped equivalent of a
  * suffix-array scan):
  *  1. Every doc emits its positional k-token grams `(doc, pos, gram)`
  *     — NOT distinct: positions matter.
  *  2. One groupBy (keyed on the 64-bit gram hash + gram-equality
  *     verify) builds each gram's posting list and its doc frequency
  *     together; postings in more than `maxDocFreq` docs are
  *     stop-grams and dropped at the grouped row (same doc-frequency
  *     bound the PPJoin candidate stage uses) — this is what keeps
  *     the pair stage from quadratic blow-up on boilerplate at 100 TB.
  *  3. Matched position pairs (`a.doc < b.doc`) explode directly from
  *     each surviving posting — no second scan, no self-join.
  *  4. Matches on the same pair lie on diagonals `pa - pb`; a shared
  *     span of `L >= k` tokens is exactly a run of `L - k + 1`
  *     consecutive k-gram matches on one diagonal. Gaps-and-islands
  *     (`pa - row_number()`) merges each run; the window partitions by
  *     `(a, b, diag)` — bounded by matched positions per doc PAIR
  *     (doc-length-scale, never corpus-scale).
  *
  * Output: one row per maximal span of at least `minSpanTokens`
  * tokens: `(a, b, a_start, b_start, span_tokens)` with 0-based token
  * offsets.
  */
object Spans {

  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minSpanTokens: Int = 12, maxDocFreq: Int = 50): DataFrame = {
    require(k > 0 && minSpanTokens >= k,
      s"need minSpanTokens >= k > 0, got k=$k minSpanTokens=$minSpanTokens")
    val toks = split(col(textCol), " ")
    val grams = df
      .select(col(idCol).as("doc"), toks.as("toks"))
      // sequence(0, n-k) descends when n < k — guard short docs out
      .filter(org.apache.spark.sql.functions.size(col("toks")) >= k)
      .select(col("doc"), col("toks"),
        posexplode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("toks")) - k)))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        array_join(slice(col("toks"), col("pos") + 1, lit(k)), " ").as("gram"))
      .withColumn("gh", xxhash64(col("gram")))

    // Posting-list formulation: ONE pass builds each gram's occurrence
    // list and its doc frequency together, the stop-gram caps filter
    // the grouped row, and matches explode directly from the posting —
    // one scan and one shuffle where a semi-join + self-join shape
    // scans the gram stream twice and shuffles it three times.
    // TWO caps bound the posting: doc frequency (boilerplate across
    // docs) and TOTAL occurrences (a degenerate doc repeating one gram
    // thousands of times would otherwise bloat a single posting row
    // and square in the pair explode) — both mirrored in the oracle,
    // so behavior is exact even when they fire.
    val maxOccs = maxDocFreq * 8
    val matches = grams.groupBy(col("gh"), col("gram"))
      .agg(collect_list(struct(col("doc"), col("pos"))).as("occs"),
        countDistinct(col("doc")).as("df"))
      .filter(col("df") <= maxDocFreq &&
        org.apache.spark.sql.functions.size(col("occs")) <= maxOccs)
      .select(col("occs"), explode(col("occs")).as("x"))
      .select(col("x"), explode(col("occs")).as("y"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        col("x.pos").as("pa"), col("y.pos").as("pb"))
      .withColumn("diag", col("pa") - col("pb"))

    val w = Window.partitionBy(col("a"), col("b"), col("diag"))
      .orderBy(col("pa"))
    matches
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("a"), col("b"), col("diag"), col("island"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (max(col("pa")) - min(col("pa")) + k).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("a"), col("b"), col("a_start"), col("b_start"),
        col("span_tokens"))
  }

  /** The ACTION step of substring dedup: cut every shared span out of
    * the HIGHER-id doc of its pair (keep-first — the lower id keeps
    * the passage) and rebuild the cleaned text. Coverage is the
    * union of the b-side span intervals, materialized as exploded
    * `(doc, pos)` rows — total volume = duplicated tokens, a sliver
    * of the corpus — anti-joined against the token stream; overlap
    * between spans needs no interval merge, the distinct covered-set
    * handles it. Docs with nothing to cut pass through whole. Output:
    * `(doc_id, clean_text, n_removed)`.
    */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minSpanTokens: Int = 12, maxDocFreq: Int = 50): DataFrame = {
    val spans = sharedSpans(df, idCol, textCol, k, minSpanTokens, maxDocFreq)
    val covered = spans
      .select(col("b").as("doc"),
        explode(sequence(col("b_start"), col("b_start") + col("span_tokens") - 1))
          .as("pos"))
      .distinct()
    val toks = df
      .select(col(idCol).as("doc"), posexplode(split(col(textCol), " ")))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("col").as("tok"))
    val kept = toks.join(covered, Seq("doc", "pos"), "left_anti")
    val rebuilt = kept.groupBy(col("doc"))
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok"), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // left join from the full corpus: a doc whose every token was
    // covered (fully contained in an earlier doc) must still appear,
    // as an emptied row — exactly what the dedup action means for it
    df.select(col(idCol).as("doc"),
        org.apache.spark.sql.functions.size(split(col(textCol), " "))
          .cast("long").as("n_total"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc").as("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
