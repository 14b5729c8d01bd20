package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & split assignment for training pipelines.
  *
  * `sample(fraction)` / Bernoulli-by-rand are non-reproducible across
  * retries and engines; a corpus split must be a PURE FUNCTION of the
  * row key so that (a) re-running the pipeline yields the same split,
  * (b) adding data never reshuffles existing assignments, (c) any
  * engine (the DuckDB oracle included) can re-derive it. The bucket is
  * a mixed congruential hash of the key into [0, 1000) using only
  * arithmetic both engines evaluate exactly on BIGINT (no 64-bit
  * overflow: key % 1000003 * 31 < 2^35).
  */
object Sampling {

  val Buckets = 1000

  /** Deterministic bucket in [0, Buckets) from a numeric key. */
  def bucket(key: Column): Column =
    pmod((key % 1000003L) * 31L, lit(Buckets.toLong))

  /** Keep rows whose bucket falls under `permille` (exact-fraction
    * deterministic sample: permille=100 → 10%).
    */
  def sampled(df: DataFrame, key: String, permille: Int): DataFrame =
    df.filter(bucket(col(key)) < permille)

  /** Weighted sampling without replacement, per group: sequential
    * Poisson / priority sampling (Ohlsson; Duffield et al.) — each row
    * gets priority `u / w` from a deterministic uniform `u` and its
    * weight `w`, and the `k` SMALLEST priorities per group are the
    * sample (heavier rows draw smaller priorities ∝ 1/w, so inclusion
    * probability scales with weight — an established
    * weighted-without-replacement estimator that needs NO logarithm).
    *
    * Exactness: `u` is the same pure-BIGINT congruential arithmetic
    * [[bucket]] uses (no overflow: key%1000003 × 2654435761 < 2^52),
    * and `u / w` is ONE IEEE-754 division of exactly-representable
    * integers — correctly rounded, hence bit-identical in any
    * compliant engine, so the oracle re-derives the full sample.
    * Selection is the bounded [[graft.functions.TopKAgg]] partial
    * aggregate on `-priority` (k-bounded map-side state, no window
    * shuffle); ties break to the smaller id, mirrored in SQL.
    */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
      weight: Column, k: Int): DataFrame = {
    val u = (col(keyCol) % 1000003L) * 2654435761L % 1000000007L + 1L
    val pri = u.cast("double") / weight
    df.select(col(groupCol).as("grp"), col(keyCol).as("id"), pri.as("priority"))
      .groupBy(col("grp"))
      .agg(graft.functions.TopKAgg.topk_by_score(-col("priority"), col("id"), k)
        .as("top"))
      .select(col("grp"), explode(col("top")).as("t"))
      .select(col("grp").as(groupCol), col("t.id").as(keyCol),
        (-col("t.score")).as("priority"))
  }

  /** Train/valid/test assignment by bucket thresholds (e.g. 800/900 →
    * 80/10/10). Stable under data growth; stratification comes free by
    * grouping the result on any column.
    */
  def withSplit(df: DataFrame, key: String, trainUpTo: Int = 800,
      validUpTo: Int = 900): DataFrame =
    df.withColumn("split",
      when(bucket(col(key)) < trainUpTo, "train")
        .when(bucket(col(key)) < validUpTo, "valid")
        .otherwise("test"))

  /** Per-group cap: keep the first `cap` rows of each group under a
    * deterministic order — the mixture-balancing primitive (bound each
    * source's contribution to a training mix). One shuffle on the
    * group key, then a partition-local ranked filter; output is
    * bounded by cap × groups regardless of corpus size. A single
    * ultra-hot group serializes through one partition's sort — if the
    * mixture has one (per-group rows ≫ 10⁹), pre-prune with a
    * deterministic [[sampled]] pass sized ≫ cap before the exact rank.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      cap: Int): DataFrame = {
    require(!df.columns.contains("_rn"),
      "capPerGroup uses a temporary _rn column; rename the input's")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Temperature-based mixture sampling — the dataset-mixing step of a
    * training pipeline: each source's share of a `totalK`-doc mix is
    * proportional to `weight_sum^(1/2)` (temperature τ=2 up-samples
    * small sources relative to proportional mixing, the standard
    * multilingual/multi-source rebalancing), then each source
    * contributes its quota of docs in a deterministic pseudo-random
    * order.
    *
    * Exactness, so the oracle re-derives the full mix:
    *   - `isqrt = floor(sqrt(w))` — for `w < 2^52` IEEE sqrt is
    *     correctly rounded and the floor is exact, every engine agrees;
    *   - quotas are BIGINT floor division `totalK·isqrt div Σisqrt`
    *     (the mix under-fills by < n_sources docs — floor contract);
    *   - the per-source order is ([[bucket]], key): the same
    *     congruential hash the split family uses, so selection is a
    *     pure function of the key (stable under corpus growth).
    *
    * Scale shape: group weights and quotas are group-cardinality-sized
    * (broadcast); selection is the k-bounded [[graft.functions.TopKAgg]]
    * on `-(bucket·2^40 + key)` — one shuffle of (group, key, ord)
    * triples, map-side k-bounded, no corpus-wide window. Requires
    * `0 <= key < 2^40` so the packed order fits a double exactly —
    * ENFORCED: a key outside the range raises (`assert_true` folded
    * into the order expression) rather than silently mis-packing the
    * order and producing a plausible-looking but wrong mix.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
      weight: Column, totalK: Int): DataFrame = {
    require(totalK > 0, "mixture size must be positive")
    val w = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(weight).cast("long").as("wsum"))
    val isq = w.select(col("grp"), floor(sqrt(col("wsum"))).cast("long").as("isq"))
    val tot = isq.agg(sum(col("isq")).as("tot"))
    val quotas = isq.crossJoin(broadcast(tot))
      .select(col("grp"), expr(s"(${totalK}L * isq) div tot").as("quota"))
    // precondition check rides the order expression itself (an unused
    // side column would be pruned by Catalyst): assert_true yields
    // NULL when the key is in range, so the added term is 0
    val inRange = col(keyCol) >= 0 && col(keyCol) < (1L << 40)
    val chk = coalesce(
      assert_true(inRange,
        concat(lit(s"temperatureMixture requires 0 <= $keyCol < 2^40, got "),
          col(keyCol).cast("string"))).cast("long"),
      lit(0L))
    val ord = bucket(col(keyCol)) * (1L << 40) + col(keyCol) + chk
    df.select(col(groupCol).as("grp"), col(keyCol).as("id"), ord.as("ord"))
      .groupBy(col("grp"))
      .agg(graft.functions.TopKAgg.topk_by_score(
        -col("ord").cast("double"), col("id"), totalK).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("id"))
      .join(broadcast(quotas), "grp")
      .filter(col("rank") <= col("quota"))
      .select(col("grp").as(groupCol), col("rank"), col("id").as(keyCol),
        col("quota"))
  }

  /** Greedy contiguous token-budget packing: per group, docs in
    * deterministic order are assigned to bins of ~`budget` tokens —
    * bin = ⌊(running tokens BEFORE this doc) / budget⌋, so a doc
    * crossing a boundary stays with the bin it started in (bins can
    * overflow by at most one doc, the standard streaming-pack
    * contract). This is how a training pipeline shards a corpus into
    * fixed-token-cost work units. One shuffle on the group key; the
    * running sum is partition-local per group.
    */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(!df.columns.exists(Set("bin", "n_tokens", "_ntok")),
      "packByTokenBudget emits bin/n_tokens columns; rename the input's")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_ntok", tokensCol.cast("long"))
      .withColumn("bin",
        floor(coalesce(sum(col("_ntok")).over(w), lit(0L)) / budget))
      .withColumnRenamed("_ntok", "n_tokens")
  }
}
