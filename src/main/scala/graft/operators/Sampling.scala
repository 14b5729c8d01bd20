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
}
