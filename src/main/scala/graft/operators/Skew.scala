package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution would overload a
  * handful of shuffle partitions at scale (one hot customer, one hot
  * date). Two tools:
  *
  * - AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`,
  *   default on) handles sort-merge joins automatically — prefer it.
  * - Explicit salting for the cases AQE can't split (aggregations,
  *   or when the skewed side must stay hash-partitioned): each row of
  *   the big side gets a salt derived from its NON-key content, the
  *   small side is replicated once per salt, and the join key becomes
  *   (key, salt). Work per partition is bounded by maxFreq/saltFactor.
  *
  * The salt must NOT be a function of the join key: a key-derived salt
  * gives every row of a hot key the same salt, so the hot key still
  * lands in a single partition and the only effect is saltFactor×
  * replication of the small side. Deriving from the other columns
  * spreads a hot key's rows across buckets while staying deterministic
  * under task re-execution (a rand() salt would break retries).
  */
object Skew {

  /** Deterministic per-row salt for `df`, derived from every column
    * except the join key. Falls back to a stable per-partition row id
    * when the frame has no non-key columns (key-only projections would
    * otherwise degenerate to a constant salt).
    */
  def rowSalt(df: DataFrame, key: String, saltFactor: Int): Column = {
    val nonKey = df.columns.filterNot(_ == key).map(col).toSeq
    val basis = if (nonKey.nonEmpty) nonKey else Seq(monotonically_increasing_id())
    pmod(xxhash64(basis: _*), lit(saltFactor.toLong))
  }

  /** Salted equi-join: `big ⋈ small ON big(key) = small(key)` with the
    * big side salted per-row (see [[rowSalt]]) and the small side
    * exploded ×saltFactor. Semantics identical to the plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", rowSalt(big, key, saltFactor))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
