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
  *   or when the skewed side must stay hash-partitioned): the big
  *   side's key is sprayed across `saltFactor` sub-keys, the small
  *   side is replicated once per salt, and the join key becomes
  *   (key, salt). Work per partition is bounded by maxFreq/saltFactor.
  */
object Skew {

  /** Deterministic salt derived from row content (stable across
    * retries — a rand() salt would break task re-execution).
    */
  def salt(c: Column, saltFactor: Int): Column =
    pmod(xxhash64(c), lit(saltFactor))

  /** Salted equi-join: `big ⋈ small ON big(key) = small(key)` with the
    * big side salted by a second column `saltBy` and the small side
    * exploded ×saltFactor. Semantics identical to the plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: String, saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(col(saltBy), saltFactor))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
