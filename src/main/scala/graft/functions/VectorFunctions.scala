package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `Array[Float]` embedding columns.
  *
  * Exact-parity design: embeddings are quantized to integer grid
  * (round(x*1000) as BIGINT) so dot products are integer sums —
  * order-independent and bit-exact across engines and partitionings
  * (a float dot product would differ in the last ulp between a
  * 1000-executor sum and the oracle's sequential sum). Magnitudes stay
  * < 2^53, so even the final double math (sqrt/divide) is exact-input
  * deterministic.
  */
object VectorFunctions {

  /** Quantize a float vector to the integer grid (×1000) — a codegen'd
    * native expression ([[QuantizeVec]]); the transform+round HOF
    * formulation is semantically identical but runs an interpreted
    * Round per element on what is a full corpus encode scan at 100 TB.
    */
  def quantize(v: Column): Column = QuantizeVec.quantizeVec(v)

  /** Integer dot product of two quantized vectors — a codegen'd native
    * expression ([[QDot]]); the zip_with+aggregate formulation is
    * semantically identical but runs interpreted and ~10× slower.
    */
  def dotQ(a: Column, b: Column): Column = QDot.qdot(a, b)

  /** L2 norm of a quantized vector, as double. */
  def normQ(v: Column): Column = sqrt(dotQ(v, v).cast("double"))

  /** Cosine similarity of two quantized vectors (double).
    *
    * Total even for zero-norm (degenerate) vectors: the undefined
    * 0/0 case yields NaN explicitly rather than tripping ANSI mode's
    * divideByZeroError (Spark 4 default). NaN ranks GREATEST in
    * Spark's double ordering — callers that want degenerate vectors
    * excluded from neighbor results should filter `nrm > 0` upstream.
    */
  def cosineQ(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom === lit(0d), lit(Double.NaN))
      .otherwise(dotQ(a, b).cast("double") / denom)
  }
}
