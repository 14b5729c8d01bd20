package graft.operators

import org.apache.spark.sql.SparkSession

/** Refusal raised by a documented-quadratic operator whose estimated
  * pair volume exceeds the configured bound — the loud, driver-side
  * alternative to filling a cluster's shuffle disks. The message
  * always names the scale-safe twin to use instead.
  */
class QuadraticRefusal(msg: String) extends IllegalStateException(msg)

/** Guard for the engine's documented-quadratic operators (exact
  * all-pairs semantics: [[Similarity.nearestNeighbor]],
  * [[Similarity.thresholdPairs]], [[Dedup.ngramContainmentPairs]]).
  *
  * These operators are oracle anchors: their exactness provably needs
  * ~all pairs, so they cannot be made sub-quadratic — each has a
  * scale-safe twin (LSH/IVF ANN, collapse-first containment) for real
  * corpora. What CAN be fixed is the failure mode at scale: before
  * r16 the only protection was an env var (`SPARK_GRAFT_SKIP_Q`), and
  * a forgotten skip meant a stage failure or a filled disk hours into
  * an sf10 suite run. Now each operator estimates its pair volume
  * up front (a driver-side count / one linear aggregation — O(n)
  * against the O(n²) it guards) and throws [[QuadraticRefusal]] over
  * the bound, naming the twin. SuiteRun records the refusal as a
  * structured `{"refused": …}` row instead of a crash.
  *
  * The bound is `spark.graft.quadratic.maxPairs`; when the conf is
  * UNSET each operator supplies a default matched to its failure
  * mode — pair volume alone doesn't price an operator (q43's
  * thresholdPairs streamed 2e10 filtered pairs in 266 s at sf10,
  * while q34's all-NN at the SAME volume crashed: its argmax holds a
  * state per vector, and past the hash-agg fallback the sort spills
  * the whole pair stream to disk):
  * - stateless streamed scans (thresholdPairs: dot product → filter,
  *   no per-group state, no pair materialization) default to 1e11 —
  *   tens of minutes of compute, the "painful but finishes" line;
  * - stateful / expanding shapes (nearestNeighbor's per-vector
  *   argmax states; containment's candidate-pair expansion feeding
  *   distinct + verify) default to 1e9 — past it the aggregation or
  *   shuffle machinery, not the arithmetic, is what breaks.
  * Setting the conf overrides every default uniformly; ≤ 0 disables
  * the guard.
  */
object QuadraticGuard {
  val ConfKey = "spark.graft.quadratic.maxPairs"
  /** Default for stateful / expanding quadratic shapes. */
  val DefaultMaxPairs: Long = 1000000000L
  /** Default for stateless streamed quadratic scans. */
  val DefaultMaxScanPairs: Long = 100000000000L

  def maxPairs(spark: SparkSession,
      defaultBound: Long = DefaultMaxPairs): Long =
    spark.conf.get(ConfKey, defaultBound.toString).toLong

  /** Throw [[QuadraticRefusal]] when `estPairs` exceeds the bound.
    * `estPairs` is a Double so callers can pass n²/2 for n beyond
    * 2^31 without overflow ceremony.
    */
  def check(spark: SparkSession, op: String, estPairs: Double,
      detail: String, scaleSafeTwin: String,
      defaultBound: Long = DefaultMaxPairs): Unit = {
    val bound = maxPairs(spark, defaultBound)
    if (bound > 0 && estPairs > bound.toDouble) {
      throw new QuadraticRefusal(
        s"$op refused: estimated pair volume ${"%.3g".format(estPairs)} " +
          s"exceeds $ConfKey=$bound ($detail). This operator is " +
          "documented-quadratic — exact semantics require ~all pairs — " +
          s"so at this scale use $scaleSafeTwin instead, or raise " +
          s"$ConfKey to force the exact run.")
    }
  }
}
