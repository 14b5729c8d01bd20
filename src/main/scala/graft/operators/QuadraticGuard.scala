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
  * The bound is `spark.graft.quadratic.maxPairs` (pairs; default 1e9
  * ≈ minutes of dot products / candidate checks on local[32], the
  * scale where the gates' SFs still pass untouched). Set it ≤ 0 to
  * disable the guard, or raise it to force a known-expensive exact
  * run.
  */
object QuadraticGuard {
  val ConfKey = "spark.graft.quadratic.maxPairs"
  val DefaultMaxPairs: Long = 1000000000L

  def maxPairs(spark: SparkSession): Long =
    spark.conf.get(ConfKey, DefaultMaxPairs.toString).toLong

  /** Throw [[QuadraticRefusal]] when `estPairs` exceeds the bound.
    * `estPairs` is a Double so callers can pass n²/2 for n beyond
    * 2^31 without overflow ceremony.
    */
  def check(spark: SparkSession, op: String, estPairs: Double,
      detail: String, scaleSafeTwin: String): Unit = {
    val bound = maxPairs(spark)
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
