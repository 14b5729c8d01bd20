package graft.operators

import graft.functions.{CountMinAgg, CountMinEstimate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** Exact frequent-item detection behind a count-min prescreen — the
  * sketch-then-verify shape for key spaces whose exact per-key counts
  * would themselves be a corpus-scale shuffle:
  *
  *  1. ONE pass builds a fixed `depth × width` sketch (mergeable
  *     aggregate — map-side partials, constant shuffle state).
  *  2. The stream re-scans against the BROADCAST sketch and keeps
  *     only items whose ESTIMATE clears the threshold — a map-side
  *     filter. CMS never under-counts, so this candidate set provably
  *     contains every true heavy hitter; over-counting only lets
  *     some light items through to verification.
  *  3. Exact counts for candidates only: the groupBy's map-side
  *     partials are bounded by the candidate count per partition, so
  *     the shuffle carries (candidates × partitions) rows however
  *     heavy the items are.
  *
  * Output is EXACT — `(token, n)` for every item with frequency
  * ≥ `minFraction` of the stream — so a plain SQL oracle gates it.
  */
object HeavyHitters {

  def frequentTokens(toks: DataFrame, tokenCol: String, minFraction: Double,
      depth: Int = 5, width: Int = 8192): DataFrame = {
    require(minFraction > 0 && minFraction <= 1, s"bad minFraction $minFraction")
    val t = toks.select(col(tokenCol).as("token"))
    val sk = t.agg(
      CountMinAgg.countmin_agg(xxhash64($"token"), depth, width).as("sk"))
      .select($"sk", element_at($"sk", depth * width + 1).as("n_total"))
    val candidates = t.join(broadcast(sk))
      .filter(CountMinEstimate.countmin_estimate(xxhash64($"token"), $"sk", depth)
        >= lit(minFraction) * $"n_total")
      .select($"token").distinct()
    t.join(candidates, Seq("token"), "left_semi")
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .join(broadcast(sk.select($"n_total")))
      .filter($"n" >= lit(minFraction) * $"n_total")
      .select($"token", $"n")
  }
}
