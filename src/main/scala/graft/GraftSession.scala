package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** Recommended session construction for the engine, encoding the
  * settings that matter at 100 TB (and their local[32] stand-ins).
  * Verify/Bench follow the driver contract's own builders; production
  * jobs should start here.
  */
object GraftSession {

  /** Settings rationale:
    * - AQE on: runtime re-planning — coalesces post-shuffle
    *   partitions, converts sort-merge joins to broadcast when the
    *   built side turns out small, splits skewed partitions. At 100 TB
    *   these decisions can't be made statically.
    * - shuffle.partitions sized to cluster cores (driver contract uses
    *   32 locally); AQE coalescing trims the excess, so err high.
    * - maxPartitionBytes 256 MiB: the reference's split cap; big
    *   enough to amortize task overhead, small enough to spread work.
    * - openCostInBytes packs small files (CombineTextInputFormat
    *   behavior).
    * - parquet filter pushdown + vectorized reads are defaults — kept
    *   explicit here as documentation of what the plans rely on.
    * - objectHashAggregate fallback threshold raised from the default
    *   128 to 64k: TypedImperativeAggregate plans (the sketch family)
    *   fall back to SORT-based aggregation once a task's partial-agg
    *   map holds >threshold groups — at the default, any sketch
    *   grouped by more than 128 keys (e.g. 150 type×day groups)
    *   degenerates into a full sort of every task's input. Measured
    *   at sf100: 55 s → 2 s on the uniqUpTo gate from this setting
    *   alone. NOT raised further (r16 reverted r15's 4M): the
    *   threshold bounds CONCURRENT in-memory states, so its safe
    *   ceiling is memory ÷ max-state-size, and graft's largest
    *   bounded state (HLL p=12, a 4096-long register array ≈ 32 KB
    *   in memory) puts 64k × 32 KB ≈ 2 GB/task at the worst-case
    *   edge — while the common sketch states (DDSketch maxBuckets,
    *   CMS w×d, TopK k) are ≤ KB, i.e. ≤ 64 MB/task. 4M entries was
    *   only safe under a "states ≈ 50 B" assumption that holds for
    *   TopKAgg alone, and the data-proportional aggregates (sumMap,
    *   groupBitmap) NEED an early sort fallback — it is what caps
    *   how many growing states sit in memory at once
    *   (AggStateBoundSpec pins this classification). The r15
    *   motivation — q34's tiled all-NN partials at sf10 — is gone:
    *   documented-quadratic operators now refuse past
    *   spark.graft.quadratic.maxPairs, and a FORCED exact run at
    *   that scale should raise this threshold alongside (the
    *   operator scaladoc says so).
    */
  def builder(master: String = "local[32]", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  def local(cores: Int = 32): SparkSession = {
    val s = builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
