package graft.operators

/** Run independent Spark actions as CONCURRENT jobs and wait for all
  * of them — the composed-dashboard applier's max-not-sum trick
  * ([[graft.streaming.StreamingIndex.applyDashboardBatch]]) packaged
  * for use INSIDE a family appender: an appender that maintains
  * several disjoint sub-tables (LM's c12/c1/cw, near-dup's
  * bands/sets/docs) pays one job-launch + parquet-commit round per
  * table, and at micro-batch scale that fixed cost IS the appender's
  * wall time. Submitting the writes concurrently overlaps the
  * commit/launch floors; each job writes its own directory, so
  * ordering never mattered (the atomic unit is the CALLER's staged
  * rename + batchlog commit, not the individual table write).
  *
  * Failure semantics match the dashboard applier: the first failed
  * job's exception propagates (the caller's staged commit then never
  * runs, leaving only swept-on-replay staging files behind) — but
  * only AFTER every sibling job has finished (siblings' failures are
  * attached as suppressed). A fail-fast await would let still-running
  * writes outlive this call, and a same-JVM replay of the batch
  * (which re-overwrites staging / sweeps batch files) could race
  * them.
  *
  * Jobs run on a dedicated per-call pool, not the global
  * ForkJoinPool: the dashboard applier's five family futures already
  * occupy global, and long BLOCKING job submissions from pool threads
  * both oversubscribe it and lose the caller's job-group /
  * scheduler-pool thread-locals. The caller's Spark local properties
  * (job group, description, scheduler pool) are re-applied on each
  * worker thread so group-based cancellation reaches these jobs.
  */
private[graft] object ParJobs {
  private val PropagatedKeys = Seq(
    "spark.jobGroup.id", "spark.job.description",
    "spark.job.interruptOnCancel", "spark.scheduler.pool")

  def run(units: (() => Unit)*): Unit = {
    if (units.isEmpty) return
    if (units.size == 1) { units.head.apply(); return }
    import java.util.concurrent.{Callable, Executors}
    import org.apache.spark.sql.SparkSession
    def activeSc: Option[org.apache.spark.SparkContext] =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.sparkContext)
    val props: Seq[(String, String)] =
      activeSc.toSeq.flatMap { sc =>
        PropagatedKeys.flatMap(k => Option(sc.getLocalProperty(k)).map(k -> _))
      }
    val pool = Executors.newFixedThreadPool(units.size)
    try {
      val outcomes = units.map { u =>
        pool.submit(new Callable[Option[Throwable]] {
          def call(): Option[Throwable] = {
            activeSc.foreach { sc =>
              props.foreach { case (k, v) => sc.setLocalProperty(k, v) }
            }
            try { u(); None }
            catch { case t: Throwable => Some(t) }
          }
        })
      }
      // await ALL (no write outlives this call), THEN rethrow
      val failures = outcomes.flatMap(_.get())
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
    } finally { pool.shutdown(); () }
  }
}
