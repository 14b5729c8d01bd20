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
  * runs, leaving only swept-on-replay staging files behind).
  */
private[graft] object ParJobs {
  def run(units: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence(units.map(u => Future(u()))),
      scala.concurrent.duration.Duration.Inf); ()
  }
}
