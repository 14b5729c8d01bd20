package graft.sinks

import graft.config.WireFormat
import java.sql.Connection
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import scala.util.control.NonFatal

/** Executor-wide JDBC connection pool keyed by connect URL (+user) —
  * the reference's per-URL client cache (`ClickhouseClientHolder
  * .java:17-69`) re-expressed for Spark's execution model. A Hadoop
  * mapper is a single-threaded JVM, so the reference memoizes ONE
  * client per URL; a Spark executor runs many concurrent tasks in one
  * JVM, so a plain memo would either share a non-thread-safe
  * `Connection` across tasks or serialize them. Borrow/return over an
  * idle queue gives the same reconnect-storm bound — a 1000-partition
  * load opens O(concurrent tasks per executor) connections, not
  * O(partitions) — while staying thread-safe.
  *
  * A connection whose work threw is closed, not returned: retry (in
  * [[DirectSink]]) must reopen rather than reuse a possibly-broken
  * socket.
  */
object ConnectionPool {
  private val idle =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[Connection]]()

  /** Borrow an idle connection for `key` (open via `open` when none),
    * run `f`, return it to the pool on success.
    */
  def withConnection[A](key: String, open: () => Connection)(f: Connection => A): A = {
    val q = idle.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[Connection]())
    var c = q.poll()
    while (c != null && c.isClosed) c = q.poll() // drop stale entries
    if (c == null) c = open()
    try {
      val r = f(c)
      q.add(c)
      r
    } catch {
      case e: Throwable =>
        try c.close() catch { case _: Throwable => () }
        throw e
    }
  }

  /** Close and forget every idle connection for `key` (job teardown). */
  def closeAll(key: String): Unit = {
    val q = idle.remove(key)
    if (q != null) {
      var c = q.poll()
      while (c != null) {
        try c.close() catch { case _: Throwable => () }
        c = q.poll()
      }
    }
  }

  /** Idle-connection count for `key` (metrics/specs). */
  def idleCount(key: String): Int = {
    val q = idle.get(key)
    if (q == null) 0 else q.size
  }
}

/** JDBC batch executor for a ClickHouse-style target: one
  * `INSERT INTO <table> FORMAT <fmt>` statement per micro-batch with
  * inline wire-format rows — the reference's direct-insert sink
  * (`AbstractClickhouseLoaderMapper.java:309-359`, sql header `:552`).
  *
  * Plugs into [[DirectSink]] (which supplies partition-parallelism,
  * micro-batching, retry/backoff and metrics). Connections come from
  * the executor-wide [[ConnectionPool]], so tasks of the same load (and
  * successive loads in the same executor) reuse sockets per URL.
  *
  * The live DriverManager path is NOT exercised by tests — this
  * environment has no JDBC endpoint; the pooling + statement protocol
  * runs in SinkSpec against an injected connection factory, and the
  * sink machinery around it via [[CollectingExecutor]]/[[FlakyExecutor]].
  */
final class JdbcFormatInsertExecutor(
    url: String,
    user: String,
    password: String,
    format: WireFormat,
    // column names/types for the WithNames/WithNamesAndTypes header
    // rows (`ConfigurationOptions.java:47-71`); unused by headerless
    // formats
    columns: Seq[String] = Nil,
    columnTypes: Seq[String] = Nil,
    // injectable for specs; the default is the real driver path
    connectionFactory: () => Connection = null) extends BatchExecutor {

  private def poolKey = url + " " + user

  private def open(): Connection =
    if (connectionFactory != null) connectionFactory()
    else java.sql.DriverManager.getConnection(url, user, password)

  override def execute(target: String, batch: Seq[String]): Unit = {
    val payload = format.headerLines(columns, columnTypes) ++ batch
    val sql = s"INSERT INTO $target FORMAT ${format.name}\n" + payload.mkString("\n")
    ConnectionPool.withConnection(poolKey, open _) { conn =>
      val st = conn.createStatement()
      try st.execute(sql)
      finally st.close()
    }
  }

  /** Alive probe for this endpoint — the reference's HTTP-200 ping
    * (`AbstractClickhouseLoaderMapper.java:678-699`) re-expressed over
    * JDBC: borrow a pooled connection (opening one if the pool is dry)
    * and `isValid`-check it. An endpoint that refuses the connection,
    * or whose socket has gone stale, probes false; the stale socket is
    * closed (thrown out of the pool) rather than returned.
    */
  def ping(timeoutSec: Int = 2): Boolean =
    try ConnectionPool.withConnection(poolKey, open _) { c =>
      if (!c.isValid(timeoutSec))
        throw new java.sql.SQLException(s"endpoint not alive: $url")
      true
    } catch { case NonFatal(_) => false }

  /** Per-task close is a no-op by design: the pool is executor-wide.
    * Job teardown calls [[ConnectionPool.closeAll]] with the same key.
    */
  override def close(): Unit = ()

  /** Drain this executor's idle pool for the sink's URL. */
  def shutdownPool(): Unit = ConnectionPool.closeAll(poolKey)
}

/** Replica fan-out + alive-host failover — the reference's
  * `batchDirectInsert` cluster semantics
  * (`AbstractClickhouseLoaderMapper.java:309-359`, alive probe
  * `:678-699`) over N per-endpoint executors:
  *
  * - **Fan-out mode** (`lookupReplicated = false`): every replica gets
  *   every batch. Per-replica success is tracked in a per-batch status
  *   map (the reference's `hostStatus`), so retries — internal ones
  *   AND an outer [[Retry]] re-invocation after this throws — only
  *   re-send to replicas that have NOT yet taken the batch. A healthy
  *   replica is never double-inserted.
  * - **Lookup mode** (`lookupReplicated = true`, the reference's
  *   `distLookupReplicatedTable`): the target is a replicated table,
  *   so ONE alive replica suffices; endpoints are probed in order and
  *   the first alive one takes the insert (`getAliveNodeAddress`),
  *   re-probing on every retry. No alive endpoint → fail, like the
  *   reference's "Cannot get alive host.".
  *
  * `probeAlive` is the HTTP-200 ping re-expressed as an injectable
  * predicate (specs inject; production probes the endpoint). Composes
  * with [[DirectSink]], which supplies batching + metrics; a batch
  * that still fails here is counted failed there, same contract as
  * the reference's Failed-records counter.
  */
final class ReplicaFanoutExecutor(
    replicas: IndexedSeq[BatchExecutor],
    lookupReplicated: Boolean = false,
    probeAlive: Int => Boolean = _ => true,
    maxTries: Int = 3,
    baseDelayMs: Long = 100L,
    sleep: Long => Unit = Thread.sleep,
    maxPending: Int = ReplicaFanoutExecutor.MaxPendingBatches,
    minEvictAgeNanos: Long = ReplicaFanoutExecutor.MinEvictAgeNanos,
    nanoTime: () => Long = () => System.nanoTime()) extends BatchExecutor {
  require(replicas.nonEmpty, "need at least one replica endpoint")

  // replicas already holding a given (target, batch) — survives an
  // outer retry of the same batch so succeeded replicas are skipped.
  // Keyed by a 128-bit murmur3 of the batch CONTENT (not Seq.hashCode,
  // whose 32-bit collisions would silently skip replicas for a
  // different batch). Entries for permanently failed batches are
  // evicted least-recently-touched once the map exceeds `maxPending` —
  // but never before `minEvictAgeNanos` of idleness, so a batch whose
  // outer retry is still in flight (or between attempts) cannot lose
  // its ok-replica set to concurrent eviction pressure and be
  // double-inserted into replicas that already took it.
  private final class BatchStatus {
    val ok: java.util.Set[Integer] = ConcurrentHashMap.newKeySet[Integer]()
    @volatile var touched: Long = nanoTime()
  }
  private val done = new ConcurrentHashMap[String, BatchStatus]()

  private def batchKey(target: String, batch: Seq[String]): String = {
    // wire rows are newline-joined on the statement anyway, so "\n"
    // is an unambiguous row separator for the identity hash
    val (h1, h2) = graft.functions.Murmur3.hashUnencodedChars(
      batch.mkString("\n"))
    s"$target#${java.lang.Long.toHexString(h1)}${java.lang.Long.toHexString(h2)}#${batch.size}"
  }

  /** Evict the least-recently-touched ABANDONED status entry when the
    * map is over `maxPending`. Only entries idle for at least
    * `minEvictAgeNanos` are candidates — an in-flight batch touches its
    * entry on every (re-)invocation and the outer retry's backoff is
    * orders of magnitude shorter than the window, so live entries are
    * never reaped even when more than `maxPending` batches are pending
    * at once (the map may transiently exceed the cap; it is bounded by
    * actual concurrency + failures within the window). The staleness
    * re-check before `remove` closes the selection-to-removal gap for
    * an entry resurrected mid-scan.
    */
  private def evictStale(keep: String): Unit =
    if (done.size > maxPending) {
      val cutoff = nanoTime() - minEvictAgeNanos
      val it = done.entrySet().iterator()
      var oldestKey: String = null
      var oldestSt: BatchStatus = null
      var oldest = Long.MaxValue
      while (it.hasNext) {
        val e = it.next()
        val t = e.getValue.touched
        if (e.getKey != keep && t < cutoff && t < oldest) {
          oldest = t; oldestKey = e.getKey; oldestSt = e.getValue
        }
      }
      if (oldestKey != null && oldestSt.touched < cutoff)
        done.remove(oldestKey, oldestSt)
    }

  override def execute(target: String, batch: Seq[String]): Unit =
    if (lookupReplicated) executeLookup(target, batch)
    else executeFanout(target, batch)

  /** One alive replica suffices (replicated target). Endpoints are
    * probed in order; an endpoint whose INSERT throws is marked suspect
    * so the next retry advances to the next alive endpoint instead of
    * hammering the same one (the reference re-resolves
    * `getAliveNodeAddress` per attempt). Once every endpoint has
    * failed an insert, the suspect set resets — a transient outage of
    * all replicas still resolves within the retry budget.
    */
  private def executeLookup(target: String, batch: Seq[String]): Unit = {
    val suspect = ConcurrentHashMap.newKeySet[Integer]()
    Retry.withRetries(maxTries, baseDelayMs, sleep) { _ =>
      val alive = replicas.indices
        .find(i => !suspect.contains(Int.box(i)) && probeAlive(i))
        .orElse {
          suspect.clear()
          replicas.indices.find(probeAlive)
        }
        .getOrElse(throw new IllegalStateException("Cannot get alive host."))
      try replicas(alive).execute(target, batch)
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case NonFatal(e) => suspect.add(Int.box(alive)); throw e
      }
    }
  }

  private def executeFanout(target: String, batch: Seq[String]): Unit = {
    val key = batchKey(target, batch)
    val st = done.computeIfAbsent(key, _ => new BatchStatus)
    st.touched = nanoTime()
    evictStale(keep = key)
    val ok = st.ok
    var tries = 0
    var lastFailure: Throwable = null
    while (ok.size < replicas.size && tries < maxTries) {
      tries += 1
      replicas.indices.foreach { i =>
        if (!ok.contains(Int.box(i))) {
          try { replicas(i).execute(target, batch); ok.add(Int.box(i)) }
          catch {
            // fatal errors (OOM, linkage) propagate; an interrupted
            // Spark task must cancel promptly, not keep retrying
            // other replicas with the flag swallowed
            case e: InterruptedException =>
              Thread.currentThread().interrupt(); throw e
            case NonFatal(e) => lastFailure = e
          }
        }
      }
      if (ok.size < replicas.size && tries < maxTries)
        sleep((1L << tries) * baseDelayMs)
    }
    if (ok.size < replicas.size)
      throw new IllegalStateException(
        "replicas " +
          replicas.indices.filterNot(i => ok.contains(Int.box(i))).mkString(",") +
          s" failed after $maxTries tries", lastFailure)
    done.remove(key) // complete — forget the status map entry
  }

  /** Pending per-batch status entries (specs/metrics). */
  private[graft] def pendingBatchStatuses: Int = done.size

  override def close(): Unit = replicas.foreach(_.close())
}

object ReplicaFanoutExecutor {
  /** Status entries for in-flight/failed batches kept per executor
    * instance before least-recently-touched eviction kicks in. A task
    * has O(1) batches in flight, so anything beyond a few entries is
    * leftover from permanently failed batches.
    */
  private[graft] val MaxPendingBatches = 256

  /** Minimum idle time before a status entry is eviction-eligible.
    * Must exceed the outer retry's worst-case attempt-to-attempt gap
    * (sub-second at default backoff) by a wide margin; 60 s gives
    * ~100× headroom, so only genuinely abandoned (permanently failed)
    * batches age out.
    */
  private[graft] val MinEvictAgeNanos = 60L * 1000 * 1000 * 1000

  /** Production wiring: one [[JdbcFormatInsertExecutor]] per endpoint
    * URL, sharing format/credentials, with the per-endpoint JDBC
    * `ping()` wired in as the alive probe — lookup mode genuinely
    * fails over to the first endpoint that answers, matching the
    * reference's `getAliveNodeAddress` rather than always electing
    * endpoint 0.
    */
  def forUrls(urls: Seq[String], user: String, password: String,
      format: WireFormat, lookupReplicated: Boolean = false,
      maxTries: Int = 3): ReplicaFanoutExecutor = {
    val endpoints = urls.map(u =>
      new JdbcFormatInsertExecutor(u, user, password, format)).toIndexedSeq
    new ReplicaFanoutExecutor(
      endpoints.map(e => e: BatchExecutor),
      lookupReplicated = lookupReplicated,
      probeAlive = i => endpoints(i).ping(),
      maxTries = maxTries)
  }
}
