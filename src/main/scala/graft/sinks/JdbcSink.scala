package graft.sinks

import graft.config.WireFormat
import java.sql.Connection
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

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
    sleep: Long => Unit = Thread.sleep) extends BatchExecutor {
  require(replicas.nonEmpty, "need at least one replica endpoint")

  // replicas already holding a given (target, batch) — survives an
  // outer retry of the same batch so succeeded replicas are skipped
  private val done =
    new ConcurrentHashMap[String, java.util.Set[Integer]]()

  override def execute(target: String, batch: Seq[String]): Unit =
    if (lookupReplicated) executeLookup(target, batch)
    else executeFanout(target, batch)

  private def executeLookup(target: String, batch: Seq[String]): Unit =
    Retry.withRetries(maxTries, baseDelayMs, sleep) { _ =>
      val alive = replicas.indices.find(probeAlive).getOrElse(
        throw new IllegalStateException("Cannot get alive host."))
      replicas(alive).execute(target, batch)
    }

  private def executeFanout(target: String, batch: Seq[String]): Unit = {
    val key = s"$target#${batch.hashCode}"
    val ok = done.computeIfAbsent(key,
      _ => ConcurrentHashMap.newKeySet[Integer]())
    var tries = 0
    var lastFailure: Throwable = null
    while (ok.size < replicas.size && tries < maxTries) {
      tries += 1
      replicas.indices.foreach { i =>
        if (!ok.contains(Int.box(i))) {
          try { replicas(i).execute(target, batch); ok.add(Int.box(i)) }
          catch { case e: Throwable => lastFailure = e }
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

  override def close(): Unit = replicas.foreach(_.close())
}

object ReplicaFanoutExecutor {
  /** Production wiring: one [[JdbcFormatInsertExecutor]] per endpoint
    * URL, sharing format/credentials.
    */
  def forUrls(urls: Seq[String], user: String, password: String,
      format: WireFormat, lookupReplicated: Boolean = false,
      maxTries: Int = 3): ReplicaFanoutExecutor =
    new ReplicaFanoutExecutor(
      urls.map(u => new JdbcFormatInsertExecutor(u, user, password, format): BatchExecutor)
        .toIndexedSeq,
      lookupReplicated = lookupReplicated, maxTries = maxTries)
}
