package graft.sinks.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 packaging of the staged two-phase load
  * (SURVEY.md §2.A #15/#18/#22): the reference's map-side temp
  * `StripeLog` tables + reduce-side `INSERT INTO target SELECT *` +
  * `CleanupTempTableOutputCommitter`
  * (`AbstractClickhouseLoaderMapper.java:459-469`,
  * `ClickhouseLoaderReducer.java:218-260`,
  * `CleanupTempTableOutputCommitter.java:62-87`), expressed as a real
  * connector `Write` with commit/abort semantics instead of a
  * driver-coordinated afterthought:
  *
  *  - each write TASK stages its rows into a per-task staging target
  *    (`temp_<target>_<query>_p<partition>_a<attempt>`) — task retries
  *    get distinct names, and Spark's commit coordinator guarantees at
  *    most one committed attempt per partition;
  *  - job COMMIT merges exactly the committed tasks' stagings into the
  *    target in one backend call (atomicity is the backend's
  *    responsibility, mirroring the reference's reduce-side merge);
  *  - job/task ABORT drops every staging that task ever created —
  *    the committer cleanup, now owned by the engine not the driver.
  *
  * Usage:
  * {{{
  *   df.select($"wire_row")
  *     .write.format("graft-staged")
  *     .option("target", "db.events")
  *     .option("backend", "memory")     // or "jdbc" + url/user/password
  *     .mode("append")                  // or "overwrite" → truncate
  *     .save()
  * }}}
  */
class StagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-staged"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StagedSource.WireSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StagedTable(new CaseInsensitiveStringMap(properties))
}

object StagedSource {
  /** The staged sink consumes the pipeline's wire stage: one
    * serialized row per record (TransformStage.toWireRow).
    */
  val WireSchema: StructType =
    StructType(Seq(StructField("wire_row", StringType, nullable = false)))
}

private[v2] class StagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {

  private val target = {
    val t = options.get("target")
    require(t != null && t.nonEmpty, "graft-staged requires option 'target'")
    t
  }

  override def name(): String = s"graft-staged($target)"
  override def schema(): StructType = StagedSource.WireSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
        Seq(("wire_row", StringType)),
      s"graft-staged expects a single string column 'wire_row', got ${info.schema()}")
    new StagedWriteBuilder(target, options, info.queryId())
  }
}

private[v2] class StagedWriteBuilder(target: String,
    options: CaseInsensitiveStringMap, queryId: String)
    extends WriteBuilder with SupportsTruncate {

  private var truncateTarget = false

  override def truncate(): WriteBuilder = { truncateTarget = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new StagedBatchWrite(
      target,
      options.getOrDefault("backend", "memory"),
      new util.HashMap[String, String](options),
      queryId,
      options.getInt("batchsize", 150000),
      truncateTarget)
  }
}

private[v2] case class StagedCommit(staging: String, rows: Long)
    extends WriterCommitMessage

private[v2] class StagedBatchWrite(target: String, backendName: String,
    options: util.HashMap[String, String], queryId: String, batchSize: Int,
    truncateTarget: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new StagedWriterFactory(target, backendName, options, queryId, batchSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val backend = StagedBackends.resolve(backendName, options)
    val stagings = messages.collect { case StagedCommit(s, n) if n > 0 => s }
    try backend.mergeCommitted(stagings.toSeq, target, truncateTarget)
    finally stagings.foreach(backend.dropStaging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val backend = StagedBackends.resolve(backendName, options)
    // committed tasks' stagings are dropped here; failed tasks already
    // cleaned their own in DataWriter.abort (messages are null for them)
    messages.collect { case StagedCommit(s, _) => s }.foreach(backend.dropStaging)
  }
}

private[v2] class StagedWriterFactory(target: String, backendName: String,
    options: util.HashMap[String, String], queryId: String, batchSize: Int)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StagedDataWriter(
      StagedBackends.resolve(backendName, options),
      // per-attempt staging name: retries never collide
      // (reference: temp.<table>_<ts>_m_<taskid>_<attempt>)
      s"temp_${target.replace('.', '_')}_${queryId}_p${partitionId}_a$taskId",
      target, batchSize)
}

private[v2] class StagedDataWriter(backend: StagedBackend, staging: String,
    target: String, batchSize: Int) extends DataWriter[InternalRow] {

  private val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
  private var rows = 0L
  private var created = false

  private def flush(): Unit = if (buf.nonEmpty) {
    if (!created) { backend.createStaging(staging, target); created = true }
    backend.insert(staging, buf.toSeq)
    buf.clear()
  }

  override def write(record: InternalRow): Unit = {
    buf += record.getUTF8String(0).toString
    rows += 1
    if (buf.size >= batchSize) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    StagedCommit(staging, rows)
  }

  override def abort(): Unit = if (created) backend.dropStaging(staging)

  override def close(): Unit = ()
}

/** Storage protocol behind the staged write. Driver calls
  * `mergeCommitted`/`dropStaging`; executors call
  * `createStaging`/`insert`. Implementations must make
  * `mergeCommitted` atomic — that is the 2-phase-commit contract.
  */
trait StagedBackend extends Serializable {
  def createStaging(staging: String, target: String): Unit
  def insert(staging: String, rows: Seq[String]): Unit
  /** Merge all committed stagings into the target as one atomic unit,
    * optionally truncating the target first (overwrite mode).
    */
  def mergeCommitted(stagings: Seq[String], target: String, truncate: Boolean): Unit
  def dropStaging(staging: String): Unit
}

object StagedBackends {
  def resolve(name: String, options: util.Map[String, String]): StagedBackend =
    name match {
      case "memory" => InMemoryStagingStore
      case "jdbc" => new JdbcStagedBackend(
        options.get("url"),
        util.Objects.toString(options.get("user"), ""),
        util.Objects.toString(options.get("password"), ""))
      case other => throw new IllegalArgumentException(
        s"unknown graft-staged backend '$other' (memory|jdbc)")
    }
}

/** Single-JVM staging store for tests and local smoke (the same role
  * [[graft.sinks.CollectingExecutor]] plays for the direct sink).
  * Real deployments use the JDBC backend.
  */
object InMemoryStagingStore extends StagedBackend {
  private val stagings = new util.concurrent.ConcurrentHashMap[String, util.Queue[String]]()
  private val targets = new util.concurrent.ConcurrentHashMap[String, util.List[String]]()

  override def createStaging(staging: String, target: String): Unit =
    stagings.putIfAbsent(staging, new util.concurrent.ConcurrentLinkedQueue[String]())

  override def insert(staging: String, rows: Seq[String]): Unit = {
    val q = stagings.get(staging)
    require(q != null, s"staging $staging does not exist")
    rows.foreach(q.add)
  }

  override def mergeCommitted(ss: Seq[String], target: String,
      truncate: Boolean): Unit = synchronized {
    val dst = targets.computeIfAbsent(target, _ => new util.ArrayList[String]())
    dst.synchronized {
      if (truncate) dst.clear()
      ss.foreach { s =>
        val q = stagings.get(s)
        require(q != null, s"committed staging $s missing at merge time")
        q.forEach(r => dst.add(r))
      }
    }
  }

  override def dropStaging(staging: String): Unit = stagings.remove(staging)

  // test inspection surface
  def targetRows(target: String): Seq[String] = {
    val l = targets.get(target)
    if (l == null) Nil else { val b = Seq.newBuilder[String]; l.forEach(b += _); b.result() }
  }
  def liveStagings: Set[String] = {
    val b = Set.newBuilder[String]
    stagings.keySet.forEach(b += _)
    b.result()
  }
  def clear(): Unit = { stagings.clear(); targets.clear() }
}

/** ClickHouse-style JDBC backend: staging tables are created from the
  * target's DDL with the engine swapped to `StripeLog`
  * (`AbstractClickhouseLoaderMapper.java:580-591`), rows go in with
  * `INSERT INTO <staging> FORMAT TabSeparated`, and the merge is the
  * reference's reduce-phase `INSERT INTO target SELECT * FROM temp`.
  *
  * NOT exercised by tests — no JDBC endpoint in this environment; the
  * 2PC machinery above is covered via [[InMemoryStagingStore]].
  */
final class JdbcStagedBackend(url: String, user: String, password: String)
    extends StagedBackend {

  private def withStatement[T](f: java.sql.Statement => T): T = {
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try { val st = conn.createStatement(); try f(st) finally st.close() }
    finally conn.close()
  }

  override def createStaging(staging: String, target: String): Unit =
    withStatement(_.execute(
      s"CREATE TABLE IF NOT EXISTS $staging AS $target ENGINE = StripeLog"))

  override def insert(staging: String, rows: Seq[String]): Unit =
    withStatement(_.execute(
      s"INSERT INTO $staging FORMAT TabSeparated\n" + rows.mkString("\n")))

  override def mergeCommitted(ss: Seq[String], target: String,
      truncate: Boolean): Unit = withStatement { st =>
    if (truncate) st.execute(s"TRUNCATE TABLE $target")
    ss.foreach(s => st.execute(s"INSERT INTO $target SELECT * FROM $s"))
  }

  override def dropStaging(staging: String): Unit =
    withStatement(_.execute(s"DROP TABLE IF EXISTS $staging"))
}
