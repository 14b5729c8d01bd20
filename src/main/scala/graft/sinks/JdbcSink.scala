package graft.sinks

import graft.config.WireFormat

/** JDBC batch executor for a ClickHouse-style target: one
  * `INSERT INTO <table> FORMAT <fmt>` statement per micro-batch with
  * inline wire-format rows — the reference's direct-insert sink
  * (`AbstractClickhouseLoaderMapper.java:309-359`, sql header `:552`).
  *
  * Plugs into [[DirectSink]] (which supplies partition-parallelism,
  * micro-batching, retry/backoff and metrics). One connection per
  * executor-partition, opened lazily and reused across batches.
  *
  * NOT exercised by tests — this environment has no JDBC endpoint; the
  * protocol shape follows the reference and the sink machinery around
  * it is covered via [[CollectingExecutor]]/[[FlakyExecutor]].
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
    columnTypes: Seq[String] = Nil) extends BatchExecutor {

  @transient private var conn: java.sql.Connection = _

  private def connection(): java.sql.Connection = {
    if (conn == null || conn.isClosed) {
      conn = java.sql.DriverManager.getConnection(url, user, password)
    }
    conn
  }

  override def execute(target: String, batch: Seq[String]): Unit = {
    val payload = format.headerLines(columns, columnTypes) ++ batch
    val sql = s"INSERT INTO $target FORMAT ${format.name}\n" + payload.mkString("\n")
    val st = connection().createStatement()
    try st.execute(sql)
    finally st.close()
  }

  /** Called once per partition-task by DirectSink. */
  override def close(): Unit =
    if (conn != null && !conn.isClosed) conn.close()
}
