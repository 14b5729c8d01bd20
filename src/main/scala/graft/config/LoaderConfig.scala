package graft.config

/** Typed mirror of the reference loader's CLI surface
  * (`cli/MainCliParameterParser.java:14-106` in /root/reference) —
  * the flat Hadoop `Configuration` string map becomes a case class.
  *
  * Defaults match the reference's code defaults (not the README's).
  */
final case class LoaderConfig(
    // connection (not dialable in this environment; carried for parity)
    connect: String = "",                        // --connect jdbc:clickhouse://…
    driver: String = "",                         // --driver (JDBC class)
    username: String = "",                       // --username
    password: String = "",                       // --password
    clickhouseHttpPort: Int = 8123,              // --clickhouse-http-port
    // source
    exportDir: String = "",
    inputFormat: InputFormat = InputFormat.Text,
    fieldsTerminatedBy: String = "|",            // --fields-terminated-by
    inputSplitMaxBytes: Long = 268435456L,       // --input-split-max-bytes (256 MiB)
    extractHivePartitions: Boolean = false,      // --extract-hive-partitions
    // transform
    excludeFields: Seq[Int] = Nil,               // --exclude-fields "0,10"
    additionalCols: Seq[String] = Nil,           // --additional-cols
    nullString: String = "",                     // --null-string (String cols)
    nullNonString: String = "0",                 // --null-non-string
    escapeNull: Boolean = true,                  // --escape-null
    replaceChar: String = " ",                   // --replace-char
    // target
    table: String = "",
    clickhouseFormat: WireFormat = WireFormat.TabSeparated,
    dt: String = "",                             // load-date partition value
    // sink behavior
    direct: Boolean = true,                      // --direct (false = 2-phase)
    batchSize: Int = 150000,                     // --batch-size
    maxTries: Int = 3,                           // --max-tries
    numReduceTasks: Int = -1,                    // --num-reduce-tasks (-1 = auto)
    loaderTaskExecutor: Int = 1,                 // --loader-task-executor
    mode: LoadMode = LoadMode.Append,
    // daily-table lifecycle (deprecated in the reference, kept for parity)
    daily: Boolean = false,                      // --daily
    dailyExpires: Int = 3,                       // --daily-expires (days kept)
    dailyExpiresProcess: DailyExpiresProcess =   // --daily-expires-process
      DailyExpiresProcess.Merge) {

  require(batchSize > 0, "batchSize must be positive")
  require(maxTries >= 1, "maxTries must be >= 1")
  require(excludeFields.forall(_ >= 0), "excludeFields are 0-based indexes")
  require(dailyExpires >= 0, "dailyExpires must be >= 0")
}

/** Expired-daily-table handling (`--daily-expires-process`,
  * `ConfigurationOptions.DailyExpiresProcess`): merge into the base
  * table then drop, or just drop.
  */
sealed trait DailyExpiresProcess
object DailyExpiresProcess {
  case object Merge extends DailyExpiresProcess
  case object Drop extends DailyExpiresProcess
}

sealed trait InputFormat
object InputFormat {
  case object Text extends InputFormat
  case object Orc extends InputFormat
  case object Parquet extends InputFormat // engine extension (harness data)
}

/** ClickHouse wire formats the reference can emit
  * (`config/ConfigurationOptions.java:47-71`): the TSV family
  * separates with `\t`, the CSV family with `,`; the `WithNames`
  * variants prefix each insert payload with a column-name header row,
  * `WithNamesAndTypes` adds a second row of column types, and
  * `TabSeparatedRaw` is TSV with server-side escaping disabled (the
  * loader's own sanitization is format-independent, so client-side it
  * differs only in the FORMAT name sent).
  */
sealed abstract class WireFormat(
    val name: String,
    val separator: String,
    val withNames: Boolean,
    val withTypes: Boolean) {

  /** Header lines this FORMAT requires ahead of the data rows of every
    * insert payload.
    */
  def headerLines(columns: Seq[String], types: Seq[String]): Seq[String] =
    (if (withNames) Seq(columns.mkString(separator)) else Nil) ++
      (if (withTypes) Seq(types.mkString(separator)) else Nil)
}

object WireFormat {
  // No default constructor args here: defaults compile to calls back
  // into this companion object, and that nested-object → companion
  // init edge forms a JVM class-initialization cycle with `All` below
  // (companion init → nested init). Under concurrent first-touch from
  // parallel test suites that cycle surfaces as a partially-initialized
  // `All` (null elements). All four args are always explicit.
  case object TabSeparated extends WireFormat("TabSeparated", "\t", false, false)
  case object TabSeparatedWithNames
    extends WireFormat("TabSeparatedWithNames", "\t", true, false)
  case object TabSeparatedWithNamesAndTypes
    extends WireFormat("TabSeparatedWithNamesAndTypes", "\t", true, true)
  case object TabSeparatedRaw extends WireFormat("TabSeparatedRaw", "\t", false, false)
  case object CSV extends WireFormat("CSV", ",", false, false)
  case object CSVWithNames extends WireFormat("CSVWithNames", ",", true, false)

  // lazy: keeps case-object initialization out of this object's own
  // <clinit>, so first-touch order between the companion and the
  // nested objects cannot matter.
  lazy val All: Seq[WireFormat] = Seq(TabSeparated, TabSeparatedWithNames,
    TabSeparatedWithNamesAndTypes, TabSeparatedRaw, CSV, CSVWithNames)

  def parse(s: String): WireFormat =
    All.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown clickhouse-format $s"))
}

sealed trait LoadMode
object LoadMode {
  case object Append extends LoadMode
  case object Drop extends LoadMode // drop-and-recreate daily table
}
