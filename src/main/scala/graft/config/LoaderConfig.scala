package graft.config

/** Typed mirror of the reference loader's CLI surface
  * (`cli/MainCliParameterParser.java:14-106` in /root/reference) —
  * the flat Hadoop `Configuration` string map becomes a case class.
  *
  * Defaults match the reference's code defaults (not the README's).
  */
final case class LoaderConfig(
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
    loaderTaskExecutor: Int = 1,                 // --loader-task-executor
    mode: LoadMode = LoadMode.Append) {

  require(batchSize > 0, "batchSize must be positive")
  require(maxTries >= 1, "maxTries must be >= 1")
  require(excludeFields.forall(_ >= 0), "excludeFields are 0-based indexes")
}

sealed trait InputFormat
object InputFormat {
  case object Text extends InputFormat
  case object Orc extends InputFormat
  case object Parquet extends InputFormat // engine extension (harness data)
}

/** ClickHouse wire formats the reference can emit
  * (`config/ConfigurationOptions.java:47-71`).
  */
sealed abstract class WireFormat(val separator: String)
object WireFormat {
  case object TabSeparated extends WireFormat("\t")
  case object CSV extends WireFormat(",")
}

sealed trait LoadMode
object LoadMode {
  case object Append extends LoadMode
  case object Drop extends LoadMode // drop-and-recreate daily table
}
