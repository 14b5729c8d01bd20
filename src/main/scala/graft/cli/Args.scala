package graft.cli

import graft.config.{InputFormat, LoadMode, LoaderConfig, WireFormat}

/** CLI argument parsing with the reference's flag names
  * (`cli/MainCliParameterParser.java:14-106`) — the migration surface:
  * an existing `clickhouse-hdfs-loader` invocation parses into a
  * [[LoaderConfig]] unchanged.
  *
  * Supported flags (same names, same defaults):
  *   --export-dir --table --fields-terminated-by --null-string
  *   --null-non-string --clickhouse-format --replace-char --dt
  *   --batch-size --max-tries --input-format --mode
  *   --extract-hive-partitions --exclude-fields --additional-cols
  *   --direct --escape-null --input-split-max-bytes
  *   --loader-task-executor
  */
object Args {

  def parse(args: Seq[String]): LoaderConfig = {
    val kv = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument: $a")
      require(i + 1 < args.length, s"missing value for $a")
      kv(a.drop(2)) = args(i + 1)
      i += 2
    }
    def s(k: String, d: String) = kv.getOrElse(k, d)
    def b(k: String, d: Boolean) = kv.get(k).map(_.toBoolean).getOrElse(d)
    LoaderConfig(
      exportDir = s("export-dir", ""),
      inputFormat = s("input-format", "text").toLowerCase match {
        case "text" => InputFormat.Text
        case "orc" => InputFormat.Orc
        case "parquet" => InputFormat.Parquet
        case other => throw new IllegalArgumentException(s"unknown input-format $other")
      },
      fieldsTerminatedBy = s("fields-terminated-by", "|"),
      inputSplitMaxBytes = s("input-split-max-bytes", "268435456").toLong,
      extractHivePartitions = b("extract-hive-partitions", false),
      excludeFields = s("exclude-fields", "") match {
        case "" => Nil
        case v  => v.split(",").map(_.trim.toInt).toSeq
      },
      additionalCols = s("additional-cols", "") match {
        case "" => Nil
        case v  => v.split(",").map(_.trim).toSeq
      },
      nullString = s("null-string", ""),
      nullNonString = s("null-non-string", "0"),
      escapeNull = b("escape-null", true),
      replaceChar = s("replace-char", " "),
      table = s("table", ""),
      clickhouseFormat = s("clickhouse-format", "TabSeparated") match {
        case "TabSeparated" => WireFormat.TabSeparated
        case "CSV" => WireFormat.CSV
        case other => throw new IllegalArgumentException(s"unknown clickhouse-format $other")
      },
      dt = s("dt", ""),
      direct = b("direct", true),
      batchSize = s("batch-size", "150000").toInt,
      maxTries = s("max-tries", "3").toInt,
      loaderTaskExecutor = s("loader-task-executor", "1").toInt,
      mode = s("mode", "append") match {
        case "append" => LoadMode.Append
        case "drop" => LoadMode.Drop
        case other => throw new IllegalArgumentException(s"unknown mode $other")
      })
  }
}
