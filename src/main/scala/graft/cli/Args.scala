package graft.cli

import graft.config.{DailyExpiresProcess, InputFormat, LoadMode, LoaderConfig, WireFormat}

/** CLI argument parsing with the reference's flag names
  * (`cli/MainCliParameterParser.java:14-106`) — the migration surface:
  * an existing `clickhouse-hdfs-loader` invocation parses into a
  * [[LoaderConfig]] unchanged.
  *
  * Supported flags (same names, same defaults):
  *   --connect --driver --username --password --clickhouse-http-port
  *   --export-dir --table --fields-terminated-by --null-string
  *   --null-non-string --clickhouse-format --replace-char --dt
  *   --batch-size --max-tries --num-reduce-tasks -i --input-format
  *   --mode --daily --daily-expires --daily-expires-process
  *   --extract-hive-partitions --exclude-fields --additional-cols
  *   --direct --escape-null --input-split-max-bytes
  *   --loader-task-executor --help
  */
object Args {

  /** Flags that take no value (args4j boolean options). */
  private val NoValue = Set("--help")

  def parse(args: Seq[String]): LoaderConfig = {
    val kv = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("-"), s"unexpected argument: $a")
      if (NoValue.contains(a)) {
        kv(a.dropWhile(_ == '-')) = "true"
        i += 1
      } else {
        require(i + 1 < args.length, s"missing value for $a")
        kv(a.dropWhile(_ == '-')) = args(i + 1)
        i += 2
      }
    }
    def s(k: String, d: String) = kv.getOrElse(k, d)
    def b(k: String, d: Boolean) = kv.get(k).map(_.toBoolean).getOrElse(d)
    // -i is the blessed source-format flag; --input-format is the
    // deprecated alias the reference maps from InputFormat class names
    // (`ClickhouseHdfsLoader.java:164-176`) — accept both spellings.
    val sourceFormat = kv.get("i")
      .orElse(kv.get("input-format").map {
        case cls if cls.contains("OrcInputFormat") => "orc"
        case cls if cls.contains("TextInputFormat") => "text"
        case other => other
      })
      .getOrElse("text")
    LoaderConfig(
      connect = s("connect", ""),
      driver = s("driver", ""),
      username = s("username", ""),
      password = s("password", ""),
      clickhouseHttpPort = s("clickhouse-http-port", "8123").toInt,
      exportDir = s("export-dir", ""),
      inputFormat = sourceFormat.toLowerCase match {
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
      clickhouseFormat = WireFormat.parse(s("clickhouse-format", "TabSeparated")),
      dt = s("dt", ""),
      direct = b("direct", true),
      batchSize = s("batch-size", "150000").toInt,
      maxTries = s("max-tries", "3").toInt,
      numReduceTasks = s("num-reduce-tasks", "-1").toInt,
      loaderTaskExecutor = s("loader-task-executor", "1").toInt,
      mode = s("mode", "append") match {
        case "append" => LoadMode.Append
        case "drop" => LoadMode.Drop
        case other => throw new IllegalArgumentException(s"unknown mode $other")
      },
      daily = b("daily", false),
      dailyExpires = s("daily-expires", "3").toInt,
      dailyExpiresProcess = s("daily-expires-process", "merge").toLowerCase match {
        case "merge" => DailyExpiresProcess.Merge
        case "drop" => DailyExpiresProcess.Drop
        case other => throw new IllegalArgumentException(
          s"unknown daily-expires-process $other")
      })
  }
}
