package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side small-file compaction — the complement of the
  * reference's read-side split packing (`CombineTextInputFormat`,
  * `ClickhouseHdfsLoader.java:161`): a 100 TB pipeline that emits
  * thousands of small files per partition poisons every downstream
  * scan (one task per file, metadata-bound planning).
  *
  * Spark-native levers, no custom writer needed:
  *  - `maxRecordsPerFile` caps file size without a shuffle;
  *  - `repartitionByRange(cols)` first clusters rows so each output
  *    file covers a contiguous key range (min/max parquet footer
  *    stats then prune downstream scans). For TWO filter dimensions,
  *    cluster by the Morton code instead —
  *    `clusterBy = Seq("z")` after
  *    `withColumn("z", ZOrder2.zorder($"x", $"y"))` — so both
  *    columns' footer ranges stay selective in every file.
  */
object Compaction {

  /** Rewrite `df` under `path` with at most `maxRecordsPerFile` rows
    * per file, optionally range-clustered by `clusterBy` so footer
    * stats are selective. `nFiles` bounds the pre-write partition
    * count (≈ total/maxRecordsPerFile rounded up by the caller).
    */
  def compactTo(df: DataFrame, path: String, maxRecordsPerFile: Int,
      nFiles: Int, clusterBy: Seq[String] = Nil,
      codec: String = "zstd"): Unit = {
    import org.apache.spark.sql.functions.col
    val arranged =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
      else df.repartition(nFiles)
    arranged.write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      // zstd default: at archive scale the ~30% size win over snappy
      // is CPU-cheap on write-once/read-many compacted data
      .option("compression", codec)
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
