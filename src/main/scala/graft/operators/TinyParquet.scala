package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side reads of TINY parquet tables (index META: a handful of
  * rows of layout constants) — the [[graft.streaming.BatchLog]]
  * rationale one step further: `spark.read.parquet(meta).head` costs a
  * schema-inference pass plus a scheduled job on EVERY append/probe,
  * and on a cluster that is a whole job round-trip for what is
  * semantically one namenode read. Plain parquet-hadoop reads the same
  * bytes on the driver with no job. ONLY for bounded metadata tables
  * (meta/stats rows, never data); writers are unchanged, so Spark and
  * DuckDB readers still see ordinary parquet.
  */
private[graft] object TinyParquet {
  /** Every row of `dir` (a parquet directory or single file) as
    * example Groups, in file-name-then-row order.
    */
  def rows(conf: org.apache.hadoop.conf.Configuration,
      dir: String): Seq[Group] = {
    val dirP = new Path(dir)
    val fs = dirP.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(dirP).isFile) Seq(dirP)
      else fs.listStatus(dirP)
        .filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .sortBy(_.getPath.getName)
        .map(_.getPath)
        .toSeq
    files.flatMap { p =>
      val reader = ParquetReader.builder(new GroupReadSupport(), p)
        .withConf(conf).build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toList
      finally reader.close()
    }
  }
}
