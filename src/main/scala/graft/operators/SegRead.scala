package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-memoized reads of index SUB-TABLE directories — the
  * [[graft.Tables]] schema-cache rationale for the persisted-index
  * layouts: `spark.read.parquet` pays ~60 ms of file-index + footer
  * schema inference per call (tools/FloorProbe), and every score /
  * probe / apply of the streaming-index matrix re-reads 2-3
  * sub-tables whose schemas are FIXED by their layout contracts
  * (c12 is always (w1, w2, c12), sets is always (kh, hs), ...). The
  * directories themselves are per-gate temp paths, so a path-keyed
  * cache would never hit: the memo keys on a LAYOUT TAG instead — the
  * first read of a tag infers from the footer, every later read of
  * any directory carrying that layout passes the schema explicitly.
  *
  * Metadata only (schemas, never rows); a tag must be used for
  * exactly one writer layout — mis-tagging would surface as
  * null-filled columns, so tags are namespaced per family below.
  * Partitioned layouts (near-dup `bands`, IVF `members`, clip
  * `postings`) are deliberately NOT routed through this: their reads
  * mix directory-partition discovery with footer schema and keep the
  * plain inference path.
  */
private[graft] object SegRead {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def apply(spark: SparkSession, path: String, tag: String): DataFrame = {
    val s = cache.get(tag)
    if (s != null) spark.read.schema(s).parquet(path)
    else {
      val df = spark.read.parquet(path)
      cache.put(tag, df.schema)
      df
    }
  }
}
