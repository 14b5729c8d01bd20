package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** Merge-time row-version resolution — the ClickHouse
  * `ReplacingMergeTree` semantic (keep the latest version per key, the
  * dedup a CDC/upsert ingestion needs) as an explicit batch operator:
  * the reference's ecosystem defers this to the target engine's merge;
  * a Spark-native pipeline runs it as one keyed aggregation.
  *
  * Shape: `unionByName` (no shuffle) feeding one hash aggregation on
  * the key — `max(struct(version, tiebreak, payload…))` is a map-side
  * partial aggregate, so the shuffle carries one candidate row per
  * (partition, key), never the raw update stream. At 100 TB this is
  * the minimal-movement upsert: no join, no window over the full
  * union.
  */
object Merge {

  /** Latest row per `keyCols` from `base ∪ updates`, version resolved
    * by `versionCol` (ties by `tiebreakCol` — make it unique, e.g. a
    * batch/sequence id, for deterministic output). Emits the full row
    * minus nothing: all non-key columns ride inside the argmax struct.
    */
  def replacingMerge(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      versionCol: String, tiebreakCol: String): DataFrame = {
    val all = base.unionByName(updates)
    val payload = all.columns.filterNot(keyCols.contains)
    val ordered = Seq(versionCol, tiebreakCol) ++
      payload.filterNot(c => c == versionCol || c == tiebreakCol)
    all.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"w.$c").as(c)): _*)
  }
}
