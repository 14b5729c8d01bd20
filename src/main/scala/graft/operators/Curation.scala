package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.syntax._

/** End-to-end corpus curation funnel — the composition a training-data
  * pipeline actually runs (language filter → quality filter → exact
  * dedup → benchmark decontamination), with the per-stage audit counts
  * a production ingest must report (every dropped row accounted to the
  * stage that dropped it).
  *
  * Scale shape: the two filters are map-side (no shuffle); dedup is
  * one content-keyed shuffle (at corpus scale key it by a 64/128-bit
  * content hash so the exchange carries 8-byte keys — here the gate
  * groups by the text itself so the DuckDB oracle can re-derive the
  * stage); decontamination is the [[Dedup.contaminationScan]] inverted
  * n-gram join with the eval side broadcast. The counts frame is a
  * union of scalar aggregates — 5 partial-agg passes, no wide rows.
  */
object Curation {

  /** The named stage frames, raw-to-final. */
  private def stages(docs: DataFrame, lang: String, n: Int,
      evalMod: Long): Seq[(String, DataFrame)] = {
    val s1 = docs.filter($"lang" === lang)
    val s2 = s1.filter(TextFunctions.isQuality($"text"))
    val s3 = s2.groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"text")
    val evalSet = docs.filter($"doc_id" % evalMod === 0)
    val contaminated = Dedup.contaminationScan(s3, evalSet, "doc_id", "text", n)
      .select($"doc_id")
    val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
    Seq("raw" -> docs, "lang" -> s1, "quality" -> s2,
      "dedup" -> s3, "decontaminated" -> s4)
  }

  /** The surviving documents after all four stages. */
  def curate(docs: DataFrame, lang: String, n: Int = 4,
      evalMod: Long = 97L): DataFrame =
    stages(docs, lang, n, evalMod).last._2

  /** Stage-by-stage audit counts: (stage, stage_name, n). */
  def funnel(docs: DataFrame, lang: String, n: Int = 4,
      evalMod: Long = 97L): DataFrame =
    stages(docs, lang, n, evalMod).zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit(i).cast("long").as("stage"), lit(name).as("stage_name"), $"n")
    }.reduce(_ unionByName _)
}
