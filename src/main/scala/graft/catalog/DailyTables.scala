package graft.catalog

import org.apache.spark.sql.SparkSession

/** Daily-table lifecycle (SURVEY.md §2.A #20-#22): date-suffixed
  * physical tables `<base>_yyyyMMdd`, created per load, merged into
  * the base table and dropped once older than an expiry window — the
  * reference's deprecated `--daily` path
  * (`ClickhouseHdfsLoader.java:125-140,338-420`;
  * `task/OldDailyMergeTask.java:42-141`).
  *
  * On Spark this pattern is normally replaced by a partitioned table +
  * dynamic partition overwrite (the non-deprecated path the engine
  * recommends); it is still provided for workflow parity. The merge
  * scan uses the same discovery predicate the reference emits:
  * `name ~ '<base>_\d{8}$'` and `name <= '<base>_<cutoff>'`.
  */
final class DailyTables(spark: SparkSession) {

  private val fmt = java.time.format.DateTimeFormatter.BASIC_ISO_DATE // yyyyMMdd

  def dailyName(base: String, dt: java.time.LocalDate): String =
    s"${base}_${dt.format(fmt)}"

  /** Op #20: create the daily table from the base table's schema.
    * `dropFirst` mirrors `--daily-mode drop` (recreate empty).
    */
  def createDaily(base: String, dt: java.time.LocalDate, dropFirst: Boolean = false): String = {
    val t = dailyName(base, dt)
    if (dropFirst) spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $t LIKE $base")
    t
  }

  /** Tables matching `<base>_\d{8}` in the given database. */
  def listDaily(db: String, base: String): Seq[String] = {
    val baseName = base.split('.').last
    val pat = (java.util.regex.Pattern.quote(baseName) + "_\\d{8}$").r
    spark.catalog.listTables(db).collect()
      .map(_.name)
      .filter(n => pat.findFirstIn(n).isDefined)
      .toSeq
  }

  /** Op #21: merge every expired daily table into the base
    * (`INSERT INTO base SELECT * FROM old`, then drop), or just drop
    * when `merge=false`. Cutoff = dt − expires days, same string
    * comparison the reference's discovery SQL uses
    * (`OldDailyMergeTask.java:86,113`).
    */
  def mergeExpired(db: String, base: String, dt: java.time.LocalDate,
      expiresDays: Int, merge: Boolean = true): Seq[String] = {
    val cutoff = dailyName(base.split('.').last, dt.minusDays(expiresDays.toLong))
    val expired = listDaily(db, base).filter(_ <= cutoff)
    expired.foreach { t =>
      val full = s"$db.$t"
      if (merge) spark.sql(s"INSERT INTO $base SELECT * FROM $full")
      spark.sql(s"DROP TABLE IF EXISTS $full")
    }
    expired
  }
}
