package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries (bench methodology: noop write,
  * warmup pass, min of two runs). Usage:
  *   runMain graft.tools.ProfileQ <sfDir> <queryName> [<queryName>...]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      // default matches GraftSession; env override exists ONLY for
      // A/B-measuring the threshold itself (e.g. the r16 64k revert)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJHASH_FALLBACK", "65536"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.warmupAll(spark, dir, "profileq")
    def once(n: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val a = once(n); val b = once(n)
      println(f"[profileq] $n: min=${math.min(a, b)}%.2f s (p1=$a%.2f p2=$b%.2f)")
      // composite-gate phase attribution, if the query recorded any
      import scala.jdk.CollectionConverters._
      val phases = graft.operators.Retrieval.phaseLog.asScala.toSeq.sortBy(_._1)
      graft.operators.Retrieval.phaseLog.clear()
      if (phases.nonEmpty)
        println(phases.map { case (k, v) => f"$k=$v%.2f" }
          .mkString("[profileq]   phases: ", " ", " s"))
    }
    spark.stop()
  }
}
