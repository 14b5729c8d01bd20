package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement notes:
  * - `format("noop")` write forces full materialization of every
  *   column (a bare count() would let Catalyst prune the work).
  * - One warmup action amortizes JVM/codegen/parquet-footer costs into
  *   a separate bucket so per-query numbers reflect steady state.
  * - AQE on, shuffle partitions = cores: the local[32] stand-in for a
  *   real cluster's dynamic coalescing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      spark.catalog.clearCache() // isolate queries: no cross-query cache/GC bleed
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: touch every table + run one representative query
    Tables(spark, sfDir).frames.foreach { case (_, df) => df.count() }
    runOnce("q01_agg_pricing_summary")

    // two passes, report per-query min: steady-state time, insulated
    // from one-off GC pauses and janino compilation of large plans
    val names = SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val results = names.map { n =>
      val second = runOnce(n)
      val best = (pass1(n), second) match {
        case (a, b) if a < 0 || b < 0 => math.max(a, b) // tolerate one-off failure
        case (a, b) => math.min(a, b)
      }
      n -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
