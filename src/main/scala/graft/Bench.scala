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
  * - Per-query MEDIAN of 3 passes (the `agg` field names the mode for
  *   cross-round comparers).
  * - AQE on, shuffle partitions = cores: the local[32] stand-in for a
  *   real cluster's dynamic coalescing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
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

    val loadBefore =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0)
      catch { case _: Throwable => "-1" }
    // warmup: touch every table + run one representative query
    Tables.warmupAll(spark, sfDir, "bench")
    runOnce("q01_agg_pricing_summary")

    // three passes, report per-query MEDIAN: robust to a one-off GC
    // pause / janino compile (which min also is) AND to a one-off
    // lucky cache hit (which min is not) — round-over-round totals
    // stop swinging with single-pass machine-load noise
    // Optional subset (bisection / regression hunts): SPARK_GRAFT_MAX_Q=99
    // keeps only queries numbered <= N, so a historical round's exact
    // query set can be re-timed in isolation on the current jar;
    // SPARK_GRAFT_SKIP_Q=q34,q43 drops named prefixes (documented-
    // quadratic gates at big synthetic scale points); SPARK_GRAFT_PASSES
    // overrides the pass count (1 for long large-scale runs).
    val maxQ = sys.env.get("SPARK_GRAFT_MAX_Q").map(_.toInt)
    val skip = sys.env.get("SPARK_GRAFT_SKIP_Q")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val nPasses = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    // SPARK_GRAFT_ONLY_Q=q92,q93 runs ONLY the named prefixes — the
    // complement of SKIP_Q, for re-timing a handful of queries (e.g.
    // finishing a long scale run that lost its tail to a kill) without
    // paying the whole suite again.
    val only = sys.env.get("SPARK_GRAFT_ONLY_Q")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      maxQ.forall(m => n.drop(1).takeWhile(_.isDigit).toInt <= m) &&
        !skip.exists(s => n.startsWith(s)) &&
        only.forall(_.exists(s => n.startsWith(s)))
    }
    val passes = (1 to nPasses).map(_ => names.map(n => n -> runOnce(n)).toMap)
    val results = names.map { n =>
      val ts = passes.map(_(n)).filter(_ >= 0).sorted
      val agg = ts.length match {
        case 0 => -1.0
        case k => ts(k / 2) // median; lower-median for k=2
      }
      n -> agg
    }
    // The driver captures only a bounded tail of this process's output,
    // so the ONE JSON line must stay well under 2000 chars: short qNN
    // keys (contract example style: {"q1":sec,…}) + 2-decimal values
    // (149 queries at 3 decimals measured 1942 chars — one query from
    // truncation; 10 ms resolution is noise at suite scale anyway).
    // Full-name 3-decimal timings land in docs/bench_detail.json for
    // humans and tools/compare_bench.py.
    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def r2(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    // line values additionally drop trailing zeros ("0.50" → "0.5",
    // "2.00" → "2") — ~1 char/query that keeps the 157-query line
    // comfortably under the driver's 2000-char recorded tail
    def rt(v: Double): String = {
      val s = r2(v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    // line keys drop the "q" prefix too ("163":1.2) — 1 char/query
    // that keeps the 168-query line under the 2000-char recorded tail;
    // tools/compare_bench.py normalizes both key styles
    def rt1(v: Double): String = {
      val s0 = if (v < 0) "-1" else f"$v%.1f"
      if (s0.contains('.')) s0.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s0
    }
    // last-resort width: whole seconds ("2", "0") — ~8 chars/query
    // keeps even a 250-query line inside the recorded tail; sub-second
    // resolution lives in docs/bench_detail.json regardless
    def rt0(v: Double): String = if (v < 0) "-1" else f"$v%.0f"
    def renderQs(fmt: Double => String): String = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_').drop(1) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val agg = s"median$nPasses"
    def render(fmt: Double => String): String =
      s"""{"metric":"total","value":${r2(total)},"unit":"sec","agg":"$agg","queries":${renderQs(fmt)},"sf":"$sfDir"}"""
    // adaptive width: a loaded machine renders more digits, and the
    // driver records only a bounded output tail — if the 2-decimal
    // line nears the limit, fall back to 1-decimal (full-precision
    // timings always land in docs/bench_detail.json)
    val line = {
      val l2 = render(rt)
      if (l2.length <= 1900) l2
      else {
        val l1 = render(rt1)
        if (l1.length <= 1900) l1 else render(rt0)
      }
    }
    // load context: 1-min loadavg before/after the run — the round-9
    // bisect traced a +26% cross-round total swing to machine/session
    // drift (same jar, same queries, different day), so totals are
    // only comparable alongside their load context
    def load1: String =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0)
      catch { case _: Throwable => "-1" }
    val loadAfter = load1
    // composite-gate phase attribution (final pass's values): which
    // phase of a multi-phase gate (e.g. q116 build/append/probe) moved
    import scala.jdk.CollectionConverters._
    val phases = graft.operators.Retrieval.phaseLog.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{\"queries\":{", ",",
        s"""},"total":${r3(total)},"agg":"$agg","sf":"$sfDir"""" +
          s""","phases":$phases""" +
          s""","load1_before":$loadBefore,"load1_after":$loadAfter}""")
    try {
      val p = java.nio.file.Paths.get("docs/bench_detail.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, detail + "\n")
    } catch { case _: Throwable => () } // detail dump is best-effort
    println(line)
    spark.stop()
  }
}
