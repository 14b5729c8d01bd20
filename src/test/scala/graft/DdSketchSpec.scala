package graft

import graft.functions.DdSketch
import org.apache.spark.sql.functions._

/** Pins DDSketch's deterministic relative-error guarantee, the
  * bit-exact mergeability (the property that separates it from the
  * t-digest), collapse count conservation, and the distributed
  * partitioning invariance of the interchange state.
  */
class DdSketchSpec extends SparkSpec {

  private def exactRankTarget(sorted: Array[Double], q: Double): Double =
    sorted(math.floor(q * (sorted.length - 1)).toInt)

  test("every quantile estimate is within alpha of the exact rank item") {
    val rnd = new scala.util.Random(31)
    for (alpha <- Seq(0.01, 0.05)) {
      // adversarial mix: lognormal spread, a heavy duplicate cluster,
      // near-boundary values, tiny and huge magnitudes
      val xs = Array.fill(5000)(math.exp(rnd.nextGaussian() * 3)) ++
        Array.fill(1000)(42.0) ++
        Array.tabulate(100)(i => 1e-6 * (i + 1)) ++
        Array.tabulate(100)(i => 1e9 + i * 1e7)
      val s = new DdSketch(alpha, 65536)
      xs.foreach(s.insert)
      val sorted = xs.sorted
      for (qi <- 0 to 100; q = qi / 100.0) {
        val est = s.quantile(q)
        val exact = exactRankTarget(sorted, q)
        assert(math.abs(est - exact) <= alpha * exact * (1 + 1e-9),
          s"alpha=$alpha q=$q est=$est exact=$exact")
      }
    }
  }

  test("merges are bit-exact under any partitioning and merge order") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(4000)(math.exp(rnd.nextGaussian() * 2))
    val whole = new DdSketch(0.02, 4096)
    xs.foreach(whole.insert)
    for (nParts <- Seq(2, 7, 31)) {
      val parts = xs.grouped(xs.length / nParts + 1).map { chunk =>
        val p = new DdSketch(0.02, 4096)
        chunk.foreach(p.insert)
        p
      }.toSeq
      // fold in a shuffled order — bucket addition commutes exactly
      val acc = new DdSketch(0.02, 4096)
      rnd.shuffle(parts).foreach(acc.mergeWith)
      assert(acc.toFlat.sameElements(whole.toFlat), s"nParts=$nParts")
    }
  }

  test("distributed state is identical at any parallelism; rollup == direct") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 3}", s"s${i % 5}", math.exp(rnd.nextGaussian() * 2)))
    val df = rows.toDF("g", "sub", "x")
    def stateOf(parts: Int): Map[String, Seq[Long]] =
      df.repartition(parts).groupBy($"g")
        .agg(DdSketch.dd_agg($"x", 0.01).as("st"))
        .as[(String, Seq[Long])].collect().toMap
    val s1 = stateOf(1)
    assert(stateOf(8) == s1 && stateOf(32) == s1)
    // two-level rollup produces the identical state array
    val rolled = df.groupBy($"g", $"sub")
      .agg(DdSketch.dd_agg($"x", 0.01).as("st"))
      .groupBy($"g")
      .agg(DdSketch.dd_merge_agg($"st", 0.01).as("st"))
      .as[(String, Seq[Long])].collect().toMap
    assert(rolled == s1)
    // and therefore bit-identical quantiles
    val qd = df.groupBy($"g").agg(
      DdSketch.dd_quantile(DdSketch.dd_agg($"x", 0.01), 0.5, 0.01).as("m"))
      .as[(String, Double)].collect().toMap
    val qr = rolled.map { case (g, st) =>
      g -> DdSketch.quantileOfState(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(st.toArray),
        0.5, 0.01, 2048)
    }
    assert(qd == qr)
  }

  test("collapse conserves counts and keeps upper quantiles in bound") {
    val rnd = new scala.util.Random(99)
    val xs = Array.fill(20000)(math.exp(rnd.nextGaussian()))
    val s = new DdSketch(0.05, 64) // far fewer buckets than distinct indexes
    xs.foreach(s.insert)
    assert(s.totalCount == xs.length.toLong)
    val sorted = xs.sorted
    // collapse folds LOW buckets; quantiles above the collapsed mass
    // keep the deterministic bound
    for (q <- Seq(0.9, 0.95, 0.99)) {
      val est = s.quantile(q)
      val exact = exactRankTarget(sorted, q)
      assert(math.abs(est - exact) <= 0.05 * exact * (1 + 1e-9),
        s"q=$q est=$est exact=$exact")
    }
  }

  test("zero bucket: zeros count and quantiles below the zero mass are 0") {
    val s = new DdSketch(0.01, 1024)
    (1 to 50).foreach(_ => s.insert(0.0))
    (1 to 50).foreach(i => s.insert(i.toDouble))
    assert(s.totalCount == 100L)
    assert(s.quantile(0.25) == 0.0)
    assert(s.quantile(0.75) > 0.0)
  }
}
