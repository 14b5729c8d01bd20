package graft

import graft.functions.{AdaptiveHistogram, HistogramAgg}
import org.apache.spark.sql.functions._

/** Adaptive Ben-Haim–Tov histogram (q146): exact small-cardinality
  * regime, merge-order-invariant conservation laws, rollup,
  * serialization.
  */
class HistogramSpec extends SparkSpec {

  private def flatOf(xs: Seq[Double], nBins: Int): Array[Double] = {
    val h = new AdaptiveHistogram(nBins)
    xs.foreach(h.add(_, 1.0))
    h.toFlat
  }

  test("small-cardinality regime is EXACT: bins are the value/count multiset") {
    val data = Seq.fill(500)(Seq(1.0, 2.5, 7.0, 10.0)(scala.util.Random.nextInt(4)))
    val flat = flatOf(data, 32)
    val got = flat.grouped(2).map(a => a(0) -> a(1).toLong).toMap
    val want = data.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    assert(got == want)
  }

  test("conservation laws hold under adversarial orders and merges") {
    val rnd = new scala.util.Random(31)
    val data = Array.fill(20000)(math.exp(rnd.nextGaussian()))
    val exactSum = data.sum
    for (xs <- Seq(data.toSeq, data.sorted.toSeq, data.sorted.reverse.toSeq)) {
      val flat = flatOf(xs, 32)
      val bins = flat.grouped(2).map(a => (a(0), a(1))).toSeq
      assert(bins.size <= 32)
      assert(bins.map(_._2).sum == data.length.toDouble) // integer counts: exact
      assert(bins.map(_._1) == bins.map(_._1).sorted)
      assert(bins.head._1 >= data.min && bins.last._1 <= data.max)
      val mass = bins.map(b => b._1 * b._2).sum
      assert(math.abs(mass - exactSum) <= 1e-9 * exactSum, s"mass $mass vs $exactSum")
    }
    // disjoint-half merge preserves the same laws
    val (l, r) = data.splitAt(9000)
    val hl = new AdaptiveHistogram(32); l.foreach(hl.add(_, 1.0))
    val hr = new AdaptiveHistogram(32); r.foreach(hr.add(_, 1.0))
    hl.mergeWith(hr)
    val bins = hl.toFlat.grouped(2).map(a => (a(0), a(1))).toSeq
    assert(bins.size <= 32 && bins.map(_._2).sum == data.length.toDouble)
    assert(math.abs(bins.map(b => b._1 * b._2).sum - exactSum) <= 1e-9 * exactSum)
  }

  test("serialize round-trip of a compressed state is bit-identical") {
    val agg = HistogramAgg(org.apache.spark.sql.catalyst.expressions.Literal(0.0), 16)
    val h = new AdaptiveHistogram(16)
    (1 to 5000).foreach(i => h.add((i % 97).toDouble, 1.0))
    val rt = agg.deserialize(agg.serialize(h))
    assert(java.util.Arrays.equals(h.toFlat, rt.toFlat))
  }

  test("DataFrame two-level rollup keeps the exact regime exact") {
    import spark.implicits._
    // ≤ nBins distinct values per group AND after merge → the rollup
    // must reproduce exact per-value counts from fine states alone
    val rows = (1 to 4000).map(i => (i % 4, (i % 7).toDouble))
    val fine = rows.toDF("g", "x").groupBy($"g", ($"x" * 0).as("sub"))
      .agg(AdaptiveHistogram.histogram_agg($"x", 16).as("st"))
    val merged = fine.groupBy($"g")
      .agg(AdaptiveHistogram.histogram_merge_agg($"st", 16).as("h"))
      .select($"g", explode(expr(
        "transform(sequence(0, int(size(h)/2) - 1), i -> struct(element_at(h, int(2*i+1)) AS c, element_at(h, int(2*i+2)) AS w))")).as("b"))
      .select($"g", $"b.c", $"b.w")
      .collect().map(r => (r.getInt(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = rows.groupBy(identity).map { case ((g, v), gs) => (g, v) -> gs.size.toDouble }
    assert(merged == want)
  }
}
