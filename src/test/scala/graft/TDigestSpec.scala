package graft

import graft.functions.{TDigest, TDigestAgg}
import org.apache.spark.sql.functions._

/** t-digest quantile sketch (q136/q137): rank-error envelope under
  * adversarial orders, merge composition, rollup, serialization.
  */
class TDigestSpec extends SparkSpec {

  private val delta = 100

  /** Distance from q to the bracketing rank interval of value v. */
  private def rankErr(sorted: Array[Double], v: Double, q: Double): Double = {
    val n = sorted.length.toDouble
    val lt = sorted.count(_ < v) / n
    val le = sorted.count(_ <= v) / n
    if (q < lt) lt - q else if (q > le) q - le else 0.0
  }

  private def digestOf(xs: Seq[Double]): TDigest = {
    val td = new TDigest(delta)
    xs.foreach(td.add(_, 1.0))
    td
  }

  private def q(td: TDigest, p: Double): Double = {
    val flat = td.toFlat
    TDigest.quantile(new org.apache.spark.sql.catalyst.util.GenericArrayData(flat), p)
  }

  private val probes = Seq(0.01, 0.1, 0.5, 0.9, 0.99)

  test("rank error stays in the envelope on uniform, skewed, and duplicate-heavy data") {
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(20000)(rnd.nextDouble() * 1000)
    val skewed  = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2))
    val dupes   = Array.fill(20000)((rnd.nextInt(50) + 1).toDouble)
    for (data <- Seq(uniform, skewed, dupes)) {
      val sorted = data.sorted
      val td = digestOf(data.toSeq)
      probes.foreach { p =>
        val err = rankErr(sorted, q(td, p), p)
        assert(err < 0.02, s"rank error $err at q=$p")
      }
    }
  }

  test("adversarial sorted and reverse-sorted insertion order keeps the envelope") {
    val data = (1 to 20000).map(_.toDouble)
    val sorted = data.toArray
    for (order <- Seq(data, data.reverse)) {
      val td = digestOf(order)
      probes.foreach { p =>
        val err = rankErr(sorted, q(td, p), p)
        assert(err < 0.02, s"rank error $err at q=$p for ordered input")
      }
    }
  }

  test("centroid count is bounded by ~2*delta regardless of n") {
    val td = digestOf((1 to 100000).map(_.toDouble))
    assert(td.toFlat.length / 2 <= 2 * delta,
      s"${td.toFlat.length / 2} centroids for delta=$delta")
  }

  test("merge of disjoint partial digests matches the guarantee of the whole") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill(30000)(rnd.nextDouble() * 100)
    val sorted = data.sorted
    val parts = data.grouped(7000).map(g => digestOf(g.toSeq)).toSeq
    val merged = parts.reduce { (a, b) => a.mergeWith(b); a }
    probes.foreach { p =>
      val err = rankErr(sorted, q(merged, p), p)
      assert(err < 0.02, s"merged rank error $err at q=$p")
    }
  }

  test("serialize/deserialize round-trip keeps quantiles in the envelope") {
    val rnd = new scala.util.Random(13)
    val data = Array.fill(20000)(rnd.nextGaussian() * 10)
    val sorted = data.sorted
    val agg = TDigestAgg(org.apache.spark.sql.catalyst.expressions.Literal(0.0), delta)
    val rt = agg.deserialize(agg.serialize(digestOf(data.toSeq)))
    probes.foreach { p =>
      val err = rankErr(sorted, q(rt, p), p)
      assert(err < 0.02, s"round-trip rank error $err at q=$p")
    }
  }

  test("DataFrame aggregate: envelope holds under 1 and 13 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val data = Seq.fill(20000)(rnd.nextDouble() * 500)
    val sorted = data.sorted.toArray
    for (np <- Seq(1, 13)) {
      val df = data.toDF("x").repartition(np)
      val v = df.agg(TDigest.tdigest_quantile(
          TDigest.tdigest_agg($"x", delta), 0.5).as("med"))
        .collect()(0).getDouble(0)
      val err = rankErr(sorted, v, 0.5)
      assert(err < 0.02, s"np=$np rank error $err")
    }
  }

  test("two-level rollup (state merge) keeps the envelope without rescanning rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val data = Seq.fill(20000)((rnd.nextInt(8), rnd.nextDouble() * 100))
    val sorted = data.map(_._2).sorted.toArray
    val fine = data.toDF("g", "x").groupBy($"g")
      .agg(TDigest.tdigest_agg($"x", delta).as("st"))
    val v = fine.agg(TDigest.tdigest_quantile(
        TDigest.tdigest_merge_agg($"st", delta), 0.9).as("p90"))
      .collect()(0).getDouble(0)
    val err = rankErr(sorted, v, 0.9)
    assert(err < 0.02, s"rollup rank error $err")
  }
}
