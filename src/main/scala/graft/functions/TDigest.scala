package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Merging t-digest (Dunning's k1 scale) as a distributed aggregate —
  * the quantile sketch beside [[HllAgg]] (distinct), [[CountMinAgg]]
  * (frequency), [[HeavyHittersAgg]] (top-k) and [[KmvAgg]] (set
  * algebra): the `quantileTDigest`-family of the reference ecosystem,
  * with [[TDigestMergeAgg]] as its `quantileTDigestState`/`Merge`
  * persisted-rollup side.
  *
  * State = centroids (mean, weight) sorted by mean, bounded by the
  * k1 scale `k(q) = δ/(2π)·asin(2q−1)`: adjacent centroids merge
  * while their k-span stays ≤ 1, which caps the centroid count at
  * ~2δ regardless of input size and keeps extreme quantiles tight
  * (centroid capacity → 1 at q → 0 or 1). Raw values buffer up to
  * 8δ before a compress pass, so update cost is amortized
  * O(log δ)-ish sort share, and partial states merge by
  * concatenate + compress — associative up to rank error, which is
  * the guarantee the gates check (the sketch is NOT bit-identical
  * across partitionings, unlike HLL/KMV; its contract is a rank
  * envelope, and SketchAggSpec pins that envelope under adversarial
  * orderings and partition counts).
  *
  * The interchange format is a flat `array<double>` of interleaved
  * (mean, weight) pairs in mean order — readable by
  * [[TDigestQuantile]] (scalar interpolation) and re-aggregable by
  * [[TDigestMergeAgg]] from a parquet rollup without rescanning raw
  * data. Fixed small size (δ=100 → ≤ ~400 doubles) makes a daily
  * rollup row trivially broadcast-able.
  */
case class TDigestAgg(
    child: Expression,
    delta: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  require(delta >= 20 && delta <= 1000, "delta in [20, 1000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigest = new TDigest(delta)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = { a.mergeWith(b); a }

  override def eval(buf: TDigest): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: TDigest): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.fromBytes(delta, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TDigestAgg =
    copy(child = cs.head)
}

/** Re-aggregation of PERSISTED t-digest states (flat interleaved
  * arrays): concatenate centroids as weighted points and compress
  * under the same scale bound. Rolling up rollups composes — each
  * level keeps the centroid cap, and rank error grows only by the
  * per-merge bound (spec-pinned).
  */
case class TDigestMergeAgg(
    child: Expression,
    delta: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigest = new TDigest(delta)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements() / 2
      var i = 0
      while (i < n) {
        buf.add(arr.getDouble(2 * i), arr.getDouble(2 * i + 1))
        i += 1
      }
    }
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = { a.mergeWith(b); a }

  override def eval(buf: TDigest): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: TDigest): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.fromBytes(delta, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TDigestMergeAgg =
    copy(child = cs.head)
}

/** Quantile interpolation over a t-digest state: centroids occupy
  * rank mass [cum, cum+w) with their mean at the midpoint; the
  * answer linearly interpolates between bracketing midpoints and
  * clamps to the first/last centroid mean at the extremes. One
  * deterministic pass per GROUP via the shared JVM kernel in both
  * interpreted and generated code.
  */
case class TDigestQuantile(child: Expression, q: Double) extends UnaryExpression {

  require(q >= 0.0 && q <= 1.0, "q in [0, 1]")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(state: Any): Any =
    TDigest.quantile(state.asInstanceOf[ArrayData], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TDigest.quantile($c, $q)")

  override protected def withNewChildInternal(c: Expression): TDigestQuantile =
    copy(child = c)
}

/** Mutable merging-digest kernel. Centroids + a raw buffer; compress
  * folds both into the k1-bounded centroid list.
  */
final class TDigest(val delta: Int) extends Serializable {
  // interleaved (mean, weight), sorted by mean, compressed
  private var cMeans: Array[Double] = Array.empty
  private var cWeights: Array[Double] = Array.empty
  private var nCentroids: Int = 0
  // raw buffer
  private val bufCap = 8 * delta
  private var bMeans: Array[Double] = new Array[Double](bufCap)
  private var bWeights: Array[Double] = new Array[Double](bufCap)
  private var nBuf: Int = 0

  def add(x: Double, w: Double): Unit = {
    if (nBuf == bufCap) compress()
    bMeans(nBuf) = x
    bWeights(nBuf) = w
    nBuf += 1
  }

  def mergeWith(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.nCentroids) {
      add(other.cMeans(i), other.cWeights(i))
      i += 1
    }
  }

  private def kScale(qv: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(2.0 * qv - 1.0)

  def compress(): Unit = {
    val n = nCentroids + nBuf
    if (nBuf == 0 || n == 0) { nBuf = 0; return }
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(cMeans, 0, ms, 0, nCentroids)
    System.arraycopy(cWeights, 0, ws, 0, nCentroids)
    System.arraycopy(bMeans, 0, ms, nCentroids, nBuf)
    System.arraycopy(bWeights, 0, ws, nCentroids, nBuf)
    // sort pairs by mean (indices sort keeps pairs together)
    val idx = Array.range(0, n).sortBy(ms(_))
    var total = 0.0
    var i = 0
    while (i < n) { total += ws(i); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var outN = 0
    var curM = ms(idx(0))
    var curW = ws(idx(0))
    var wBefore = 0.0 // weight strictly before the current centroid
    i = 1
    while (i < n) {
      val m = ms(idx(i))
      val w = ws(idx(i))
      val q0 = wBefore / total
      val q2 = (wBefore + curW + w) / total
      if (kScale(q2) - kScale(q0) <= 1.0) {
        // weighted-mean absorb
        val nw = curW + w
        curM += (m - curM) * (w / nw)
        curW = nw
      } else {
        outM(outN) = curM; outW(outN) = curW; outN += 1
        wBefore += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM(outN) = curM; outW(outN) = curW; outN += 1
    cMeans = java.util.Arrays.copyOf(outM, outN)
    cWeights = java.util.Arrays.copyOf(outW, outN)
    nCentroids = outN
    nBuf = 0
  }

  def toFlat: Array[Double] = {
    compress()
    val out = new Array[Double](2 * nCentroids)
    var i = 0
    while (i < nCentroids) {
      out(2 * i) = cMeans(i)
      out(2 * i + 1) = cWeights(i)
      i += 1
    }
    out
  }

  def toBytes: Array[Byte] = {
    val flat = toFlat
    val bb = java.nio.ByteBuffer.allocate(4 + flat.length * 8)
    bb.putInt(flat.length)
    flat.foreach(bb.putDouble)
    bb.array()
  }
}

object TDigest {

  def fromBytes(delta: Int, bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val len = bb.getInt()
    val td = new TDigest(delta)
    var i = 0
    while (i < len) {
      td.add(bb.getDouble(), bb.getDouble())
      i += 2
    }
    td
  }

  /** Shared quantile kernel over the flat interleaved state. */
  def quantile(state: ArrayData, q: Double): Double = {
    val n = state.numElements() / 2
    if (n == 0) return Double.NaN
    if (n == 1) return state.getDouble(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += state.getDouble(2 * i + 1); i += 1 }
    val target = q * total
    // midpoint ranks: centroid i covers [cum, cum+w), midpoint cum+w/2
    var cum = 0.0
    var prevMid = 0.0
    var prevMean = state.getDouble(0)
    i = 0
    while (i < n) {
      val m = state.getDouble(2 * i)
      val w = state.getDouble(2 * i + 1)
      val mid = cum + w / 2.0
      if (target < mid) {
        if (i == 0) return m // clamp at the low extreme
        val f = (target - prevMid) / (mid - prevMid)
        return prevMean + f * (m - prevMean)
      }
      prevMid = mid
      prevMean = m
      cum += w
      i += 1
    }
    prevMean // clamp at the high extreme
  }

  def tdigest_agg(value: Column, delta: Int): Column =
    column(TDigestAgg(expression(value), delta).toAggregateExpression())

  def tdigest_merge_agg(state: Column, delta: Int): Column =
    column(TDigestMergeAgg(expression(state), delta).toAggregateExpression())

  def tdigest_quantile(state: Column, q: Double): Column =
    column(TDigestQuantile(expression(state), q))
}
