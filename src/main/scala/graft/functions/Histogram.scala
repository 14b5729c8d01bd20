package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Adaptive streaming histogram (Ben-Haim–Tov / the reference
  * ecosystem's `histogram(bins)`): at most `nBins` (centroid, count)
  * pairs maintained by always merging the CLOSEST adjacent pair —
  * no pre-declared bucket bounds, which is the point for data whose
  * range is unknown upfront at 100 TB.
  *
  * Unlike the HLL/KMV/bitmap states, the merge is order-sensitive
  * and carries NO hard rank bound — so the gate audits the
  * INVARIANTS the construction provably preserves under ANY merge
  * order instead of bin positions:
  *   - bin count ≤ nBins, centroids strictly increasing;
  *   - Σ counts == n EXACTLY (counts are integers carried in
  *     doubles, closed under addition far below 2^53);
  *   - min value ≤ every centroid ≤ max value (weighted means);
  *   - Σ centroid·count == Σ x exactly in real arithmetic (each
  *     closest-pair merge preserves the weighted sum), checked under
  *     a float-roundoff envelope.
  * That is the honest contract; anything sharper (bin placement)
  * depends on arrival order by construction.
  *
  * State is the interleaved (centroid, count) array sorted by
  * centroid; [[HistogramMergeAgg]] re-aggregates persisted states
  * (concat as weighted points + re-compress), same rollup shape as
  * the t-digest/HLL State/Merge pairs.
  */
case class HistogramAgg(
    child: Expression,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AdaptiveHistogram] {

  require(nBins >= 2 && nBins <= 1000, "nBins in [2, 1000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): AdaptiveHistogram =
    new AdaptiveHistogram(nBins)

  override def update(buf: AdaptiveHistogram, input: InternalRow): AdaptiveHistogram = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(a: AdaptiveHistogram, b: AdaptiveHistogram): AdaptiveHistogram = {
    a.mergeWith(b); a
  }

  override def eval(buf: AdaptiveHistogram): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: AdaptiveHistogram): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): AdaptiveHistogram =
    AdaptiveHistogram.fromBytes(nBins, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HistogramAgg =
    copy(child = cs.head)
}

/** Re-aggregation of persisted [[HistogramAgg]] states (interleaved
  * arrays): bins re-enter as weighted points and compress under the
  * same closest-pair rule.
  */
case class HistogramMergeAgg(
    child: Expression,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[AdaptiveHistogram] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): AdaptiveHistogram =
    new AdaptiveHistogram(nBins)

  override def update(buf: AdaptiveHistogram, input: InternalRow): AdaptiveHistogram = {
    val v = buf
    val st = child.eval(input)
    if (st != null) {
      val arr = st.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements() / 2
      var i = 0
      while (i < n) {
        v.add(arr.getDouble(2 * i), arr.getDouble(2 * i + 1))
        i += 1
      }
    }
    v
  }

  override def merge(a: AdaptiveHistogram, b: AdaptiveHistogram): AdaptiveHistogram = {
    a.mergeWith(b); a
  }

  override def eval(buf: AdaptiveHistogram): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: AdaptiveHistogram): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): AdaptiveHistogram =
    AdaptiveHistogram.fromBytes(nBins, bytes)

  override def withNewMutableAggBufferOffset(o: Int): HistogramMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HistogramMergeAgg =
    copy(child = cs.head)
}

/** Mutable Ben-Haim–Tov kernel: sorted (centroid, count) bins with a
  * small insertion buffer folded in by compress; the closest-pair
  * merge is deterministic (leftmost minimal gap wins ties).
  */
final class AdaptiveHistogram(val nBins: Int) extends Serializable {
  private var ms: Array[Double] = new Array[Double](0)
  private var ws: Array[Double] = new Array[Double](0)
  private var n = 0
  private val bufCap = math.max(32, nBins)
  private var bm = new Array[Double](bufCap)
  private var bw = new Array[Double](bufCap)
  private var nb = 0

  def add(x: Double, w: Double): Unit = {
    if (nb == bufCap) compress()
    bm(nb) = x
    bw(nb) = w
    nb += 1
  }

  def mergeWith(other: AdaptiveHistogram): Unit = {
    other.compress()
    var i = 0
    while (i < other.n) { add(other.ms(i), other.ws(i)); i += 1 }
  }

  def compress(): Unit = {
    if (nb == 0) return
    val total = n + nb
    val am = new Array[Double](total)
    val aw = new Array[Double](total)
    System.arraycopy(ms, 0, am, 0, n)
    System.arraycopy(ws, 0, aw, 0, n)
    System.arraycopy(bm, 0, am, n, nb)
    System.arraycopy(bw, 0, aw, n, nb)
    val idx = Array.range(0, total).sortBy(am(_))
    // coalesce equal centroids, then closest-pair merge down to nBins
    val sm = new Array[Double](total)
    val sw = new Array[Double](total)
    var k = -1
    idx.foreach { i =>
      if (k >= 0 && am(i) == sm(k)) sw(k) += aw(i)
      else { k += 1; sm(k) = am(i); sw(k) = aw(i) }
    }
    var cnt = k + 1
    while (cnt > nBins) {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < cnt - 1) {
        val gap = sm(i + 1) - sm(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val wsum = sw(best) + sw(best + 1)
      sm(best) = sm(best) + (sm(best + 1) - sm(best)) * (sw(best + 1) / wsum)
      sw(best) = wsum
      i = best + 1
      while (i < cnt - 1) { sm(i) = sm(i + 1); sw(i) = sw(i + 1); i += 1 }
      cnt -= 1
    }
    ms = java.util.Arrays.copyOf(sm, cnt)
    ws = java.util.Arrays.copyOf(sw, cnt)
    n = cnt
    nb = 0
  }

  def toFlat: Array[Double] = {
    compress()
    val out = new Array[Double](2 * n)
    var i = 0
    while (i < n) { out(2 * i) = ms(i); out(2 * i + 1) = ws(i); i += 1 }
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

object AdaptiveHistogram {

  def fromBytes(nBins: Int, bytes: Array[Byte]): AdaptiveHistogram = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val len = bb.getInt()
    val h = new AdaptiveHistogram(nBins)
    var i = 0
    while (i < len) { h.add(bb.getDouble(), bb.getDouble()); i += 2 }
    h
  }

  def histogram_agg(value: Column, nBins: Int): Column =
    column(HistogramAgg(expression(value), nBins).toAggregateExpression())

  def histogram_merge_agg(state: Column, nBins: Int): Column =
    column(HistogramMergeAgg(expression(state), nBins).toAggregateExpression())
}
