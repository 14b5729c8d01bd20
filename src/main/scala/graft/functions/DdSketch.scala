package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** DDSketch — the relative-error quantile sketch (Masson, Rim & Lee,
  * VLDB 2019, public algorithm). Buckets are geometric:
  * `i = ceil(log_γ(x))` with `γ = (1+α)/(1−α)`, so every value in
  * bucket i lies in `(γ^(i−1), γ^i]` and the midpoint estimate
  * `2γ^i/(γ+1)` is within relative error α of ANY value in the
  * bucket — a DETERMINISTIC guarantee, not a probabilistic envelope
  * (the q157 gate audits it as exact rank inequalities).
  *
  * Beside the rank-error t-digest (q136) and the adaptive histogram
  * (q146) this completes the quantile family with the third public
  * guarantee type. Two properties the t-digest cannot offer, both
  * spec-pinned:
  *  - merges are EXACT (integer bucket addition): any partitioning,
  *    rollup nesting or replay produces bit-identical estimates;
  *  - the α bound holds at every quantile, not just mid-ranks.
  *
  * State: open-addressing primitive (index → count) table (the KMV
  * primitive-state lesson — no boxing on the hot path). When live
  * buckets exceed `maxBuckets` the LOWEST two collapse (paper §2.3),
  * which preserves the guarantee for all quantiles above the
  * collapsed mass; the spec pins count conservation through collapse.
  * Values below 1e-12 land in the zero bucket (paper's zeroCount).
  */
final class DdSketch(val alpha: Double, val maxBuckets: Int) {
  require(alpha > 0 && alpha < 1, "alpha in (0,1)")
  val gamma: Double = (1 + alpha) / (1 - alpha)
  private val invLogGamma = 1.0 / math.log(gamma)

  private var bits = {
    var b = 4
    while ((1 << b) < maxBuckets * 4) b += 1
    b
  }
  private var keys = new Array[Int](1 << bits)
  private var counts = new Array[Long](1 << bits)
  private var live = 0
  var zeroCount: Long = 0L

  @inline private def mask: Int = (1 << bits) - 1
  @inline private def slot(k: Int): Int = {
    var i = (k * 0x9E3779B9) & mask // Fibonacci hash of the index
    while (counts(i) != 0L && keys(i) != k) i = (i + 1) & mask
    i
  }

  def bucketIndex(x: Double): Int = math.ceil(math.log(x) * invLogGamma).toInt

  def addBucket(k: Int, c: Long): Unit = {
    if (c <= 0L) return
    val i = slot(k)
    if (counts(i) == 0L) { keys(i) = k; live += 1 }
    counts(i) += c
    if (live > maxBuckets) collapseLowest()
  }

  def insert(x: Double): Unit =
    if (x < 1e-12) zeroCount += 1 else addBucket(bucketIndex(x), 1L)

  /** Merge the lowest bucket into the second-lowest (paper §2.3). */
  private def collapseLowest(): Unit = {
    var lo = Int.MaxValue
    var lo2 = Int.MaxValue
    var i = 0
    while (i < counts.length) {
      if (counts(i) != 0L) {
        val k = keys(i)
        if (k < lo) { lo2 = lo; lo = k }
        else if (k < lo2) lo2 = k
      }
      i += 1
    }
    if (lo2 == Int.MaxValue) return // 0 or 1 live buckets: nothing to collapse
    val iLo = slot(lo)
    val c = counts(iLo)
    // open addressing cannot delete in place without breaking probe
    // chains — rebuild without the lowest key (collapse is rare)
    val oldKeys = keys; val oldCounts = counts
    keys = new Array[Int](1 << bits)
    counts = new Array[Long](1 << bits)
    live = 0
    var j = 0
    while (j < oldCounts.length) {
      if (oldCounts(j) != 0L && !(oldKeys(j) == lo && j == iLo))
        addBucket(oldKeys(j), oldCounts(j))
      j += 1
    }
    addBucket(lo2, c)
  }

  def mergeWith(o: DdSketch): Unit = {
    zeroCount += o.zeroCount
    var i = 0
    while (i < o.counts.length) {
      if (o.counts(i) != 0L) addBucket(o.keys(i), o.counts(i))
      i += 1
    }
  }

  def totalCount: Long = {
    var n = zeroCount
    var i = 0
    while (i < counts.length) { n += counts(i); i += 1 }
    n
  }

  /** The estimate for quantile q: the bucket containing the item at
    * 1-based rank `floor(q·(n−1)) + 1`, estimated at its midpoint.
    */
  def quantile(q: Double): Double = {
    val n = totalCount
    if (n == 0L) return Double.NaN
    val target = math.floor(q * (n - 1)).toLong + 1L
    if (target <= zeroCount) return 0.0
    val pairs = flatPairs.sortBy(_._1)
    var cum = zeroCount
    var i = 0
    while (i < pairs.length) {
      cum += pairs(i)._2
      if (cum >= target) return 2.0 * math.pow(gamma, pairs(i)._1) / (gamma + 1)
      i += 1
    }
    2.0 * math.pow(gamma, pairs.last._1) / (gamma + 1)
  }

  private def flatPairs: Array[(Int, Long)] = {
    val out = new Array[(Int, Long)](live)
    var i = 0; var j = 0
    while (i < counts.length) {
      if (counts(i) != 0L) { out(j) = (keys(i), counts(i)); j += 1 }
      i += 1
    }
    out
  }

  /** Interchange state: [zeroCount, k1, c1, k2, c2, …] with buckets
    * in ascending index order (canonical — bit-identical states for
    * equal sketches regardless of insert order).
    */
  def toFlat: Array[Long] = {
    val pairs = flatPairs.sortBy(_._1)
    val out = new Array[Long](1 + 2 * pairs.length)
    out(0) = zeroCount
    var i = 0
    while (i < pairs.length) {
      out(1 + 2 * i) = pairs(i)._1.toLong
      out(2 + 2 * i) = pairs(i)._2
      i += 1
    }
    out
  }

  def toBytes: Array[Byte] = {
    val flat = toFlat
    val bb = java.nio.ByteBuffer.allocate(8 * flat.length)
    flat.foreach(bb.putLong)
    bb.array()
  }
}

object DdSketch {
  def fromFlat(alpha: Double, maxBuckets: Int, flat: Array[Long]): DdSketch = {
    val s = new DdSketch(alpha, maxBuckets)
    s.zeroCount = flat(0)
    var i = 1
    while (i + 1 < flat.length) {
      s.addBucket(flat(i).toInt, flat(i + 1))
      i += 2
    }
    s
  }

  /** Static kernel for [[DdSketchQuantile]] (interpreted + codegen). */
  def quantileOfState(state: ArrayData, q: Double, alpha: Double,
      maxBuckets: Int): Double =
    fromFlat(alpha, maxBuckets, state.toLongArray()).quantile(q)

  def fromBytes(alpha: Double, maxBuckets: Int, bytes: Array[Byte]): DdSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val flat = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < flat.length) { flat(i) = bb.getLong(); i += 1 }
    fromFlat(alpha, maxBuckets, flat)
  }

  def dd_agg(value: Column, alpha: Double, maxBuckets: Int = 2048): Column =
    column(DdSketchAgg(expression(value), alpha, maxBuckets)
      .toAggregateExpression())

  def dd_merge_agg(state: Column, alpha: Double, maxBuckets: Int = 2048): Column =
    column(DdSketchMergeAgg(expression(state), alpha, maxBuckets)
      .toAggregateExpression())

  def dd_quantile(state: Column, q: Double, alpha: Double,
      maxBuckets: Int = 2048): Column =
    column(DdSketchQuantile(expression(state), q, alpha, maxBuckets))
}

case class DdSketchAgg(
    child: Expression,
    alpha: Double,
    maxBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): DdSketch = new DdSketch(alpha, maxBuckets)

  override def update(buf: DdSketch, input: InternalRow): DdSketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: DdSketch, b: DdSketch): DdSketch = { a.mergeWith(b); a }

  override def eval(buf: DdSketch): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: DdSketch): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): DdSketch =
    DdSketch.fromBytes(alpha, maxBuckets, bytes)

  override def withNewMutableAggBufferOffset(o: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DdSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): DdSketchAgg =
    copy(child = cs.head)
}

/** Re-aggregation of persisted DDSketch states — exact bucket
  * addition, so rollup estimates are bit-identical to direct ones
  * (the q157 gate asserts that equality; DdSketchSpec pins it under
  * arbitrary partitioning).
  */
case class DdSketchMergeAgg(
    child: Expression,
    alpha: Double,
    maxBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): DdSketch = new DdSketch(alpha, maxBuckets)

  override def update(buf: DdSketch, input: InternalRow): DdSketch = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      buf.zeroCount += a.getLong(0)
      var i = 1
      while (i + 1 < a.numElements()) {
        buf.addBucket(a.getLong(i).toInt, a.getLong(i + 1))
        i += 2
      }
    }
    buf
  }

  override def merge(a: DdSketch, b: DdSketch): DdSketch = { a.mergeWith(b); a }

  override def eval(buf: DdSketch): Any = new GenericArrayData(buf.toFlat)

  override def serialize(buf: DdSketch): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): DdSketch =
    DdSketch.fromBytes(alpha, maxBuckets, bytes)

  override def withNewMutableAggBufferOffset(o: Int): DdSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DdSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): DdSketchMergeAgg =
    copy(child = cs.head)
}

/** Quantile extraction from a DDSketch interchange state. */
case class DdSketchQuantile(child: Expression, q: Double, alpha: Double,
    maxBuckets: Int) extends UnaryExpression {
  require(q >= 0 && q <= 1, "q in [0,1]")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(state: Any): Any =
    DdSketch.quantileOfState(state.asInstanceOf[ArrayData], q, alpha, maxBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DdSketch.quantileOfState($c, $q, $alpha, $maxBuckets)")

  override protected def withNewChildInternal(c: Expression): DdSketchQuantile =
    copy(child = c)
}
