package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog register vector over 64-bit hashes as a true
  * distributed aggregate — the distinct-count sketch beside
  * [[CountMinAgg]] (frequency) and [[BloomAgg]] (membership), the
  * analogue of the reference ecosystem's `uniq`-family aggregates.
  *
  * `m = 2^p` registers; each input's top `p` hash bits pick a
  * register, and the register keeps the MAX of `rho` = leading-zero
  * count of the remaining bits + 1 (capped at `64 − p + 1`). Partial
  * states merge by elementwise MAX — associative, commutative, and
  * idempotent, so the merged sketch over any partitioning (or any
  * re-delivery — max-merge absorbs replays) equals the sequential
  * one REGISTER-FOR-REGISTER, which is what the partition-invariance
  * spec pins. Fixed size: `m` longs regardless of cardinality.
  *
  * The sketch is exact-deterministic (integer registers from a
  * deterministic hash); only [[Hll.estimate]] involves floating
  * point, and that is a fixed single-threaded fold over the register
  * array — the same registers always give the same estimate, so
  * gates check the estimate against an exact count under the
  * standard `3·1.04/√m` relative-error envelope (the q48 audit
  * pattern), never as an oracle value.
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(p >= 4 && p <= 18, "p in [4, 18] (16..262144 registers)")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      // w == 0 would give nlz 64; the cap keeps rho in [1, 64-p+1]
      val rho = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - p + 1)
      if (rho > buf(idx)) buf(idx) = rho.toLong
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllAgg =
    copy(child = cs.head)
}

/** Cardinality estimate from an [[HllAgg]] register vector: the
  * standard bias-corrected harmonic mean with the small-range
  * linear-counting correction (64-bit hashes make the large-range
  * correction moot). Runs once per GROUP — the cold side of the
  * sketch — via the shared [[Hll.estimate]] JVM helper in both
  * interpreted and generated code, so the two paths are one
  * implementation.
  */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(regsAny: Any): Any =
    Hll.estimate(regsAny.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hll.estimate($c)")

  override protected def withNewChildInternal(c: Expression): HllEstimate =
    copy(child = c)
}

/** Merge of PERSISTED [[HllAgg]] register vectors — the
  * `uniqMerge`-side of the reference ecosystem's
  * uniqState/uniqMerge pair: partial states live in a table
  * (array&lt;long&gt; column, e.g. a daily rollup parquet) and are
  * re-aggregated WITHOUT rescanning the raw data. Element-wise max,
  * same invariances as [[HllAgg]] (associative, commutative,
  * idempotent), so rolling up rollups composes to any granularity.
  * The register width is taken from the first state seen; mixed-p
  * states in one group are a caller error and fail loudly.
  */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def maxInto(buf: Array[Long], regs: ArrayData): Array[Long] = {
    val n = regs.numElements()
    if (buf.isEmpty) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = regs.getLong(i); i += 1 }
      out
    } else {
      require(buf.length == n,
        s"merging HLL states of different p: ${buf.length} vs $n registers")
      var i = 0
      while (i < n) { val r = regs.getLong(i); if (r > buf(i)) buf(i) = r; i += 1 }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else maxInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.isEmpty) a else maxInto(a, new GenericArrayData(b))

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = cs.head)
}

object Hll {

  /** Shared estimate kernel: deterministic for given registers (one
    * fixed-order fold; no parallel float sums).
    */
  def estimate(regs: ArrayData): Long = {
    val m = regs.numElements()
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs.getLong(i)
      sum += java.lang.Math.scalb(1.0, -r.toInt) // 2^-r exactly
      if (r == 0L) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  def hll_agg(hash: Column, p: Int): Column =
    column(HllAgg(expression(hash), p).toAggregateExpression())

  def hll_merge_agg(state: Column): Column =
    column(HllMergeAgg(expression(state)).toAggregateExpression())

  def hll_estimate(sketch: Column): Column =
    column(HllEstimate(expression(sketch)))
}
