package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** `uniqUpTo(N)` — exact distinct count while it is <= N, and the
  * sentinel N+1 beyond: the state holds at most N+1 distinct values,
  * so memory is O(N) per group NO MATTER the group's true cardinality
  * — the point of the operator at 100 TB ("does this group exceed the
  * threshold" costs a bounded buffer, where a full count-distinct
  * state is unbounded). Merge = capped set union. Fully exact and
  * order-invariant by construction, so the oracle is plain
  * `LEAST(count(DISTINCT x), N+1)` — no audit envelope needed.
  * Buffer is a primitive [[LongHashSet]]: once the cap is hit the
  * per-row path is `size > n` → return, and below the cap it is a
  * probe over flat long arrays — no boxing either way.
  */
case class UniqUpToAgg(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongHashSet] {

  require(n >= 1 && n <= 1000000, "n in [1, 1e6]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): LongHashSet = new LongHashSet()

  override def update(buf: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    // once the cap is passed the answer is pinned at n+1; stop growing
    if (v != null && buf.size <= n) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: LongHashSet, b: LongHashSet): LongHashSet = {
    // the capped union: stop as soon as the answer is pinned at n+1
    var done = a.size > n
    b.foreach { v => if (!done) { a.add(v); done = a.size > n } }
    a
  }

  override def eval(buf: LongHashSet): Any =
    math.min(buf.size.toLong, (n + 1).toLong)

  override def serialize(buf: LongHashSet): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong(_))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongHashSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sz = bb.getInt()
    val s = new LongHashSet()
    var i = 0
    while (i < sz) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): UniqUpToAgg =
    copy(child = cs.head)
}

/** `groupBitmap`-family EXACT distinct state: a roaring-shaped
  * two-level bitmap — id split as (id >> 16) bucket key → 65536-bit
  * container (1024 longs, allocated only for touched buckets). OR is
  * the merge, so states are mergeable/idempotent partial aggregates
  * like the sketch family but EXACT: pre-aggregated rollups (the q127
  * shape) that re-aggregate to precise distinct counts. Memory is
  * proportional to touched buckets — dense id spaces cost ~1 bit/id,
  * which at 100 TB is the standard trade against unbounded hash-set
  * distinct states. The bucket directory is a primitive
  * [[LongObjHashMap]] — the per-row path is one probe plus a bit-set,
  * no boxed bucket key.
  *
  * State surfaces as `array<struct<key long, bits array<long>>>`
  * sorted by key — value-deterministic for a fixed input SET, so
  * two-level aggregation plans (state per fine group, OR-merge to
  * coarse) hash-compare stably.
  */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongObjHashMap[Array[Long]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = Bitmap.stateType

  override def createAggregationBuffer(): LongObjHashMap[Array[Long]] =
    new LongObjHashMap[Array[Long]]()

  override def update(buf: LongObjHashMap[Array[Long]],
      input: InternalRow): LongObjHashMap[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      val key = id >> 16
      val bit = (id & 0xFFFFL).toInt
      var c = buf.getOrNull(key)
      if (c == null) { c = new Array[Long](1024); buf.put(key, c) }
      c(bit >>> 6) |= 1L << (bit & 63)
    }
    buf
  }

  override def merge(a: LongObjHashMap[Array[Long]],
      b: LongObjHashMap[Array[Long]]): LongObjHashMap[Array[Long]] =
    Bitmap.or(a, b)

  override def eval(buf: LongObjHashMap[Array[Long]]): Any =
    Bitmap.toRows(buf)

  override def serialize(buf: LongObjHashMap[Array[Long]]): Array[Byte] =
    Bitmap.ser(buf)

  override def deserialize(bytes: Array[Byte]): LongObjHashMap[Array[Long]] =
    Bitmap.deser(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BitmapAgg =
    copy(child = cs.head)
}

/** OR-merge of persisted/partial [[BitmapAgg]] states (the
  * `groupBitmapMerge` side — coarse rollup of fine-group states).
  */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongObjHashMap[Array[Long]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = Bitmap.stateType

  override def createAggregationBuffer(): LongObjHashMap[Array[Long]] =
    new LongObjHashMap[Array[Long]]()

  override def update(buf: LongObjHashMap[Array[Long]],
      input: InternalRow): LongObjHashMap[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) Bitmap.orRows(buf, v.asInstanceOf[ArrayData]) else buf
  }

  override def merge(a: LongObjHashMap[Array[Long]],
      b: LongObjHashMap[Array[Long]]): LongObjHashMap[Array[Long]] =
    Bitmap.or(a, b)

  override def eval(buf: LongObjHashMap[Array[Long]]): Any =
    Bitmap.toRows(buf)

  override def serialize(buf: LongObjHashMap[Array[Long]]): Array[Byte] =
    Bitmap.ser(buf)

  override def deserialize(bytes: Array[Byte]): LongObjHashMap[Array[Long]] =
    Bitmap.deser(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BitmapMergeAgg =
    copy(child = cs.head)
}

/** Exact cardinality of a bitmap state: Σ popcount. */
case class BitmapCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(state: Any): Any =
    Bitmap.count(state.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bitmap.count($c)")

  override protected def withNewChildInternal(c: Expression): BitmapCount =
    copy(child = c)
}

/** Pairwise set algebra over two [[BitmapAgg]] states — the
  * `bitmapAndCardinality` / `bitmapAndnotCardinality` /
  * `bitmapXorCardinality` surface: exact audience intersection /
  * difference / symmetric difference computed from the STATES alone
  * (no re-scan of raw ids), via a merge-join over the key-sorted
  * container arrays with per-container popcounts. `op` ∈
  * {"and", "andnot", "xor"}.
  */
case class BitmapPairCount(left: Expression, right: Expression, op: String)
  extends BinaryExpression {

  require(Set("and", "andnot", "xor")(op), s"unknown bitmap op $op")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmap.pairCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], op)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""graft.functions.Bitmap.pairCount($a, $b, "$op")""")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BitmapPairCount = copy(left = l, right = r)
}

object Bitmap {

  val stateType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("bits", ArrayType(LongType, containsNull = false),
        nullable = false))),
    containsNull = false)

  private[functions] def or(a: LongObjHashMap[Array[Long]],
      b: LongObjHashMap[Array[Long]]): LongObjHashMap[Array[Long]] = {
    b.foreach { (key, bv) =>
      val cur = a.getOrNull(key)
      if (cur == null) a.put(key, bv.clone())
      else {
        var i = 0
        while (i < 1024) { cur(i) |= bv(i); i += 1 }
      }
    }
    a
  }

  private[functions] def orRows(buf: LongObjHashMap[Array[Long]],
      rows: ArrayData): LongObjHashMap[Array[Long]] = {
    val n = rows.numElements()
    var r = 0
    while (r < n) {
      val row = rows.getStruct(r, 2)
      val key = row.getLong(0)
      val bits = row.getArray(1)
      var cur = buf.getOrNull(key)
      if (cur == null) { cur = new Array[Long](1024); buf.put(key, cur) }
      var i = 0
      while (i < 1024) { cur(i) |= bits.getLong(i); i += 1 }
      r += 1
    }
    buf
  }

  private[functions] def toRows(buf: LongObjHashMap[Array[Long]]): GenericArrayData = {
    val keys = buf.sortedKeys()
    new GenericArrayData(keys.map { k =>
      InternalRow(k, new GenericArrayData(buf.getOrNull(k)))
    })
  }

  /** Shared popcount kernel (interpreted + generated code). */
  def count(state: ArrayData): Long = {
    var total = 0L
    val n = state.numElements()
    var r = 0
    while (r < n) {
      val bits = state.getStruct(r, 2).getArray(1)
      var i = 0
      while (i < 1024) { total += java.lang.Long.bitCount(bits.getLong(i)); i += 1 }
      r += 1
    }
    total
  }

  private[functions] def ser(buf: LongObjHashMap[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * (8 + 1024 * 8))
    bb.putInt(buf.size)
    buf.foreach { (key, a) =>
      bb.putLong(key)
      var i = 0
      while (i < 1024) { bb.putLong(a(i)); i += 1 }
    }
    bb.array()
  }

  private[functions] def deser(bytes: Array[Byte]): LongObjHashMap[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new LongObjHashMap[Array[Long]]()
    var r = 0
    while (r < n) {
      val key = bb.getLong()
      val a = new Array[Long](1024)
      var i = 0
      while (i < 1024) { a(i) = bb.getLong(); i += 1 }
      m.put(key, a)
      r += 1
    }
    m
  }

  /** Merge-join over two key-sorted states; both sides' containers
    * are fixed 1024-long arrays, so each aligned pair is a straight
    * popcount loop. Shared by interpreted and generated code.
    */
  def pairCount(a: ArrayData, b: ArrayData, op: String): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val takeLeftOnly = op != "and"   // andnot + xor keep left-only keys
    val takeRightOnly = op == "xor"  // xor keeps right-only keys
    var total = 0L
    var i = 0
    var j = 0
    def popRow(s: ArrayData, r: Int): Long = {
      val bits = s.getStruct(r, 2).getArray(1)
      var t = 0L
      var w = 0
      while (w < 1024) { t += java.lang.Long.bitCount(bits.getLong(w)); w += 1 }
      t
    }
    while (i < na && j < nb) {
      val ka = a.getStruct(i, 2).getLong(0)
      val kb = b.getStruct(j, 2).getLong(0)
      if (ka < kb) { if (takeLeftOnly) total += popRow(a, i); i += 1 }
      else if (kb < ka) { if (takeRightOnly) total += popRow(b, j); j += 1 }
      else {
        val ba = a.getStruct(i, 2).getArray(1)
        val bb = b.getStruct(j, 2).getArray(1)
        var w = 0
        while (w < 1024) {
          val x = op match {
            case "and"    => ba.getLong(w) & bb.getLong(w)
            case "andnot" => ba.getLong(w) & ~bb.getLong(w)
            case _        => ba.getLong(w) ^ bb.getLong(w)
          }
          total += java.lang.Long.bitCount(x)
          w += 1
        }
        i += 1; j += 1
      }
    }
    if (takeLeftOnly) while (i < na) { total += popRow(a, i); i += 1 }
    if (takeRightOnly) while (j < nb) { total += popRow(b, j); j += 1 }
    total
  }

  def uniq_up_to(value: Column, n: Int): Column =
    column(UniqUpToAgg(expression(value), n).toAggregateExpression())

  def bitmap_agg(value: Column): Column =
    column(BitmapAgg(expression(value)).toAggregateExpression())

  def bitmap_merge_agg(state: Column): Column =
    column(BitmapMergeAgg(expression(state)).toAggregateExpression())

  def bitmap_count(state: Column): Column =
    column(BitmapCount(expression(state)))

  def bitmap_and_count(a: Column, b: Column): Column =
    column(BitmapPairCount(expression(a), expression(b), "and"))

  def bitmap_andnot_count(a: Column, b: Column): Column =
    column(BitmapPairCount(expression(a), expression(b), "andnot"))

  def bitmap_xor_count(a: Column, b: Column): Column =
    column(BitmapPairCount(expression(a), expression(b), "xor"))
}
