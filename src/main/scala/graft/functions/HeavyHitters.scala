package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary over a string column — the
  * `topK`-family aggregate of the reference ecosystem, and the third
  * classic mergeable sketch beside CMS (per-item frequency) and HLL
  * (distinct count). `k` counters; an unseen item either takes a free
  * counter or decrements ALL counters (dropping zeros), so a counter
  * survives only if its item out-lives k-way competition.
  *
  * Guarantees (Misra–Gries '82; merge form Agarwal et al., PODS'12 —
  * "Mergeable Summaries", public):
  *  - every item with true count > n/(k+1) IS in the summary;
  *  - each kept counter undercounts by at most n/(k+1).
  * The MERGE (pairwise counter sum, then subtract the (k+1)-largest
  * count and drop non-positives) preserves both bounds over any
  * partitioning, which is what makes this a one-shuffle distributed
  * aggregate. The exact SET of surviving non-heavy counters depends
  * on partition order — so gates audit the ORDER-INVARIANT guarantee
  * (heavy items present, error in bound) against an exact count, the
  * q123 pattern, never the raw counter list.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1 && k <= 100000, "k in [1, 100000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // (item, cnt) pairs, cnt = lower-bound count after MG decrements
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count; at most k counters stay
      // positive. This is the Agarwal et al. merge — it adds at most
      // that subtrahend to every counter's undercount, keeping the
      // total undercount <= n/(k+1) by the same charging argument.
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      decrementAll(a, sub)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic presentation: cnt desc, item asc — but note the
    // SET itself is order-invariant only for guaranteed-heavy items
    val arr = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    new GenericArrayData(arr.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = cs.head)
}

/** Weighted Misra–Gries — the `topKWeighted` analogue: an update of
  * weight `w` is EXACTLY equivalent to `w` unit updates of
  * [[HeavyHittersAgg]], simulated in one step. With W = Σw the
  * guarantees become: every item with true weight > W/(k+1) is
  * present, and counters undercount by at most W/(k+1). The unit
  * equivalence (spec-pinned against literally-expanded input): if the
  * item is absent and all k counters are busy, the first
  * `m = min(counters)` units decrement everything (killing the
  * minima), and the remaining `w − m` accumulate in a freed slot —
  * so one pass does `subtract min(w, m) from all; insert at w − m if
  * positive`. Merge is the unweighted [[HeavyHittersAgg.merge]]
  * (counters are already weights there).
  */
case class WeightedHeavyHittersAgg(
    item: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1 && k <= 100000, "k in [1, 100000]")

  override def children: Seq[Expression] = Seq(item, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg(item, k).dataType

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val vi = item.eval(input)
    val vw = weight.eval(input)
    if (vi != null && vw != null) {
      val s = vi.asInstanceOf[UTF8String].toString
      val w = vw.asInstanceOf[Long]
      require(w >= 0, s"negative weight $w")
      if (w > 0L) {
        val cur = buf.get(s)
        if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + w)
        else if (buf.size < k) buf.put(s, w)
        else {
          var m = Long.MaxValue
          val it = buf.values().iterator()
          while (it.hasNext) { val c = it.next(); if (c < m) m = c }
          decrementAll(buf, math.min(w, m))
          if (w > m) buf.put(s, w - m)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] =
    HeavyHittersAgg(item, k).merge(a, b)

  override def eval(buf: java.util.HashMap[String, Long]): Any =
    HeavyHittersAgg(item, k).eval(buf)

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] =
    HeavyHittersAgg(item, k).serialize(buf)

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] =
    HeavyHittersAgg(item, k).deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): WeightedHeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedHeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): WeightedHeavyHittersAgg =
    copy(item = cs(0), weight = cs(1))
}

object HeavyHitters {
  def heavy_hitters_agg(item: Column, k: Int): Column =
    column(HeavyHittersAgg(expression(item), k).toAggregateExpression())

  def weighted_heavy_hitters_agg(item: Column, weight: Column, k: Int): Column =
    column(WeightedHeavyHittersAgg(expression(item), expression(weight), k)
      .toAggregateExpression())
}
