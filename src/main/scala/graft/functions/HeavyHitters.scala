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
  *
  * The counter map is keyed by [[UTF8String]] (binary equals/
  * hashCode), NOT by java.lang.String: the per-row hot path is then a
  * hash probe over the incoming value's existing bytes, and the
  * UTF-8 → UTF-16 decode + char[] allocation of `toString` happens
  * only when a NEW item claims a counter (at most k live + the MG
  * eviction churn, amortized O(1) per row) — never on the
  * increment-existing path that dominates any heavy-hitters workload.
  * Keys are `.clone()`d on insert because an evaluated UTF8String may
  * point into a reused scan/shuffle buffer.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k >= 1 && k <= 100000, "k in [1, 100000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // (item, cnt) pairs, cnt = lower-bound count after MG decrements
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val cur = buf.get(s) // stored counts are always >= 1, so null <=> absent
      if (cur ne null) buf.put(s, cur + 1L) // put keeps the OWNED key object
      else if (buf.size < k) buf.put(s.clone(), java.lang.Long.valueOf(1L))
      else HeavyHitters.decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(a: java.util.HashMap[UTF8String, java.lang.Long],
      b: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] =
    HeavyHitters.merge(a, b, k)

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any =
    HeavyHitters.evalRows(buf)

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] =
    HeavyHitters.ser(buf)

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] =
    HeavyHitters.deser(bytes)

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
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k >= 1 && k <= 100000, "k in [1, 100000]")

  override def children: Seq[Expression] = Seq(item, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg(item, k).dataType

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val vi = item.eval(input)
    val vw = weight.eval(input)
    if (vi != null && vw != null) {
      val s = vi.asInstanceOf[UTF8String]
      val w = vw.asInstanceOf[Long]
      require(w >= 0, s"negative weight $w")
      if (w > 0L) {
        val cur = buf.get(s)
        if (cur ne null) buf.put(s, cur + w)
        else if (buf.size < k) buf.put(s.clone(), java.lang.Long.valueOf(w))
        else {
          var m = Long.MaxValue
          val it = buf.values().iterator()
          while (it.hasNext) { val c = it.next().longValue(); if (c < m) m = c }
          HeavyHitters.decrementAll(buf, math.min(w, m))
          if (w > m) buf.put(s.clone(), java.lang.Long.valueOf(w - m))
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[UTF8String, java.lang.Long],
      b: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] =
    HeavyHitters.merge(a, b, k)

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any =
    HeavyHitters.evalRows(buf)

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] =
    HeavyHitters.ser(buf)

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] =
    HeavyHitters.deser(bytes)

  override def withNewMutableAggBufferOffset(o: Int): WeightedHeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedHeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): WeightedHeavyHittersAgg =
    copy(item = cs(0), weight = cs(1))
}

object HeavyHitters {

  private[functions] def decrementAll(
      buf: java.util.HashMap[UTF8String, java.lang.Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  private[functions] def merge(
      a: java.util.HashMap[UTF8String, java.lang.Long],
      b: java.util.HashMap[UTF8String, java.lang.Long],
      k: Int): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next() // b's keys are already owned clones — safe to adopt
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur eq null) e.getValue else cur + e.getValue)
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

  private[functions] def evalRows(
      buf: java.util.HashMap[UTF8String, java.lang.Long]): GenericArrayData = {
    // deterministic presentation: cnt desc, item asc (String order,
    // matching the oracle's collation) — but note the SET itself is
    // order-invariant only for guaranteed-heavy items
    val arr = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey.toString, e.getValue.longValue()); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    new GenericArrayData(arr.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  private[functions] def ser(
      buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes // raw UTF-8, no UTF-16 round-trip
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  private[functions] def deser(
      bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      m.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    m
  }

  def heavy_hitters_agg(item: Column, k: Int): Column =
    column(HeavyHittersAgg(expression(item), k).toAggregateExpression())

  def weighted_heavy_hitters_agg(item: Column, weight: Column, k: Int): Column =
    column(WeightedHeavyHittersAgg(expression(item), expression(weight), k)
      .toAggregateExpression())
}
