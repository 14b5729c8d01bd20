package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable K-minimum-values state: the k SMALLEST distinct "flipped"
  * hashes (hash XOR Long.MinValue, so signed order == unsigned raw
  * order) of everything inserted, held in a primitive open-addressing
  * table with a rejection threshold — the DataSketches "QuickSelect
  * theta sketch" update pattern (Dasgupta et al., "Theta-Sketch
  * Framework", public; Beyer et al. SIGMOD'07 for the KMV estimator):
  *
  *  - values >= `theta` are rejected with ONE comparison and no
  *    allocation — after the table first fills, almost every row takes
  *    this path (the expected number of ACCEPTED inserts over a stream
  *    of n distinct hashes is k·H(n/k) ≈ k·ln(n/k), so the steady
  *    state is a branch per row, not a tree insert per row);
  *  - accepted values go into a power-of-two linear-probe table of
  *    primitive longs (no boxing, load factor <= 1/2);
  *  - at `cap = 2k` occupancy the state purges: sort the retained
  *    values, set `theta` to the (k+1)-th smallest, and rebuild with
  *    exactly the k smallest — O(cap log cap), amortized away by the
  *    ~k accepted inserts between purges.
  *
  * `theta` is sound because a purge only ever sets it to a value with
  * k retained distinct values below it — so every discarded value is
  * provably outside the k smallest of the full stream, which keeps the
  * state EXACTLY "the k smallest distinct flipped hashes" regardless
  * of partitioning or merge order (pinned in KmvSpec). The previous
  * TreeSet-of-boxed-Longs state paid boxing + O(log k) navigation on
  * EVERY row — the single-group throughput wall the sf100 decade runs
  * measured (q129 at 69 s); this state is a branch per row.
  */
final class KmvBuffer(val k: Int) {
  private val cap = 2 * k
  private var tableBits = {
    var b = 6
    while ((1 << b) < 4 * k) b += 1
    b
  }
  private val mask = (1 << tableBits) - 1
  private var values = new Array[Long](1 << tableBits)
  private var occ = new Array[Long]((1 << tableBits) / 64 + 1)
  private[functions] var n = 0
  private var theta = 0L
  private var hasTheta = false

  @inline private def mix(z0: Long): Int = {
    var z = (z0 ^ (z0 >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    (z ^ (z >>> 33)).toInt
  }
  @inline private def occupied(i: Int): Boolean =
    (occ(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOcc(i: Int): Unit =
    occ(i >>> 6) |= 1L << (i & 63)

  /** Insert without the theta check or purge trigger (rebuild path —
    * caller guarantees distinctness and occupancy < cap).
    */
  private def insertRaw(v: Long): Unit = {
    var i = mix(v) & mask
    while (occupied(i)) {
      if (values(i) == v) return
      i = (i + 1) & mask
    }
    values(i) = v; setOcc(i); n += 1
  }

  def insert(flipped: Long): Unit = {
    if (hasTheta && flipped >= theta) return
    var i = mix(flipped) & mask
    while (occupied(i)) {
      if (values(i) == flipped) return
      i = (i + 1) & mask
    }
    values(i) = flipped; setOcc(i); n += 1
    if (n >= cap) purge()
  }

  /** Retained values, unsorted. */
  private def retained(): Array[Long] = {
    val out = new Array[Long](n)
    var w = 0
    var i = 0
    while (i < values.length) {
      if (occupied(i)) { out(w) = values(i); w += 1 }
      i += 1
    }
    out
  }

  private def purge(): Unit = {
    val s = retained()
    java.util.Arrays.sort(s)
    theta = s(k) // k distinct retained values are < theta
    hasTheta = true
    java.util.Arrays.fill(occ, 0L)
    n = 0
    var i = 0
    while (i < k) { insertRaw(s(i)); i += 1 }
  }

  /** Lower the rejection threshold to another state's (valid: its
    * purge proved k distinct stream values below it, so the union's k
    * smallest all are too). Entries already retained above the new
    * theta are trimmed by the next purge or at [[sortedMin]].
    */
  def adoptTheta(other: KmvBuffer): Unit =
    if (other.hasTheta && (!hasTheta || other.theta < theta)) {
      theta = other.theta; hasTheta = true
    }

  def foreachRetained(f: Long => Unit): Unit = {
    var i = 0
    while (i < values.length) {
      if (occupied(i)) f(values(i))
      i += 1
    }
  }

  /** The min(n, k) smallest retained values, ascending. */
  def sortedMin(): Array[Long] = {
    val s = retained()
    java.util.Arrays.sort(s)
    if (s.length <= k) s else java.util.Arrays.copyOf(s, k)
  }
}

/** K-minimum-values (theta-family) distinct sketch over 64-bit
  * hashes: the state is the k SMALLEST distinct hash values of the
  * set, which is a uniform size-k sample of its distinct elements —
  * so, unlike HLL registers, two states support SET OPERATIONS: the
  * k smallest of a state union is the union's KMV, and the fraction
  * of those landing in both sides' states estimates Jaccard
  * (Beyer et al., SIGMOD'07 "On synopses for distinct-value
  * estimation"; the DataSketches theta family — public algorithms).
  *
  * Stored values are hash XOR Long.MinValue ("flipped"), so SIGNED
  * ascending order equals unsigned order of the raw hashes — the
  * state array is directly usable by Spark's codegen'd array_sort /
  * array_union / array_intersect / slice, which is how the pair
  * composition stays in whole-stage codegen with no UDFs.
  *
  * Fully deterministic: the k smallest of a fixed hash set do not
  * depend on partitioning or merge order, pinned in KmvSpec. If a set
  * has <= k distinct hashes the state IS the set and downstream
  * estimates become exact. See [[KmvBuffer]] for the update-path
  * mechanics.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 16 && k <= (1 << 20), "k in [16, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    a.adoptTheta(b)
    b.foreachRetained(a.insert)
    a
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.sortedMin()) // ascending signed == ascending unsigned raw

  /** Wire form: the min(n, k) smallest values only. Values beyond the
    * state's own k smallest can never reach ANY downstream answer (an
    * element of the union's k smallest is a fortiori among its own
    * partial's k smallest), so the trim both shrinks shuffles and
    * makes the bytes deterministic for a fixed input set.
    */
  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val s = buf.sortedMin()
    val bb = java.nio.ByteBuffer.allocate(4 + s.length * 8)
    bb.putInt(s.length)
    var i = 0
    while (i < s.length) { bb.putLong(s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvAgg =
    copy(child = cs.head)
}

object Kmv {
  def kmv_agg(hash: Column, k: Int): Column =
    column(KmvAgg(expression(hash), k).toAggregateExpression())
}
