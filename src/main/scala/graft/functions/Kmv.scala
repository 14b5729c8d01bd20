package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
  * depend on partitioning or merge order (dedup via sorted set,
  * min-trim), pinned in KmvSpec. If a set has <= k distinct hashes
  * the state IS the set and downstream estimates become exact.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16 && k <= (1 << 20), "k in [16, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def addTrim(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    buf.add(flipped)
    if (buf.size > k) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) addTrim(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) addTrim(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // ascending signed == ascending unsigned raw
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
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
