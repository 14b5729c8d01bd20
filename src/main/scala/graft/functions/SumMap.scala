package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** `sumMap` — sum parallel (keys[], values[]) arrays by key into one
  * key-sorted map per group, as a single mergeable aggregate.
  *
  * The Spark-composable alternative (explode + groupBy key + re-
  * collect) shuffles one ROW PER MAP ENTRY and needs a second
  * aggregation to reassemble the map; this aggregate keeps the map
  * rolled up map-side, so the exchange carries one partial state per
  * (group × partition) — at 100 TB the difference between shuffling
  * n·|map| rows and n_groups states. Merge is per-key addition
  * (associative/commutative); the state surfaces as
  * `array<struct<k long, v long>>` sorted by key, value-deterministic
  * for a fixed input multiset. Integer values keep sums exact under
  * any merge order (the gate's parity requirement); a double-valued
  * variant would carry the usual float-merge caveat.
  */
case class SumMapAgg(
    keys: Expression,
    values: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val ks = keys.eval(input)
    val vs = values.eval(input)
    if (ks != null && vs != null) {
      val ka = ks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val va = vs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(ka.numElements() == va.numElements(),
        s"sumMap: keys/values arity mismatch ${ka.numElements()} vs ${va.numElements()}")
      var i = 0
      while (i < ka.numElements()) {
        val k = ka.getLong(i)
        buf.put(k, buf.getOrDefault(k, 0L) + va.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
      b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.put(e.getKey, a.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val ks = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { ks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(ks)
    new GenericArrayData(ks.map(k => InternalRow(k, buf.get(k).longValue())))
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong(), bb.getLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SumMapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumMapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SumMapAgg =
    copy(keys = cs(0), values = cs(1))
}

object SumMap {
  def sum_map_agg(keys: Column, values: Column): Column =
    column(SumMapAgg(expression(keys), expression(values)).toAggregateExpression())
}
