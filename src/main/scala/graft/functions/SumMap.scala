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
  * variant would carry the usual float-merge caveat. The buffer is a
  * [[LongLongHashMap]] — `addTo` runs per MAP ENTRY per row, so boxed
  * keys would allocate |map| objects per row on the hot path.
  */
case class SumMapAgg(
    keys: Expression,
    values: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongLongHashMap] {

  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): LongLongHashMap = new LongLongHashMap()

  override def update(buf: LongLongHashMap, input: InternalRow): LongLongHashMap = {
    val ks = keys.eval(input)
    val vs = values.eval(input)
    if (ks != null && vs != null) {
      val ka = ks.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val va = vs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(ka.numElements() == va.numElements(),
        s"sumMap: keys/values arity mismatch ${ka.numElements()} vs ${va.numElements()}")
      var i = 0
      while (i < ka.numElements()) {
        buf.addTo(ka.getLong(i), va.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: LongLongHashMap, b: LongLongHashMap): LongLongHashMap = {
    b.foreach((k, v) => a.addTo(k, v))
    a
  }

  override def eval(buf: LongLongHashMap): Any = {
    val ks = buf.sortedKeys()
    new GenericArrayData(ks.map(k => InternalRow(k, buf.get(k))))
  }

  override def serialize(buf: LongLongHashMap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongLongHashMap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new LongLongHashMap()
    var i = 0
    while (i < n) { m.addTo(bb.getLong(), bb.getLong()); i += 1 }
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
