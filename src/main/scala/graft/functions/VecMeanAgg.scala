package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise mean of quantized vectors as a true distributed
  * aggregate — the k-means centroid-update step. Partial states are
  * (elementwise sum, count), merged associatively, so Spark computes
  * map-side partials and the shuffle carries one `dim+1`-long buffer
  * per (partition, group) — never the n×dim row explosion of the
  * posexplode formulation. Long sums are exact, and the rounded mean
  * is therefore deterministic at any partitioning (the property that
  * keeps trained centroids — and every ANN result derived from them —
  * bit-stable on a real cluster).
  *
  * Input: `array<bigint>` quantized vectors (see
  * [[VectorFunctions.quantize]]); output: `array<bigint>` rounded
  * elementwise mean, NULL for an empty group.
  */
case class VecMeanAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "vector dimension must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // slots 0..dim-1: elementwise sum; slot dim: vector count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
      buf(dim) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= dim) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(dim)
    if (n == 0L) null
    else {
      val out = new Array[Long](dim)
      var i = 0
      while (i < dim) { out(i) = math.round(buf(i).toDouble / n); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((dim + 1) * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): VecMeanAgg =
    copy(child = cs.head)
}

object VecMeanAgg {
  def vec_mean(qv: Column, dim: Int): Column =
    column(VecMeanAgg(expression(qv), dim).toAggregateExpression())
}
