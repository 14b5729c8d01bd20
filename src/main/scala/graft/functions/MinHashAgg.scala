package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group-level MinHash as a true distributed AGGREGATE: the signature
  * of a GROUP's combined shingle set, built with mergeable partial
  * states (elementwise min) — a `TypedImperativeAggregate`, the same
  * machinery Spark's own HLL sketches use.
  *
  * Why an aggregate and not a per-row expression: per-doc signatures
  * ([[MinHashSig]]) cover row-level dedup; estimating similarity
  * BETWEEN whole partitions of a corpus (by source, by domain, by
  * day) needs the signature of each group's union of shingles.
  * Elementwise-min is associative+commutative, so Spark computes
  * partials map-side and merges — one narrow shuffle regardless of
  * group sizes, exactly like sum/count.
  *
  * Input: array<bigint> of element hashes per row (e.g.
  * `graft_shingle_hashes(text, 3)`); output: array<bigint> of k mins.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hs = v.asInstanceOf[ArrayData]
      var j = 0
      while (j < hs.numElements()) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val m = Mix64.family(i, h)
          if (m < buf(i)) buf(i) = m
          i += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg =
    copy(child = cs.head)
}

object MinHashAgg {
  def minhash_agg(elementHashes: Column, k: Int): Column =
    column(MinHashAgg(expression(elementHashes), k).toAggregateExpression())

  /** Estimated Jaccard between two group signatures = fraction of
    * matching slots.
    */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
}
