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

  require(k > 0, "signature size k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // empty groups yield NULL, not a sentinel
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // slot k is an element counter: an empty group (no shingles at all)
  // must evaluate to NULL — an all-MaxValue sentinel would estimate
  // jaccard 1.0 between two unrelated empty groups.
  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue) :+ 0L

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hs = v.asInstanceOf[ArrayData]
      // same family/min fold as Mix64.minInto, restricted to the first
      // k slots (slot k is the element counter)
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
      buf(k) += hs.numElements()
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a(k) += b(k)
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(k) == 0L) null else new GenericArrayData(buf.take(k))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate((k + 1) * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k + 1)(bb.getLong())
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
    * matching slots. Signatures must come from the same k.
    */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length && a.nonEmpty,
      s"signature lengths differ or empty: ${a.length} vs ${b.length}")
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
