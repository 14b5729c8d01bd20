package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch over 64-bit hashes as a true distributed
  * aggregate: `depth` rows of `width` counters; each input increments
  * one counter per row (independently-mixed hash per row — see the
  * Bloom h2 lesson in [[Bloom.fmix64]]'s doc), estimates take the MIN
  * across rows, so estimates only ever OVER-count (collisions add,
  * never subtract). Error: est ≤ true + (e/width)·N with probability
  * 1 − e^(−depth) per query; the sketch is `depth × width` longs
  * regardless of cardinality.
  *
  * Partial states merge by elementwise sum (associative/commutative) —
  * map-side partials, one fixed-size buffer per partition on the
  * shuffle, the same contract as [[BloomAgg]]/[[VecMeanAgg]]. Slot
  * `depth*width` carries N (total updates) so bounds are checkable
  * from the sketch alone.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        val hd = Bloom.fmix64(h ^ (d * 0x9E3779B97F4A7C15L))
        buf(d * width + java.lang.Math.floorMod(hd, width.toLong).toInt) += 1L
        d += 1
      }
      buf(depth * width) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinAgg =
    copy(child = cs.head)
}

object CountMinAgg {
  def countmin_agg(hash: Column, depth: Int, width: Int): Column =
    column(CountMinAgg(expression(hash), depth, width).toAggregateExpression())
}

/** Point estimate from a [[CountMinAgg]] sketch: min over the `depth`
  * row counters addressed by the SAME per-row mixed hashes. `width`
  * is derived from the sketch length (`(len-1)/depth`). Codegen'd —
  * this runs once per probed key in frequency-estimation scans.
  */
case class CountMinEstimate(left: Expression, right: Expression, depth: Int)
  extends BinaryExpression {

  require(depth > 0, "depth must be positive")
  override def dataType: DataType = LongType

  override def nullSafeEval(hashAny: Any, sketchAny: Any): Any = {
    val h = hashAny.asInstanceOf[Long]
    val sk = sketchAny.asInstanceOf[ArrayData]
    val width = (sk.numElements() - 1) / depth
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val hd = Bloom.fmix64(h ^ (d * 0x9E3779B97F4A7C15L))
      val c = sk.getLong(d * width + java.lang.Math.floorMod(hd, width.toLong).toInt)
      if (c < est) est = c
      d += 1
    }
    est
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hash, sk) => {
      val d = ctx.freshName("d")
      val hd = ctx.freshName("hd")
      val w = ctx.freshName("w")
      val c = ctx.freshName("c")
      s"""
         |int $w = ($sk.numElements() - 1) / $depth;
         |${ev.value} = Long.MAX_VALUE;
         |for (int $d = 0; $d < $depth; $d++) {
         |  long $hd = $hash ^ ($d * ${0x9E3779B97F4A7C15L}L);
         |  $hd ^= $hd >>> 33; $hd *= ${0xFF51AFD7ED558CCDL}L;
         |  $hd ^= $hd >>> 33; $hd *= ${0xC4CEB9FE1A85EC53L}L;
         |  $hd ^= $hd >>> 33;
         |  long $c = $sk.getLong($d * $w + (int) java.lang.Math.floorMod($hd, (long) $w));
         |  if ($c < ${ev.value}) ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}

object CountMinEstimate {
  def countmin_estimate(hash: Column, sketch: Column, depth: Int): Column =
    column(CountMinEstimate(expression(hash), expression(sketch), depth))
}
