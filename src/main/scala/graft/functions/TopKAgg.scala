package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Bounded top-k accumulator for [[TopKAgg]]: at most `2·cap` staged
  * (score, id) entries, compacted to the best `cap` by
  * (score desc, id asc) whenever the stage fills. Memory is O(k) per
  * group per partition — independent of how many candidate rows a
  * group has.
  */
final class TopKState(val cap: Int) extends Serializable {
  var scores = new Array[Double](math.max(4, 2 * cap))
  var ids = new Array[Long](math.max(4, 2 * cap))
  var n = 0

  def add(s: Double, id: Long): Unit = {
    if (n == scores.length) compact()
    scores(n) = s; ids(n) = id; n += 1
  }

  /** Keep the best `cap` entries by (score desc, id asc).
    *
    * Score order matches Spark SQL's (`SQLOrderingUtil.compareDoubles`):
    * NaN ranks greatest (total order — a zero-norm embedding whose
    * cosine is 0/0=NaN can't make TimSort throw "Comparison method
    * violates its general contract" or scramble the top-k the way a
    * `>`/`==` comparator would), while -0.0 and 0.0 compare EQUAL and
    * fall through to the id tie-break — bare `java.lang.Double.compare`
    * would rank -0.0 below 0.0 and diverge from a `row_number()`
    * window oracle at a k boundary with mixed-sign zero scores.
    */
  def compact(): Unit = {
    val order = Array.range(0, n).sortWith { (a, b) =>
      val c =
        if (scores(a) == scores(b)) 0 // merges -0.0/0.0; false for NaN
        else java.lang.Double.compare(scores(a), scores(b))
      c > 0 || (c == 0 && ids(a) < ids(b))
    }
    val keep = math.min(cap, n)
    val ns = new Array[Double](scores.length)
    val ni = new Array[Long](ids.length)
    var i = 0
    while (i < keep) { ns(i) = scores(order(i)); ni(i) = ids(order(i)); i += 1 }
    scores = ns; ids = ni; n = keep
  }
}

/** Exact per-group top-k by score as a true distributed AGGREGATE —
  * the scalable replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(s.desc)) <= k`
  * idiom on candidate streams. The window shape shuffles EVERY
  * candidate row to its group's partition before ranking; this
  * aggregate keeps a bounded O(k) buffer per group, so map-side
  * partials forward at most k rows per group per partition and the
  * merge is k-bounded too — the same partial/merge machinery as
  * sum/HLL, with candidate-count-independent shuffle volume. Ties
  * break by id ascending, matching the deterministic
  * `orderBy(score.desc, id)` contract used across the ANN gates.
  *
  * Output: array<struct<score double, id bigint>> sorted by
  * (score desc, id asc) — `posexplode` recovers (rank-1, entry).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "top-k size must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false // empty groups emit an empty array
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKState, b: TopKState): TopKState = {
    var i = 0
    while (i < b.n) { a.add(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKState): Any = {
    buf.compact()
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    buf.compact()
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new TopKState(k)
    var i = 0
    while (i < n) { st.add(bb.getDouble(), bb.getLong()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(score = cs(0), id = cs(1))
}

object TopKAgg {
  /** `topk_by_score(s, id, k)` — array of the group's k best
    * (score, id) pairs, score desc / id asc.
    */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(score.cast("double")), expression(id.cast("long")), k)
      .toAggregateExpression())
}
