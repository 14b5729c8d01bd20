package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleaving of two 32-bit keys — the
  * multi-dimension clustering key for write-side compaction: sorting
  * by the interleaved code keeps rows close in BOTH dimensions inside
  * the same files, so parquet footer min/max stats prune scans
  * filtered on either column (range-clustering by a single key prunes
  * only that key). Classic public technique (Morton 1966; the standard
  * bit-spreading construction below appears in Hacker's Delight §7-2).
  *
  * Inputs are treated as UNSIGNED 32-bit values (callers map signed
  * domains by flipping the sign bit first if they need order
  * preserved across negatives). The code is monotone under
  * coordinate-wise dominance: x1 <= x2 && y1 <= y2 ⇒ z1 <= z2.
  */
object ZOrderOps {

  /** Spread the low 32 bits of v so bit i lands at position 2·i. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleaved code: x in even bit positions, y in odd. */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)
}

case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType

  // without declared input types a bigint child (the common id case,
  // easy to hit via the graft_zorder SQL registration) fails at
  // RUNTIME — ClassCastException interpreted, janino error codegen'd;
  // ExpectsInputTypes makes Catalyst reject the plan at analysis.
  // (Seq[DataType] covariantly overrides Seq[AbstractDataType], whose
  // element type is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderOps.interleave($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

object ZOrder2 {
  /** Column API: z-order code of two int columns. */
  def zorder(x: Column, y: Column): Column = column(ZOrder2(expression(x), expression(y)))
}
