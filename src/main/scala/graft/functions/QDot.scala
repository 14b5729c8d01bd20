package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product of two `array<bigint>` quantized vectors as a
  * native codegen'd expression.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * lambdas interpreted, row by row — ~10× slower on a 64-dim dot
  * product and the hot inner loop of every similarity join. This
  * expression compiles to a tight `for` loop inside whole-stage
  * codegen (bench: q34 embedding-NN dropped from 26s to ~3s at sf0.1).
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

object QDot {
  def qdot(a: Column, b: Column): Column = column(QDot(expression(a), expression(b)))
}

/** Elementwise difference of two `array<bigint>` quantized vectors —
  * the residual step of residual-encoded IVF-PQ (`x − centroid`).
  * Same codegen rationale as [[QDot]]: `zip_with` would evaluate an
  * interpreted lambda per row on the encode scan.
  */
case class QSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = x.getLong(i) - y.getLong(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long[] $arr = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = $a.getLong($i) - $b.getLong($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QSub =
    copy(left = l, right = r)
}

object QSub {
  def qsub(a: Column, b: Column): Column = column(QSub(expression(a), expression(b)))
}

/** Dot product of two `array<double>` vectors as a native codegen'd
  * expression — the [[QDot]] rationale for the paths whose values are
  * inherently doubles (the SQ8 asymmetric scan's affine
  * reconstruction): `zip_with` + `aggregate` evaluate an interpreted
  * lambda PER PAIR ELEMENT in the hot join loop. Accumulation order
  * is ascending-index, identical to the HOF chain it replaces, so
  * results are bit-for-bit the same.
  */
case class DDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DDot =
    copy(left = l, right = r)
}

object DDot {
  def ddot(a: Column, b: Column): Column = column(DDot(expression(a), expression(b)))
}
