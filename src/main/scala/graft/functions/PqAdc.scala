package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Asymmetric-distance (ADC) score of a product-quantized vector: the
  * table lookup-and-sum at the heart of PQ search. `left` is the code
  * array (`array<int>`, one codebook index per subspace), `right` the
  * query's FLATTENED lookup table (`array<bigint>`, `m × k` entries,
  * entry `sub * k + code` = the query subvector's integer dot product
  * with codebook entry `code` of subspace `sub`). The score is
  * `Σ_sub table[sub * k + codes[sub]]` — m lookups and adds replace a
  * full d-dim dot product per candidate, which is the whole point of
  * PQ at 100 TB candidate volume.
  *
  * Codegen'd for the same reason as [[QDot]]: this runs once per
  * (query, candidate) pair in the hot scan. Integer (quantized)
  * table entries keep scores bit-deterministic at any parallelism.
  * A code out of range or a short table yields the lookups that do
  * exist (defensive clamp: missing entries contribute 0) — callers
  * pair codes and tables from the same codebook so this never fires
  * in practice.
  */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k > 0, "codebook size must be positive")
  override def dataType: DataType = LongType

  override def nullSafeEval(codesAny: Any, tabAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tab = tabAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val tn = tab.numElements()
    var acc = 0L
    var s = 0
    while (s < m) {
      val idx = s * k + codes.getInt(s)
      if (idx >= 0 && idx < tn) acc += tab.getLong(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val tn = ctx.freshName("tn")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $codes.numElements();
         |int $tn = $tab.numElements();
         |long ${ev.value}Acc = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $idx = $s * $k + $codes.getInt($s);
         |  if ($idx >= 0 && $idx < $tn) ${ev.value}Acc += $tab.getLong($idx);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

object PqAdcScore {
  def pq_adc(codes: Column, table: Column, k: Int): Column =
    column(PqAdcScore(expression(codes), expression(table), k))
}
