package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels (Sennrich et al. 2016, public
  * algorithm) as codegen'd Catalyst expressions — the per-row pieces
  * of the distributed trainer in [[graft.operators.Bpe]].
  *
  * Counting convention (load-bearing): the count of a pair is EXACTLY
  * the number of merges a greedy left-to-right application would
  * perform. For `l != r` that is the plain adjacent-zip count
  * (occurrences cannot overlap: the right symbol of one is never the
  * left of the next). For `l == r` a run of length L merges
  * floor(L/2) times, so that is what [[BpeOps.pairs]] emits — NOT the
  * zip count L-1. This makes two invariants exact, and the q155 gate
  * audits both: each merge shrinks the weighted symbol total by
  * exactly its count, and best-pair counts are monotone non-increasing
  * (an old pair's adjacencies only disappear under a merge; a pair
  * involving the new symbol occurs at most once per merge performed).
  */
object BpeOps {

  /** Adjacent symbol pairs with the greedy-apply multiplicity:
    * `(l, r, n)` structs, one per distinct adjacency position for
    * `l != r`, one per maximal same-symbol run with n = floor(L/2).
    */
  def pairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n - 1) {
      val l = syms.getUTF8String(i)
      val r = syms.getUTF8String(i + 1)
      if (l == r) {
        var j = i + 1
        while (j < n && syms.getUTF8String(j) == l) j += 1
        val runLen = j - i
        out += new GenericInternalRow(Array[Any](l, l, (runLen / 2).toLong))
        i = j - 1 // the run's last symbol still pairs with the next symbol
      } else {
        out += new GenericInternalRow(Array[Any](l, r, 1L))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One greedy left-to-right merge pass of (l, r) → l+r. */
  def mergeApply(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    val lr = UTF8String.concat(l, r)
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms.getUTF8String(i) == l && syms.getUTF8String(i + 1) == r) {
        out += lr; i += 2
      } else {
        out += syms.getUTF8String(i); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Splits a word into single-character symbols. */
  def chars(word: UTF8String): ArrayData = {
    val s = word.toString
    val out = new Array[Any](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      out(k) = UTF8String.fromString(s.substring(i, i + cc))
      i += cc; k += 1
    }
    new GenericArrayData(out)
  }

  /** Applies an ordered merge list (rank order) to a word — the
    * production tokenizer: identical by construction to the training
    * evolution, because training applies exactly these greedy passes
    * in exactly this order.
    */
  def encode(word: UTF8String, merges: Array[Array[UTF8String]]): ArrayData = {
    var syms = chars(word)
    var t = 0
    while (t < merges.length) {
      syms = mergeApply(syms, merges(t)(0), merges(t)(1))
      t += 1
    }
    syms
  }
}

/** `array<string>` symbols → `array<struct<l,r,n>>` greedy-count
  * adjacent pairs (see [[BpeOps.pairs]] for the convention).
  */
case class BpePairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false),
    StructField("n", org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = BpeOps.pairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.pairs($c)")

  override protected def withNewChildInternal(c: Expression): BpePairs = copy(child = c)
}

object BpePairs {
  def bpe_pairs(syms: Column): Column = column(BpePairs(expression(syms)))
}

/** One greedy merge pass with a fixed (l, r) — the per-round training
  * transform. The pair is embedded in the expression (driver-chosen
  * per round, the k-means-centroid pattern), so the pass is map-side.
  */
case class BpeMergeApply(child: Expression, l: String, r: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override def nullSafeEval(v: Any): Any =
    BpeOps.mergeApply(v.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", rU, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.mergeApply($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(c: Expression): BpeMergeApply = copy(child = c)
}

object BpeMergeApply {
  def bpe_merge(syms: Column, l: String, r: String): Column =
    column(BpeMergeApply(expression(syms), l, r))
}

/** `string` word → `array<string>` single-character symbols. */
case class BpeChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = BpeOps.chars(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.chars($c)")

  override protected def withNewChildInternal(c: Expression): BpeChars = copy(child = c)
}

object BpeChars {
  def bpe_chars(word: Column): Column = column(BpeChars(expression(word)))
}

/** The production tokenizer: `string` word → BPE symbols under a
  * learned merge list. The (tiny, k-bounded) merge table rides the
  * expression as a reference object — the closure-free broadcast
  * pattern of [[LshBuckets]] — so encoding a 100 TB corpus is a pure
  * map with zero shuffles.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[Array[UTF8String]] =
    merges.map(m => Array(UTF8String.fromString(m._1), UTF8String.fromString(m._2))).toArray

  override def nullSafeEval(v: Any): Any =
    BpeOps.encode(v.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.encode($c, $mRef)")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

object BpeEncode {
  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncode(expression(word), merges))
}
