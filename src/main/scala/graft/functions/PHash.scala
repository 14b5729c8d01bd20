package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual image hash (the classic DCT pHash — public algorithm,
  * e.g. the pHash.org / ImageHash construction): 32×32 grayscale →
  * orthonormal 2-D DCT-II → the 8×8 low-frequency block → one bit per
  * coefficient, set iff above the block median. Near-duplicate images
  * (small pixel noise, recompression) move high-frequency energy, not
  * the low block, so their hashes sit within a few bits of hamming
  * distance — which plugs DIRECTLY into the SimHash pigeonhole
  * blocking ([[graft.operators.Dedup.simhashPairs]]): image near-dup
  * dedup becomes the same bucket join as text near-dup dedup, no
  * cartesian anywhere.
  *
  * Determinism: fixed cosine tables, sequential double arithmetic per
  * row, exact median by sorting 64 doubles — the same bytes hash to
  * the same 64 bits at any parallelism (spec-pinned, along with the
  * provable contrast invariance: scaling all pixels ×c scales every
  * coefficient and the median by c, leaving every comparison — and
  * the hash — unchanged).
  */
object PHashOps {
  private val N = 32

  /** cos(π·(2x+1)·u / 64) · alpha(u), orthonormal DCT-II basis. */
  private lazy val cosTab: Array[Array[Double]] = Array.tabulate(N, N) { (u, x) =>
    val alpha = if (u == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)
    alpha * math.cos(math.Pi * (2 * x + 1) * u / (2.0 * N))
  }

  def phash64(img: Array[Byte]): Long = {
    require(img.length == N * N, s"pHash expects a $N x $N grayscale image")
    // rows then columns (separable DCT)
    val tmp = new Array[Double](N * N)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) { // only the low 8 frequencies are ever read
        var acc = 0.0
        var x = 0
        while (x < N) { acc += (img(y * N + x) & 0xFF) * cosTab(u)(x); x += 1 }
        tmp(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val low = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += tmp(yy * 8 + u) * cosTab(v)(yy); yy += 1 }
        low(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val sorted = low.clone()
    java.util.Arrays.sort(sorted)
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (low(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Deterministic synthetic grayscale images with PLANTED near-dup
    * groups. The base is an EXACT combination of the low-frequency
    * DCT basis functions: a ±A amplitude on each of the 63 low AC
    * frequencies with a group-derived half/half sign pattern, so
    * every low coefficient lands at ±A — decisively far from the
    * ~0 median — and the ±1 per-document noise (coefficient
    * perturbation ≲ 4) can never flip a bit. Cross-group hamming is
    * the sign-pattern disagreement (~31 bits expected; the spec
    * verifies the minimum exhaustively). Pixels stay ≤ 127 so the
    * contrast-invariance spec can double them without clamping.
    */
  def synthImage(group: Long, docSeed: Long): Array[Byte] =
    applyNoise(baseImage(group), docSeed)

  private def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }

  /** The group's noise-free base image, ROUNDED per pixel (the per-doc
    * noise is added after rounding, so this is exactly the shared part
    * of every group member). Split out so callers mapping consecutive
    * ids can memoize it per group — the 63-frequency synthesis loop is
    * ~64× the per-doc noise cost.
    */
  def baseImage(group: Long): Array[Int] = {
    // exactly 31 of the 63 low AC frequencies positive (DC is always
    // the huge positive base-level coefficient)
    val ranked = (1 until 64)
      .sortBy(i => mix(group * 6364136223846793005L + i))
    val sign = new Array[Int](64)
    ranked.zipWithIndex.foreach { case (i, r) => sign(i) = if (r < 31) 1 else -1 }
    val amp = 20.0
    val out = new Array[Int](32 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        var acc = 64.0
        var i = 1
        while (i < 64) {
          acc += amp * sign(i) * cosTab(i % 8)(x) * cosTab(i / 8)(y)
          i += 1
        }
        out(y * 32 + x) = math.round(acc).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-document ±1 noise + clamp over a [[baseImage]]. */
  def applyNoise(base: Array[Int], docSeed: Long): Array[Byte] = {
    val out = new Array[Byte](32 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val noise = ((mix(docSeed * 31 + y * 32 + x) % 3) - 1).toInt // ±1
        val v = math.max(1, math.min(127, base(y * 32 + x) + noise))
        out(y * 32 + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}

case class PHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    PHashOps.phash64(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHashOps.phash64($c)")

  override protected def withNewChildInternal(c: Expression): PHash64 = copy(child = c)
}

object PHash64 {
  def phash64(img: Column): Column = column(PHash64(expression(img)))
}
