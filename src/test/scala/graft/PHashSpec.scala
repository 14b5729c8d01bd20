package graft

import graft.functions.PHashOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DCT perceptual hash: determinism, the PROVABLE contrast
  * invariance, and — exhaustively over the full sf0.1 id range — the
  * planted-group separation the q162 gate depends on (every
  * same-group pair within hamming 3, every cross-group pair beyond
  * it), so the gate's exact pair counts cannot flake at any oracle SF.
  */
class PHashSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("pHash is deterministic and exactly contrast-invariant") {
    val img = PHashOps.synthImage(7, 123)
    assert(PHashOps.phash64(img) == PHashOps.phash64(img.clone()))
    // pixels are <= 127 by construction: doubling scales every DCT
    // coefficient and the median by 2, so the hash is IDENTICAL
    val doubled = img.map(b => ((b & 0xFF) * 2).toByte)
    assert(PHashOps.phash64(doubled) == PHashOps.phash64(img))
  }

  test("different gradients produce far-apart hashes; noise stays close") {
    val a = PHashOps.phash64(PHashOps.synthImage(1, 10))
    val a2 = PHashOps.phash64(PHashOps.synthImage(1, 11))
    val b = PHashOps.phash64(PHashOps.synthImage(2, 10))
    assert(hamming(a, a2) <= 3, s"same group drifted ${hamming(a, a2)}")
    assert(hamming(a, b) > 3, s"cross group too close ${hamming(a, b)}")
  }

  test("planted groups separate exhaustively over the sf0.1 id range") {
    // ids 0..4999 in groups of 5 — the exact population of the
    // largest correctness SF. Every same-group pair must sit within
    // the gate's hamming radius and every cross-group pair outside
    // it; checked over ALL pairs, so the gate's C(5,2)-per-group
    // count is a theorem here, not a probability.
    val n = 5000
    val hashes = Array.tabulate(n)(id => PHashOps.phash64(
      PHashOps.synthImage(id / 5, id.toLong)))
    var minCross = 64
    for (i <- 0 until n; j <- (i + 1) until n) {
      val h = hamming(hashes(i), hashes(j))
      if (i / 5 == j / 5) assert(h <= 3, s"intra pair ($i,$j) hamming $h")
      else if (h < minCross) minCross = h
    }
    assert(minCross > 3, s"closest cross-group pair at hamming $minCross")
  }
}
