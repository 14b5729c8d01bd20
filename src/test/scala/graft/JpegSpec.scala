package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Baseline-DCT JPEG codec pair (real Huffman entropy coding, real
  * IDCT) — pure JVM. The DC-only stream has the closed form the q118
  * oracle uses; the AC stream is checked against an independent
  * block-level simulation of the documented pixel contract.
  */
class JpegSpec extends AnyFunSuite {

  /** Closed form for DC-only payloads: flat blocks of dc+128 cropped
    * to (w, h).
    */
  private def dcOnlySum(w: Int, h: Int, seed: Long): Long = {
    val (bw, bh) = ((w + 7) / 8, (h + 7) / 8)
    (for (by <- 0 until bh; bx <- 0 until bw) yield {
      val dc = ((seed + bx + by) % 151 + 151) % 151 - 75
      val cw = math.min(8, w - bx * 8); val ch = math.min(8, h - by * 8)
      (dc + 128) * cw * ch
    }).sum
  }

  test("DC-only stream decodes to the flat-block closed form") {
    for {
      (w, h) <- Seq((1, 1), (8, 8), (13, 9), (48, 36), (61, 40))
      seed <- Seq(0L, 7L, 150L)
    } {
      val jpg = Multimodal.synthesizeJpegDct(w, h, seed)
      assert(Multimodal.decodeJpegPixels(jpg)
        .contains((w, h, dcOnlySum(w, h, seed))), s"w=$w h=$h seed=$seed")
    }
  }

  test("AC coefficients decode through the full Huffman+IDCT path") {
    for {
      (w, h) <- Seq((8, 8), (24, 17), (40, 33))
      seed <- Seq(3L, 11L)
    } {
      val jpg = Multimodal.synthesizeJpegDct(w, h, seed, acPattern = true)
      // independent simulation: dequantized coefficient block per
      // (bx, by) fed through the shared documented IDCT contract
      val (bw, bh) = ((w + 7) / 8, (h + 7) / 8)
      var sum = 0L
      for (by <- 0 until bh; bx <- 0 until bw) {
        val dc = (((seed + bx + by) % 151 + 151) % 151 - 75).toInt
        val coef = new Array[Int](64)
        coef(0) = dc * 8
        val k = 1 + ((bx + by) % 5)
        val v = ((((seed + 3 * bx + 7 * by) % 7) + 7) % 7 - 3).toInt
        if (v != 0) {
          // natural position of zigzag index k, mirroring the encoder
          val zz = Array(0, 1, 8, 16, 9, 2, 3, 10)
          coef(zz(k)) = v * 16
        }
        val block = Multimodal.jpegIdctBlock(coef)
        for (yy <- 0 until math.min(8, h - by * 8);
             xx <- 0 until math.min(8, w - bx * 8))
          sum += block(yy * 8 + xx)
      }
      assert(Multimodal.decodeJpegPixels(jpg).contains((w, h, sum)),
        s"w=$w h=$h seed=$seed")
    }
  }

  test("pixel decode rejects what it cannot represent, never mis-sums") {
    // the 3-component metadata-gate payload is not single-component
    val multi = Multimodal.synthesizeJpeg(20, 10, exifBytes = 4, entropyBytes = 16)
    assert(Multimodal.decodeJpegPixels(multi).isEmpty)
    // truncation inside the entropy stream must not produce a sum
    val jpg = Multimodal.synthesizeJpegDct(32, 24, seed = 5L)
    assert(Multimodal.decodeJpegPixels(jpg.dropRight(6)).isEmpty)
    // a corrupted byte either fails or changes nothing (CRC-free
    // format: a flipped entropy byte may still decode — but the
    // structural walk must never throw)
    val bad = jpg.clone(); bad(bad.length / 2) = 0x13
    Multimodal.decodeJpegPixels(bad)
    // metadata walk still agrees with the frame header
    assert(Multimodal.decodeJpeg(jpg).contains((32, 24, 1)))
  }
}
