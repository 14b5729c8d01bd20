package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The GIF LZW codec pair is pure JVM — no Spark needed to pin it. */
class GifSpec extends AnyFunSuite {

  private def expectedSum(w: Int, h: Int, seed: Long, cycle: Int): Long = {
    val n = w.toLong * h
    (0L until n).map(i => ((seed + i) % cycle + cycle) % cycle).sum
  }

  test("encode → decode round-trips dimensions and pixel sum across sizes") {
    for {
      (w, h) <- Seq((1, 1), (2, 2), (7, 3), (13, 13), (255, 1), (1, 256),
        (300, 200), (299, 199))
      seed <- Seq(0L, 1L, 7L, 1234567L)
    } {
      val gif = Multimodal.synthesizeGif(w, h, seed)
      val got = Multimodal.decodeGif(gif)
      assert(got.contains((w, h, expectedSum(w, h, seed, 4))),
        s"w=$w h=$h seed=$seed: got $got")
    }
  }

  test("constant and short-period pixels exercise the KwKwK code path") {
    // cycle=1: every pixel identical — the classic cScSc stream where
    // the decoder receives codes it has not finished defining
    for ((w, h, cycle) <- Seq((50, 40, 1), (129, 65, 1), (80, 60, 2), (33, 31, 3))) {
      val gif = Multimodal.synthesizeGif(w, h, seed = 5L, cycle = cycle)
      val got = Multimodal.decodeGif(gif)
      assert(got.contains((w, h, expectedSum(w, h, 5L, cycle))),
        s"w=$w h=$h cycle=$cycle: got $got")
    }
  }

  test("a 300x200 frame overflows the 12-bit dictionary and still decodes") {
    // 60k pixels of a 4-cycle pattern: the dictionary hits 4096
    // entries, the encoder emits a mid-stream clear, both sides reset
    val gif = Multimodal.synthesizeGif(300, 200, seed = 42L)
    assert(Multimodal.decodeGif(gif)
      .contains((300, 200, expectedSum(300, 200, 42L, 4))))
  }

  test("truncated or corrupted payloads are rejected, not mis-decoded") {
    val gif = Multimodal.synthesizeGif(40, 30, seed = 9L)
    assert(Multimodal.decodeGif(gif.take(10)).isEmpty, "truncated header")
    assert(Multimodal.decodeGif(gif.dropRight(20)).isEmpty, "truncated stream")
    val wrongMagic = gif.clone(); wrongMagic(0) = 'X'.toByte
    assert(Multimodal.decodeGif(wrongMagic).isEmpty, "bad magic")
    // flip the IMAGE DESCRIPTOR width (byte 30: 6 header + 7 LSD +
    // 12 GCT + 5 into the descriptor): the pixel count no longer
    // matches the LZW stream, which the decoder must notice (content
    // check, not header trust)
    val lied = gif.clone(); lied(30) = ((40 + 1) & 0xff).toByte
    assert(Multimodal.decodeGif(lied).isEmpty, "dimension/content mismatch")
  }

  test("other media decoders leave GIFs alone and vice versa") {
    val gif = Multimodal.synthesizeGif(20, 10, seed = 3L)
    assert(Multimodal.decodeJpeg(gif).isEmpty)
    assert(Multimodal.decodeBmp(gif).isEmpty)
    val jpeg = Multimodal.synthesizeJpeg(10, 10, 4, 4)
    assert(Multimodal.decodeGif(jpeg).isEmpty)
  }
}
