package graft

import graft.operators.H264
import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex-B metadata layer (q141): SPS geometry inversion,
  * emulation prevention, start-code scanning, failure modes.
  * Pure-JVM kernels — no SparkSession needed.
  */
class H264Spec extends AnyFunSuite {

  test("SPS geometry inverts across mb-aligned and cropped sizes") {
    for {
      w <- Seq(16, 20, 32, 34, 128, 1920)
      h <- Seq(16, 18, 64, 90, 1080)
    } {
      val m = H264.parseStream(H264.synthesizeH264Stream(w, h, 31, 1, 5L)).get
      assert(m.width == w && m.height == h, s"got ${m.width}x${m.height} want ${w}x$h")
      assert(m.profileIdc == 66 && m.levelIdc == 31)
    }
  }

  test("NAL census: SPS + PPS + one IDR + non-IDR slices") {
    val m = H264.parseStream(H264.synthesizeH264Stream(64, 48, 30, 4, 9L)).get
    assert(m.nNals == 6)
    assert(m.nIdr == 1)
    assert(m.nSlices == 4)
  }

  test("slice checksum matches the closed form (emulation prevention round-trips)") {
    for (seed <- 0L until 40L) {
      val nf = 1 + (seed % 5).toInt
      val m = H264.parseStream(H264.synthesizeH264Stream(32, 32, 30, nf, seed)).get
      var want = 0L
      for (f <- 0 until nf) {
        val sz = 1 + ((seed + f) % 19).toInt
        var acc = 0L
        for (j <- 0 until sz)
          acc += (if ((seed + f + j) % 5 < 3) 0L else (seed * 7 + f * 3 + j) % 256)
        want += (f + 1) * acc
      }
      assert(m.sliceChecksum == want, s"seed=$seed")
    }
  }

  test("escaping is actually present in the wire bytes (00 00 03 sequences)") {
    // zero runs in the payload force emulation-prevention bytes; a
    // stream synthesized over enough seeds must contain 00 00 03
    val hasEp = (0L until 20L).exists { seed =>
      val p = H264.synthesizeH264Stream(32, 32, 30, 5, seed)
      p.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3)
    }
    assert(hasEp, "no emulation-prevention byte ever emitted — zero runs missing")
  }

  test("no false start codes inside NAL payloads") {
    // if escaping failed, a payload 00 00 01 would split a slice and
    // change the census; sweep seeds and re-derive the census
    for (seed <- 0L until 30L) {
      val nf = 1 + (seed % 5).toInt
      val m = H264.parseStream(H264.synthesizeH264Stream(48, 32, 30, nf, seed)).get
      assert(m.nNals == 2 + nf, s"seed=$seed census ${m.nNals} != ${2 + nf}")
    }
  }

  test("I_PCM pixel decode inverts the closed-form planes") {
    for (seed <- 0L until 12L) {
      val mbW = 1 + (seed % 3).toInt
      val mbH = 1 + ((seed * 3) % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeIPcm(H264.synthesizeH264IPcm(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      assert(m.width == mbW * 16 && m.height == mbH * 16)
      var wantL = 0L; var wantC = 0L; var wantW = 0L
      for (f <- 0 until nf) {
        var fl = 0L; var fc = 0L
        for (py <- 0 until mbH * 16; px <- 0 until mbW * 16)
          fl += (seed + f + px + 2 * py) % 251
        for (cy <- 0 until mbH * 8; cx <- 0 until mbW * 8)
          fc += (seed + f + 2 * cx + cy) % 251 + (3 * seed + f + cx + 2 * cy) % 251
        wantL += fl; wantC += fc; wantW += (f + 1) * (fl + fc)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma")
      assert(m.chromaSum == wantC, s"seed=$seed chroma")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
    }
  }

  test("I_PCM decode rejects streams whose slices are not raw macroblocks") {
    // a q141-style stream has IDR slices with arbitrary payloads —
    // the strict slice-header + mb_type walk must refuse, not misread
    val p = H264.synthesizeH264Stream(32, 32, 30, 2, 7L)
    assert(H264.decodeIPcm(p).isEmpty)
  }

  test("truncated and garbage streams parse to None") {
    val p = H264.synthesizeH264Stream(64, 48, 30, 2, 3L)
    assert(H264.parseStream(p.take(6)).isEmpty)        // cut inside SPS
    assert(H264.parseStream(Array[Byte](1, 2, 3)).isEmpty) // no start code
    assert(H264.parseStream(Array.empty[Byte]).isEmpty)
  }
}
