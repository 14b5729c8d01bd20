package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multi-frame GIF + APNG codec pairs (q104) — pure JVM. */
class AnimationSpec extends AnyFunSuite {

  private def gifFrameSum(w: Int, h: Int, seed: Long, f: Int): Long = {
    val n = w.toLong * h
    (0L until n).map(i => ((seed + f + i) % 4 + 4) % 4).sum
  }

  private def apngFrameSum(w: Int, h: Int, seed: Long, f: Int): Long =
    (for { x <- 0 until w; y <- 0 until h }
      yield ((seed + f + x + y) % 251 + 251) % 251).sum

  test("animated GIF round-trips frame count, total and weighted sums") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (40, 30), (300, 200))
      frames <- Seq(1, 2, 4)
    } {
      val gif = Multimodal.synthesizeGifAnim(w, h, seed = 11L, frames)
      val sums = (0 until frames).map(f => gifFrameSum(w, h, 11L, f))
      val want = (w, h, frames, sums.sum,
        sums.zipWithIndex.map { case (s, f) => (f + 1) * s }.sum)
      assert(Multimodal.decodeGifFrames(gif).contains(want),
        s"w=$w h=$h frames=$frames")
    }
  }

  test("single-frame GIF: decodeGifFrames agrees with decodeGif") {
    val gif = Multimodal.synthesizeGif(33, 21, seed = 7L)
    val single = Multimodal.decodeGif(gif)
    val multi = Multimodal.decodeGifFrames(gif)
    assert(single.isDefined && multi.isDefined)
    assert(multi.get == (33, 21, 1, single.get._3, single.get._3))
  }

  test("animated GIF: truncation and mid-stream corruption are rejected") {
    val gif = Multimodal.synthesizeGifAnim(20, 15, seed = 3L, frames = 3)
    assert(Multimodal.decodeGifFrames(gif.dropRight(5)).isEmpty, "no trailer")
    // damage the SECOND frame's LZW stream: find its image separator
    // (the byte pattern is synthetic, so corrupt a byte near 2/3 in)
    val bad = gif.clone(); bad(gif.length * 2 / 3) = 0x7f
    // either an invalid code or a pixel-count mismatch — never a wrong sum
    val got = Multimodal.decodeGifFrames(bad)
    val want = Multimodal.decodeGifFrames(gif)
    assert(got.isEmpty || got == want, s"corruption mis-decoded: $got")
  }

  test("APNG round-trips frame count, total and weighted sums") {
    for {
      (w, h) <- Seq((1, 1), (8, 5), (32, 24), (48, 32))
      frames <- Seq(1, 2, 4)
    } {
      val apng = Multimodal.synthesizeApng(w, h, seed = 13L, frames)
      val sums = (0 until frames).map(f => apngFrameSum(w, h, 13L, f))
      val want = (w, h, frames, sums.sum,
        sums.zipWithIndex.map { case (s, f) => (f + 1) * s }.sum)
      assert(Multimodal.decodeApng(apng).contains(want),
        s"w=$w h=$h frames=$frames")
    }
  }

  test("a plain PNG is not an animation; an APNG still satisfies decodePng") {
    val png = Multimodal.synthesizePng(16, 12, seed = 5L)
    assert(Multimodal.decodeApng(png).isEmpty, "no acTL → not an animation")
    // decodePng on an APNG sees frame 0 (IDAT) and CRC-valid ancillary
    // chunks — the single-image view of the same payload
    val apng = Multimodal.synthesizeApng(16, 12, seed = 5L, frames = 3)
    assert(Multimodal.decodePng(apng)
      .contains((16, 12, apngFrameSum(16, 12, 5L, 0))))
  }

  test("APNG sub-rectangle frames composite correctly (canvas simulation)") {
    for {
      (w, h) <- Seq((1, 1), (9, 7), (32, 24))
      frames <- Seq(1, 2, 4)
    } {
      val apng = Multimodal.synthesizeApngRegions(w, h, seed = 21L, frames,
        subRects = true)
      // independent canvas simulation of dispose=none/blend=source
      val canvas = Array.fill(w * h)(0)
      var sum = 0L; var weighted = 0L
      for (f <- 0 until frames) {
        val (x0, y0, fw, fh) =
          if (f == 0) (0, 0, w, h) else Multimodal.apngRect(w, h, f)
        for (py <- 0 until fh; px <- 0 until fw)
          canvas((y0 + py) * w + (x0 + px)) =
            (((21L + f + (x0 + px) + (y0 + py)) % 251 + 251) % 251).toInt
        val cs = canvas.map(_.toLong).sum
        sum += cs; weighted += (f + 1) * cs
      }
      assert(Multimodal.decodeApng(apng).contains((w, h, frames, sum, weighted)),
        s"w=$w h=$h frames=$frames")
    }
  }

  test("APNG dispose=background/previous and blend=over composite correctly") {
    for {
      (w, h) <- Seq((1, 1), (9, 7), (32, 24))
      frames <- Seq(1, 2, 4)
      mode <- 0 to 2
    } {
      val apng = Multimodal.synthesizeApngModes(w, h, seed = 17L, frames, mode)
      // independent (value, alpha) canvas simulation of the contract
      val cv = Array.fill(w * h)(0); val ca = Array.fill(w * h)(0)
      var sum = 0L; var weighted = 0L; var snap = 0
      val frameIdx = if (mode == 1) 1 to frames else 0 until frames
      for (f <- frameIdx) {
        val (x0, y0, fw, fh) =
          if (mode != 1 && f == 0) (0, 0, w, h) else Multimodal.apngRect(w, h, f)
        val saved = (cv.clone(), ca.clone())
        for (py <- 0 until fh; px <- 0 until fw) {
          val (gx, gy) = (x0 + px, y0 + py)
          val ci = gy * w + gx
          val v = (((17L + f + gx + gy) % 251 + 251) % 251).toInt
          val a = if (mode != 2 || f == 0) 255
            else if ((gx + gy + f) % 2 == 0) 255 else 0
          val over = mode == 2 && f != 0
          if (!over || a == 255) { cv(ci) = v; ca(ci) = a }
          // binary alpha: a == 0 under OVER keeps the destination
        }
        val cs = (0 until w * h).map(i => cv(i).toLong * ca(i) / 255).sum
        snap += 1; sum += cs; weighted += snap.toLong * cs
        if (mode == 0 && f > 0) // dispose=background clears the region
          for (py <- 0 until fh; px <- 0 until fw) {
            val ci = (y0 + py) * w + (x0 + px); cv(ci) = 0; ca(ci) = 0
          }
        else if (mode == 1) // dispose=previous restores the region
          for (py <- 0 until fh; px <- 0 until fw) {
            val ci = (y0 + py) * w + (x0 + px)
            cv(ci) = saved._1(ci); ca(ci) = saved._2(ci)
          }
      }
      assert(Multimodal.decodeApng(apng).contains((w, h, frames, sum, weighted)),
        s"w=$w h=$h frames=$frames mode=$mode")
    }
  }

  test("blend=over fractional alpha follows the documented integer contract") {
    // straight-alpha over, floor divisions: hand-computed cases
    // src (200, 128) over dst (100, 255): denA = 128*255 + 255*127 = 65025
    //   outV = (200*128*255 + 100*255*127) / 65025 = 9766500/65025 = 150
    assert(Multimodal.blendOver(200, 128, 100, 255) == (150, 255))
    // over a transparent destination OVER degenerates to the source
    assert(Multimodal.blendOver(77, 128, 99, 0) == (77, 128))
    // both translucent: denA = 100*255 + 50*155 = 33250, outA = 130
    //   outV = (10*100*255 + 200*50*155) / 33250 = (255000+1550000)/33250 = 54
    assert(Multimodal.blendOver(10, 100, 200, 50) == (54, 130))
    // fully transparent src over fully transparent dst
    assert(Multimodal.blendOver(40, 0, 0, 0) == (0, 0))
  }

  test("GIF sub-rect frames composite with GCE disposal (canvas simulation)") {
    for {
      (w, h) <- Seq((1, 1), (9, 7), (32, 24))
      frames <- Seq(1, 2, 4)
      disposal <- 1 to 3
    } {
      val gif = Multimodal.synthesizeGifRegions(w, h, seed = 23L, frames, disposal)
      val canvas = Array.fill(w * h)(0)
      var want = Seq.empty[Seq[Int]]
      for (f <- 0 until frames) {
        val (x0, y0, fw, fh) =
          if (f == 0) (0, 0, w, h) else Multimodal.apngRect(w, h, f)
        val saved = canvas.clone()
        for (py <- 0 until fh; px <- 0 until fw)
          canvas((y0 + py) * w + (x0 + px)) =
            (((23L + f + (x0 + px) + (y0 + py)) % 4 + 4) % 4).toInt
        want :+= canvas.toSeq
        val d = if (f == 0) 1 else disposal
        if (d == 2)
          for (py <- 0 until fh; px <- 0 until fw)
            canvas((y0 + py) * w + (x0 + px)) = 0
        else if (d == 3)
          for (py <- 0 until fh; px <- 0 until fw)
            canvas((y0 + py) * w + (x0 + px)) = saved((y0 + py) * w + (x0 + px))
      }
      val got = Multimodal.gifCanvases(gif)
      assert(got.isDefined, s"w=$w h=$h frames=$frames d=$disposal")
      val (gw, gh, snaps) = got.get
      assert((gw, gh, snaps.length) == (w, h, frames))
      assert(snaps.map(_.toSeq) == want,
        s"canvas mismatch w=$w h=$h frames=$frames d=$disposal")
    }
  }

  test("APNG: an out-of-bounds fcTL rect is rejected") {
    val apng = Multimodal.synthesizeApngRegions(10, 8, seed = 3L, frames = 2,
      subRects = true)
    // fcTL layout: len(4) type(4) seq(4) w(4) h(4) x(4) y(4) ...
    // find the second fcTL and push its x offset past the canvas
    def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var o = 8; var fctlSeen = 0; var secondFctl = -1
    while (o + 8 < apng.length && secondFctl < 0) {
      val len = be32(apng, o).toInt
      val t = new String(apng, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (t == "fcTL") { fctlSeen += 1; if (fctlSeen == 2) secondFctl = o }
      if (secondFctl < 0) o += 12 + len
    }
    assert(secondFctl > 0, "payload must contain a second fcTL")
    val bad = apng.clone()
    bad(secondFctl + 8 + 12 + 3) = 9 // x_offset low byte: 9 + width 5 > 10
    // CRC now mismatches too — either way the decoder must refuse
    assert(Multimodal.decodeApng(bad).isEmpty)
  }

  test("APNG integrity: lying acTL count and corrupted chunks are rejected") {
    val apng = Multimodal.synthesizeApng(10, 8, seed = 2L, frames = 2)
    // acTL body starts after sig(8) + IHDR chunk(12+13): len(4)+type(4)
    val actlBody = 8 + 25 + 8
    val lied = apng.clone()
    lied(actlBody + 3) = 5 // declared 5 frames, stream has 2 (CRC also breaks)
    assert(Multimodal.decodeApng(lied).isEmpty, "lying acTL")
    val bad = apng.clone(); bad(bad.length - 30) = 0x55
    assert(Multimodal.decodeApng(bad).isEmpty
      || Multimodal.decodeApng(bad) == Multimodal.decodeApng(apng),
      "corrupted chunk mis-decoded")
  }
}
