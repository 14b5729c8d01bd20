package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** PNG codec pair — pure JVM, no Spark needed. */
class PngSpec extends AnyFunSuite {

  private def expectedSum(w: Int, h: Int, seed: Long): Long =
    (for { y <- 0 until h; x <- 0 until w }
      yield ((seed + x + y) % 251 + 251) % 251).map(_.toLong).sum

  test("encode → decode round-trips dimensions and pixel sum across sizes") {
    for {
      (w, h) <- Seq((1, 1), (1, 7), (7, 1), (3, 5), (48, 32), (47, 31), (64, 5))
      seed <- Seq(0L, 1L, 9L, 987654L)
    } {
      val png = Multimodal.synthesizePng(w, h, seed)
      val got = Multimodal.decodePng(png)
      assert(got.contains((w, h, expectedSum(w, h, seed))),
        s"w=$w h=$h seed=$seed: got $got")
    }
  }

  test("every filter type reconstructs: single-row images per filter") {
    // h=5 rotates through filters 0..4; h=1..5 pin each prefix. Also a
    // 2-column image hits the x=0 edge cases of Sub/Average/Paeth.
    for (h <- 1 to 5; w <- Seq(2, 17)) {
      val png = Multimodal.synthesizePng(w, h, seed = 100L)
      assert(Multimodal.decodePng(png)
        .contains((w, h, expectedSum(w, h, 100L))), s"w=$w h=$h")
    }
  }

  test("Paeth predictor matches the spec's worked arithmetic") {
    // hand-check: left=50, above=60, upper-left=40 → p=70,
    // pa=20 pb=10 pc=30 → predictor = above. Encode a 2x2 image whose
    // filter-4 row exercises exactly that neighborhood.
    // pixels: (0,0)=40 (1,0)=60 / (0,1)=50 (1,1)=123
    val raw = Seq(40, 60, 50, 123)
    // build a PNG by hand: row 0 filter 0, row 1 filter 4
    // row1: x=0: left=0,above=40,ul=0 → p=40,pa=40,pb=0,pc=40 → above
    //   enc = 50-40 = 10
    // x=1: left=50,above=60,ul=40 → p=70,pa=20,pb=10,pc=30 → above(60)
    //   enc = 123-60 = 63
    val scan = Array[Byte](0, 40, 60, 4, 10, 63)
    val defl = new java.util.zip.Deflater()
    defl.setInput(scan); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!defl.finished()) z.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(t: String, b: Array[Byte]): Unit = {
      out.write(be32(b.length.toLong)); val tb = t.getBytes("US-ASCII")
      out.write(tb); out.write(b)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(b)
      out.write(be32(crc.getValue))
    }
    chunk("IHDR", be32(2L) ++ be32(2L) ++ Array[Byte](8, 0, 0, 0, 0))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePng(out.toByteArray)
      .contains((2, 2, raw.map(_.toLong).sum)))
  }

  test("corrupted and truncated payloads are rejected") {
    val png = Multimodal.synthesizePng(20, 10, seed = 3L)
    assert(Multimodal.decodePng(png.take(20)).isEmpty, "truncated")
    val badCrc = png.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x7f).toByte
    assert(Multimodal.decodePng(badCrc).isEmpty, "CRC flip rejected")
    val badSig = png.clone(); badSig(1) = 'Q'.toByte
    assert(Multimodal.decodePng(badSig).isEmpty, "bad signature")
    // lie about the height in IHDR: CRC catches it even though the
    // zlib stream would now mismatch anyway
    val lied = png.clone(); lied(8 + 8 + 7) = 99.toByte
    assert(Multimodal.decodePng(lied).isEmpty, "dimension lie rejected")
  }

  test("PNG and the other decoders stay out of each other's way") {
    val png = Multimodal.synthesizePng(10, 10, seed = 1L)
    assert(Multimodal.decodeGif(png).isEmpty)
    assert(Multimodal.decodeJpeg(png).isEmpty)
    assert(Multimodal.decodeBmp(png).isEmpty)
    assert(Multimodal.decodePng(Multimodal.synthesizeGif(10, 10, 1L)).isEmpty)
  }
}
