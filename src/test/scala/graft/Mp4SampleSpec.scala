package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** MP4 sample-table codec pair (q119): real stts/stsz/stsc/stco walk
  * with actual sample-byte extraction from mdat — pure JVM.
  */
class Mp4SampleSpec extends AnyFunSuite {

  /** Independent simulation: sample i has size 1+(seed+i)%17 and
    * occupies the next run of mdat bytes, byte j = (seed+j)%251 —
    * chunking must not affect any of it.
    */
  private def sim(n: Int, delta: Int, seed: Long): (Long, Long, Long, Long) = {
    val sizes = Array.tabulate(n)(i => 1 + (((seed + i) % 17 + 17) % 17).toInt)
    var j = 0L; var checksum = 0L
    for (i <- 0 until n) {
      var bs = 0L
      for (_ <- 0 until sizes(i)) { bs += ((seed + j) % 251 + 251) % 251; j += 1 }
      checksum += (i + 1).toLong * bs
    }
    (n.toLong, n.toLong * delta, sizes.map(_.toLong).sum, checksum)
  }

  test("sample extraction round-trips count, duration, sizes, byte checksum") {
    for {
      n <- Seq(1, 6, 7, 8, 14, 50) // exercises single-chunk, exact, ragged stsc
      (delta, seed) <- Seq((100, 0L), (117, 9L))
    } {
      val mp4 = Multimodal.synthesizeMp4Track(1000, n, delta, seed)
      assert(Multimodal.decodeMp4Samples(mp4).contains(sim(n, delta, seed)),
        s"n=$n delta=$delta seed=$seed")
      // the container-metadata view agrees on timescale + duration
      assert(Multimodal.decodeMp4(mp4).contains(
        ("isom", 1000, n.toLong * delta * 1000L / 1000L)), s"n=$n")
    }
  }

  test("mjpeg: demuxed frames decode through the JPEG decoder exactly") {
    for (nf <- Seq(1, 3, 8); (w, h) <- Seq((16, 16), (13, 21))) {
      val frames = (0 until nf).map(f =>
        Multimodal.synthesizeJpegDct(w, h, seed = 100L + f))
      val mp4 = Multimodal.synthesizeMp4Samples(1000, 40, frames, codec = "jpeg")
      // independent per-frame expectation: decode each RAW frame (the
      // JpegSpec-pinned decoder) before it ever enters the container
      val perFrame = frames.map(fb =>
        Multimodal.decodeJpegPixels(fb).map(_._3).getOrElse(fail("raw frame")))
      val expected = (nf.toLong, nf.toLong * 40, perFrame.sum,
        perFrame.zipWithIndex.map { case (s, i) => (i + 1) * s }.sum)
      assert(Multimodal.decodeMjpegSamples(mp4).contains(expected),
        s"nf=$nf w=$w h=$h")
      // the byte-level sample view still works on the same container
      assert(Multimodal.decodeMp4Samples(mp4).map(_._1).contains(nf.toLong))
    }
  }

  test("mjpeg: closed form matches the oracle arithmetic") {
    // frame f's block (bx,by) decodes flat at (id+f+bx+by)%151-75+128
    // cropped to (w,h) — the q122 oracle's exact expression
    val (id, w, h, nf) = (37L, 20, 11, 3)
    val frames = (0 until nf).map(f =>
      Multimodal.synthesizeJpegDct(w, h, seed = id + f))
    val mp4 = Multimodal.synthesizeMp4Samples(1000, 40, frames, codec = "jpeg")
    def frameSum(f: Int): Long =
      (for (bx <- 0 until (w + 7) / 8; by <- 0 until (h + 7) / 8) yield
        ((id + f + bx + by) % 151 - 75 + 128) *
          math.min(8, w - bx * 8) * math.min(8, h - by * 8)).sum
    val sums = (0 until nf).map(frameSum)
    assert(Multimodal.decodeMjpegSamples(mp4).contains(
      (nf.toLong, nf.toLong * 40,
        sums.sum, sums.zipWithIndex.map { case (s, i) => (i + 1) * s }.sum)))
  }

  test("mjpeg decode refuses a container whose samples are not JPEG") {
    val notJpeg = Multimodal.synthesizeMp4Track(1000, 5, 100, 3L)
    assert(Multimodal.decodeMjpegSamples(notJpeg).isEmpty)
    val frames = Seq(Multimodal.synthesizeJpegDct(16, 16, seed = 5L))
    val mp4 = Multimodal.synthesizeMp4Samples(1000, 40, frames, codec = "jpeg")
    assert(Multimodal.decodeMjpegSamples(mp4.dropRight(3)).isEmpty,
      "dangling stco offset must refuse, never mis-sum")
  }

  test("sample decode refuses payloads without a complete table") {
    // metadata-only synthesis has no track at all
    val meta = Multimodal.synthesizeMp4("isom", 600, 1200L, 4, 16)
    assert(Multimodal.decodeMp4Samples(meta).isEmpty)
    assert(Multimodal.decodeMp4(meta).isDefined, "metadata path unaffected")
    // truncating mdat makes an stco offset dangle: refuse, never mis-sum
    val mp4 = Multimodal.synthesizeMp4Track(1000, 20, 100, 3L)
    assert(Multimodal.decodeMp4Samples(mp4.dropRight(5)).isEmpty)
  }

  test("avc1: mux to AVCC samples and demux back NAL-identical") {
    import graft.operators.H264
    for (seed <- Seq(1L, 7L, 42L); nf <- Seq(2, 3)) {
      val annexB = H264.synthesizeH264Inter(2, 2, nf, seed)
      val mp4 = Multimodal.synthesizeMp4Avc1(annexB, 32, 32, 1000, 40)
      // one MP4 sample per slice NAL; SPS+PPS moved out of band
      val nSlices = H264.nalUnits(annexB)
        .count { case (s, _) => (annexB(s) & 0x1f) == 1 || (annexB(s) & 0x1f) == 5 }
      assert(Multimodal.decodeMp4Samples(mp4).map(_._1).contains(nSlices.toLong))
      val rebuilt = Multimodal.decodeMp4Avc1AnnexB(mp4)
        .getOrElse(fail(s"demux failed seed=$seed"))
      // NAL-sequence identity (start-code width is not significant:
      // the synth mixes 3- and 4-byte starts, the rebuild uses 4)
      def nalBytes(p: Array[Byte]) = H264.nalUnits(p).map { case (s, e) =>
        java.util.Arrays.copyOfRange(p, s, e).toSeq }
      assert(nalBytes(rebuilt) == nalBytes(annexB), s"seed=$seed nf=$nf")
      // and the DECODE composes: container round-trip is invisible to
      // the pixel reconstruction
      val want = H264.decodeInter(annexB)
      assert(want.nonEmpty)
      assert(H264.decodeInter(rebuilt) == want, s"seed=$seed nf=$nf")
    }
  }

  test("avc1: multi-slice stream round-trips too (NAL != frame granularity)") {
    import graft.operators.H264
    val annexB = H264.synthesizeH264InterSliced(2, 2, 3, 2, 11L)
    val mp4 = Multimodal.synthesizeMp4Avc1(annexB, 32, 32, 1000, 40)
    val rebuilt = Multimodal.decodeMp4Avc1AnnexB(mp4).getOrElse(fail("demux"))
    assert(H264.decodeInter(rebuilt) == H264.decodeInter(annexB))
  }

  test("avc1: corrupt AVCC length walk is refused") {
    import graft.operators.H264
    val annexB = H264.synthesizeH264Inter(2, 1, 2, 5L)
    val mp4 = Multimodal.synthesizeMp4Avc1(annexB, 32, 16, 1000, 40)
    // find the first sample's 4-byte length prefix in mdat and corrupt
    // it so the length walk overruns the sample end
    val ranges = Multimodal.decodeMp4Samples(mp4)
    assert(ranges.nonEmpty)
    val mdatTag = Array[Byte]('m', 'd', 'a', 't')
    val mdatAt = mp4.indexOfSlice(mdatTag)
    assert(mdatAt > 0)
    val bad = mp4.clone()
    bad(mdatAt + 4) = 0x7f.toByte // length prefix MSB: huge length
    assert(Multimodal.decodeMp4Avc1AnnexB(bad).isEmpty)
    // non-avc1 container is refused up front
    val mjpeg = Multimodal.synthesizeMp4Samples(1000, 40,
      Seq(Multimodal.synthesizeJpegDct(16, 16, 1L)), codec = "jpeg")
    assert(Multimodal.decodeMp4Avc1AnnexB(mjpeg).isEmpty)
  }

  test("frame fingerprints: stable across re-decode, distinct across frames/sources") {
    import graft.operators.H264
    for (seed <- 0L until 4L) {
      val annexB = H264.synthesizeH264Inter(2 + (seed % 3).toInt,
        1 + (seed % 3).toInt, 8, seed)
      val mp4 = Multimodal.synthesizeMp4Avc1(annexB,
        16 * (2 + (seed % 3).toInt), 16 * (1 + (seed % 3).toInt), 1000, 40)
      val a = Multimodal.mp4FrameFingerprints(mp4)
      val b = Multimodal.mp4FrameFingerprints(mp4)
      assert(a.isDefined && a.get.length == 8)
      assert(a.get.sameElements(b.get), "re-decode must be bit-stable")
      // position-qualification guarantees pairwise-distinct
      // fingerprints in-stream even where the looping inter recipe
      // revisits pixel-identical reconstructions
      assert(a.get.distinct.length == 8, s"seed=$seed collision in-stream")
    }
    // different sources never share a frame fingerprint
    val all = (0L until 4L).flatMap { seed =>
      val annexB = H264.synthesizeH264Inter(2 + (seed % 3).toInt,
        1 + (seed % 3).toInt, 8, seed)
      Multimodal.mp4FrameFingerprints(Multimodal.synthesizeMp4Avc1(annexB,
        16 * (2 + (seed % 3).toInt), 16 * (1 + (seed % 3).toInt), 1000, 40)).get
    }
    assert(all.distinct.length == all.length, "cross-source collision")
    // and a fingerprint answers to pixels: corrupting one residual
    // byte of the stream (or failing decode) cannot reproduce it —
    // weaker form: a different seed's frame 0 differs from this one's
    assert(Multimodal.mp4FrameFingerprints(
      Multimodal.synthesizeMp4Avc1(H264.synthesizeH264Inter(2, 1, 2, 99L),
        32, 16, 1000, 40)).get.head != all.head)
  }
}
