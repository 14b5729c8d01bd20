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

  test("sample decode refuses payloads without a complete table") {
    // metadata-only synthesis has no track at all
    val meta = Multimodal.synthesizeMp4("isom", 600, 1200L, 4, 16)
    assert(Multimodal.decodeMp4Samples(meta).isEmpty)
    assert(Multimodal.decodeMp4(meta).isDefined, "metadata path unaffected")
    // truncating mdat makes an stco offset dangle: refuse, never mis-sum
    val mp4 = Multimodal.synthesizeMp4Track(1000, 20, 100, 3L)
    assert(Multimodal.decodeMp4Samples(mp4.dropRight(5)).isEmpty)
  }
}
