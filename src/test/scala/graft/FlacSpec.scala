package graft

import graft.operators.Flac
import org.scalatest.funsuite.AnyFunSuite

/** Pins the FLAC codec: CRCs against the PUBLISHED check values
  * (independent of any stream this repo makes), full-stream decode
  * against a per-sample simulation, MD5 integrity, and tamper /
  * truncation refusal.
  */
class FlacSpec extends AnyFunSuite {

  test("CRC kernels match the published check values for '123456789'") {
    // CRC-8 poly 0x07 init 0 → 0xF4; CRC-16 poly 0x8005 non-reflected
    // init 0 (CRC-16/UMTS) → 0xFEE8. These pin the table/shift logic
    // against the public references, not our own encoder.
    val check = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(check, 0, check.length) == 0xF4)
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8)
  }

  test("stream decode equals the closed-form sample simulation") {
    for (seed <- 0L until 24L) {
      val nf = 1 + (seed % 3).toInt
      val got = Flac.decodeFlac(Flac.synthesizeFlac(nf, seed))
        .getOrElse(fail(s"seed=$seed did not decode"))
      assert(got.nFrames == nf && got.totalSamples == nf * 192L &&
        got.sampleRate == 8000)
      var sum = 0L; var weighted = 0L
      for (f <- 0 until nf) {
        val fs = Flac.synthSamples(seed, f).map(_.toLong).sum
        sum += fs; weighted += (f + 1) * fs
      }
      assert(got.sampleSum == sum, s"seed=$seed")
      assert(got.weightedSum == weighted, s"seed=$seed")
      assert(got.md5Ok, s"seed=$seed md5 must verify")
    }
  }

  test("fixed-order-2 samples really are the quadratic closed form") {
    for (seed <- Seq(2L, 5L, 8L); f <- 0 until 3
         if (seed + f) % 3 == 2) {
      val s = Flac.synthSamples(seed, f)
      val w0 = (seed % 50).toInt - 25
      val d1 = (f % 9) - 4
      val r = if ((seed + f) % 2 == 0) 1 else -1
      for (i <- 0 until 192)
        assert(s(i) == w0 + i * d1 + i * (i - 1) / 2 * r, s"seed=$seed f=$f i=$i")
    }
  }

  test("stereo decode: LPC, left/side and mid/side reconstruct the exact planes") {
    for (seed <- 0L until 18L) {
      val nf = 1 + (seed % 3).toInt
      val got = Flac.decodeFlac(Flac.synthesizeFlacStereo(nf, seed))
        .getOrElse(fail(s"seed=$seed did not decode"))
      assert(got.nFrames == nf && got.totalSamples == nf * 192L)
      var sum = 0L; var weighted = 0L
      for (f <- 0 until nf) {
        val (l, r) = Flac.synthSamplesStereo(seed, f)
        val fs = l.map(_.toLong).sum + r.map(_.toLong).sum
        sum += fs; weighted += (f + 1) * fs
      }
      assert(got.sampleSum == sum, s"seed=$seed")
      assert(got.weightedSum == weighted, s"seed=$seed")
      // md5Ok TRUE means every reconstructed SAMPLE matched, not just
      // the sums — the decorrelation and LPC shift arithmetic is exact
      assert(got.md5Ok, s"seed=$seed md5 must verify")
    }
  }

  test("LPC chain samples really are the prefix-sum closed form") {
    for (seed <- Seq(0L, 3L, 9L); f <- 0 until 3 if (seed + f) % 3 == 0) {
      val (l, _) = Flac.synthSamplesStereo(seed, f)
      val w = (seed % 40).toInt - 20
      var acc = w
      assert(l(0) == w)
      for (i <- 1 until 192) {
        acc += ((seed + f + i * 7L) % 9).toInt - 4
        assert(l(i) == acc, s"seed=$seed f=$f i=$i")
      }
    }
  }

  test("a flipped byte in any section is caught (CRC-8, CRC-16 or MD5)") {
    val clean = Flac.synthesizeFlac(2, 7L)
    assert(Flac.decodeFlac(clean).exists(_.md5Ok))
    // flip bytes across the stream: every corruption must surface as
    // None (header/frame CRC or structure) or md5Ok = false
    for (pos <- Seq(45, 60, clean.length / 2, clean.length - 3)) {
      val bad = clean.clone()
      bad(pos) = (bad(pos) ^ 0x40).toByte
      val dec = Flac.decodeFlac(bad)
      assert(dec.isEmpty || !dec.get.md5Ok, s"corruption at $pos undetected")
    }
  }

  test("truncated, garbage, and wrong-magic inputs decode to None") {
    val clean = Flac.synthesizeFlac(1, 3L)
    assert(Flac.decodeFlac(clean.take(clean.length - 4)).isEmpty)
    assert(Flac.decodeFlac(clean.take(20)).isEmpty)
    assert(Flac.decodeFlac("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decodeFlac(Array.fill(64)(0x55.toByte)).isEmpty)
    val rnd = new scala.util.Random(123)
    for (_ <- 0 until 200) {
      val junk = Array.fill(16 + rnd.nextInt(200))(rnd.nextInt.toByte)
      Flac.decodeFlac(junk) // must not throw
    }
  }

  test("frame fingerprints: stable, frame-count exact, distinct in and across streams") {
    for (seed <- 0L until 4L) {
      val st = Flac.synthesizeFlac(8, seed)
      val a = Flac.flacFrameFingerprints(st)
      val b = Flac.flacFrameFingerprints(st)
      assert(a.isDefined && a.get.length == 8)
      assert(a.get.sameElements(b.get), "re-decode must be bit-stable")
      assert(a.get.distinct.length == 8, s"seed=$seed in-stream collision")
      // the hook mirrors decodeFlac's samples exactly: recompute one
      // frame's fingerprint from the synth closed form
      val want = {
        var h = 0xcbf29ce484222325L ^ (2L * 0x9E3779B97F4A7C15L)
        Flac.synthSamples(seed, 2).foreach { v =>
          h ^= (v & 0xFFFFL); h *= 0x100000001b3L
        }
        h
      }
      assert(a.get(2) == want, s"seed=$seed frame-2 fingerprint")
    }
    val all = (0L until 4L).flatMap(s =>
      Flac.flacFrameFingerprints(Flac.synthesizeFlac(8, s)).get)
    assert(all.distinct.length == all.length, "cross-source collision")
    // a corrupt stream yields None, not partial fingerprints
    val clean = Flac.synthesizeFlac(2, 5L)
    assert(Flac.flacFrameFingerprints(clean.take(clean.length - 4)).isEmpty)
  }
}
