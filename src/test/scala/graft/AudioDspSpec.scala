package graft

import graft.operators.{Adpcm, AudioDsp}
import org.scalatest.funsuite.AnyFunSuite

class AudioDspSpec extends AnyFunSuite {

  test("PCM16 decode inverts the closed-form synth") {
    for (seed <- 0L until 8L) {
      val n = 96 + (seed % 3).toInt * 32
      val (rate, xs) = AudioDsp.decodePcm16(
        AudioDsp.synthesizePcm16Wav(n, 16000, seed)).get
      assert(rate == 16000 && xs.length == n)
      for (i <- 0 until n)
        assert(xs(i) == ((seed * 7 + i * 13) % 401).toInt - 200)
    }
  }

  test("FIR decimation: unity DC gain, symmetric impulse, edge replication") {
    // constant input passes through exactly (Σtaps = 16 = 1 << 4)
    val const = AudioDsp.firDecimate(Array.fill(20)(123), AudioDsp.decimTaps, 4, 2)
    assert(const.forall(_ == 123))
    // negative constants too (arithmetic-shift rounding, not truncation)
    val neg = AudioDsp.firDecimate(Array.fill(20)(-77), AudioDsp.decimTaps, 4, 2)
    assert(neg.forall(_ == -77))
    // impulse at the center of an output position reads tap 3 (=4):
    // (4*64 + 8) >> 4 = 16; neighbor outputs k=1/k=3 see the impulse
    // at distance ±2 → tap 2 → (2*64 + 8) >> 4 = 8
    val imp = Array.fill(21)(0); imp(4) = 64
    val y = AudioDsp.firDecimate(imp, AudioDsp.decimTaps, 4, 2)
    assert(y(2) == 16 && y(1) == 8 && y(3) == 8 && y(0) == 0)
    // edge replication: a step at the boundary keeps the first output
    // the full step value
    val step = Array.fill(12)(100)
    assert(AudioDsp.firDecimate(step, AudioDsp.decimTaps, 4, 2)(0) == 100)
  }

  test("FIR rounding floors on negatives (arithmetic shift semantics)") {
    // single sample -1 everywhere: Σ = -16 → (-16 + 8) >> 4 = -1
    val y = AudioDsp.firDecimate(Array.fill(8)(-1), AudioDsp.decimTaps, 4, 2)
    assert(y.forall(_ == -1))
    // a sum landing at -8: (-8 + 8) >> 4 = 0 (round half toward +inf)
    val imp = Array.fill(9)(0); imp(2) = -2 // output k=1 center tap: -8
    assert(AudioDsp.firDecimate(imp, AudioDsp.decimTaps, 4, 2)(1) == 0)
  }

  test("decimation equals an independent direct convolution") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 0 until 50) {
      val n = 16 + rnd.nextInt(200)
      val xs = Array.fill(n)(rnd.nextInt(2001) - 1000)
      val got = AudioDsp.firDecimate(xs, AudioDsp.decimTaps, 4, 2)
      assert(got.length == (n + 1) / 2)
      for (k <- got.indices) {
        var s = 0
        for (t <- 0 until 7)
          s += AudioDsp.decimTaps(t) * xs(math.min(math.max(2 * k + t - 3, 0), n - 1))
        assert(got(k) == (s + 8) >> 4)
      }
    }
  }

  test("PCM16 decode refuses other tags, stereo, and truncation") {
    assert(AudioDsp.decodePcm16(Adpcm.synthesizeImaAdpcmWav(1, 3L)).isEmpty)
    val good = AudioDsp.synthesizePcm16Wav(64, 16000, 3L)
    val stereo = good.clone(); stereo(22) = 2
    assert(AudioDsp.decodePcm16(stereo).isEmpty)
    assert(AudioDsp.decodePcm16(good.take(50)).isEmpty)
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 200)
      AudioDsp.decodePcm16(Array.fill(8 + rnd.nextInt(100))(rnd.nextInt(256).toByte))
  }
}
