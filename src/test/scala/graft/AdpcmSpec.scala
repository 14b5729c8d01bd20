package graft

import graft.operators.Adpcm
import org.scalatest.funsuite.AnyFunSuite

class AdpcmSpec extends AnyFunSuite {

  test("step uses the TRUNCATING bit-test expansion, not ((2m+1)*step)>>3") {
    // step=7, nibble=3: bit-test gives 0 + 3 + 1 = 4; the rounded
    // formula gives (7*7)>>3 = 6 — a decoder built on the wrong form
    // drifts on every low-step sample
    val (p, _) = Adpcm.step(0, 0, 3)
    assert(p == 4)
    // nibble 11 = 8|3: same magnitude, negative sign
    val (pn, _) = Adpcm.step(0, 0, 11)
    assert(pn == -4)
  }

  test("index and predictor clamp at the rails") {
    // index 88 + table(7)=8 clamps to 88; predictor clamps at ±32767/−32768
    val (p1, i1) = Adpcm.step(32000, 88, 7)
    assert(p1 == 32767 && i1 == 88)
    val (p2, i2) = Adpcm.step(-32000, 88, 15)
    assert(p2 == -32768 && i2 == 88)
    // low rail: index 0 + (-1) clamps to 0
    val (_, i3) = Adpcm.step(0, 0, 0)
    assert(i3 == 0)
  }

  test("decode equals an independent per-sample replay of the state machine") {
    for (seed <- 0L until 10L) {
      val nb = 1 + (seed % 3).toInt
      val a = Adpcm.decodeImaAdpcm(Adpcm.synthesizeImaAdpcmWav(nb, seed)).get
      assert(a.nBlocks == nb && a.nSamples == nb * 65L && a.sampleRate == 8000)
      var sum = 0L; var wsum = 0L; var i = 0L
      var fp = 0; var fi = 0
      for (b <- 0 until nb) {
        var pred = ((seed * 97 + b * 131) % 2048).toInt - 1024
        var idx = ((seed * 5 + b * 17) % 89).toInt
        sum += pred; i += 1; wsum += i * pred
        for (k <- 0 until 64) {
          val n = ((seed * 7 + b * 19 + k * 13) % 16).toInt
          val st = Adpcm.stepTable(idx)
          var diff = st >> 3
          if ((n & 4) != 0) diff += st
          if ((n & 2) != 0) diff += st >> 1
          if ((n & 1) != 0) diff += st >> 2
          pred = math.max(-32768, math.min(32767,
            if ((n & 8) != 0) pred - diff else pred + diff))
          idx = math.max(0, math.min(88, idx + Adpcm.indexTable(n)))
          sum += pred; i += 1; wsum += i * pred
        }
        fp = pred; fi = idx
      }
      assert(a.sampleSum == sum, s"seed=$seed sum")
      assert(a.weightedSum == wsum, s"seed=$seed weighted")
      assert(a.finalPred == fp && a.finalIndex == fi, s"seed=$seed final")
    }
  }

  test("decode refuses out-of-subset and malformed containers") {
    val good = Adpcm.synthesizeImaAdpcmWav(2, 5L)
    // PCM WAV decoder refuses the compressed tag; ADPCM refuses PCM
    assert(graft.operators.Multimodal.decodeWav(good).isEmpty)
    assert(Adpcm.decodeImaAdpcm(Array.empty[Byte]).isEmpty)
    assert(Adpcm.decodeImaAdpcm(good.take(40)).isEmpty)        // truncated data
    val stereo = good.clone(); stereo(22) = 2                  // nChannels
    assert(Adpcm.decodeImaAdpcm(stereo).isEmpty)
    val badIdx = good.clone()
    // corrupt a block header step index past 88 (data starts at 12+28+12+8)
    val dataOff = 12 + (8 + 20) + (8 + 4) + 8
    badIdx(dataOff + 2) = 120.toByte
    assert(Adpcm.decodeImaAdpcm(badIdx).isEmpty)
    val badFact = good.clone()
    badFact(12 + (8 + 20) + 8) = 7                             // fact count
    assert(Adpcm.decodeImaAdpcm(badFact).isEmpty)
    // arbitrary bytes: None or Some, never a throw
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 0 until 300)
      Adpcm.decodeImaAdpcm(Array.fill(8 + rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }
}
