package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Integer audio DSP over decoded PCM: the sample-rate normalization
  * step a multimodal training pipeline runs between decode
  * ([[Multimodal.decodeWav]], [[Flac]], [[Adpcm]]) and feature
  * extraction — every corpus mixes rates, and features only compare
  * at one. Decimation is the textbook low-pass-then-drop: an
  * odd-length symmetric integer FIR (linear phase, power-of-two tap
  * sum so unity DC gain is exact) evaluated at every OUTPUT sample
  * position with edge replication, then keep every `factor`-th
  * sample. All arithmetic is integer (round-half-up via +2^(s−1)
  * then arithmetic shift), so the q171 oracle re-derives every
  * output sample in SQL. Runs map-side per row — zero shuffle, the
  * shape that holds at 100 TB.
  */
object AudioDsp {

  /** Mono PCM16 WAV → (sampleRate, samples). Same hardened RIFF walk
    * as [[Multimodal.decodeWav]] (negative sizes bail) but returns
    * the actual samples; None for compressed tags, stereo, or
    * truncation.
    */
  def decodePcm16(p: Array[Byte]): Option[(Int, Array[Int])] = {
    def le16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int) = le16(o) | (le16(o + 2) << 16)
    def tag(o: Int) = new String(p, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12L
    var rate = 0
    var ok = false
    var samples: Array[Int] = null
    while (o + 8 <= p.length) {
      val oi = o.toInt
      val id = tag(oi)
      val sz = le32(oi + 4)
      if (sz < 0) return None
      if (id == "fmt " && o + 24 <= p.length) {
        if (le16(oi + 8) != 1) return None   // PCM only
        if (le16(oi + 10) != 1) return None  // mono only
        rate = le32(oi + 12)
        if (le16(oi + 22) != 16) return None // 16-bit
        ok = true
      } else if (id == "data" && ok) {
        if (o + 8 + sz > p.length || sz % 2 != 0) return None
        samples = new Array[Int](sz / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = le16(oi + 8 + 2 * i).toShort.toInt
          i += 1
        }
      }
      o += 8L + sz + (sz & 1)
    }
    if (ok && rate > 0 && samples != null) Some((rate, samples)) else None
  }

  /** The decimation low-pass: symmetric, Σ = 16 = 2^4 (exact unity
    * DC gain after the >>4).
    */
  val decimTaps: Array[Int] = Array(1, 2, 3, 4, 3, 2, 1)

  /** FIR + decimate: y(k) = (Σ taps(i)·x(clamp(k·factor + i − c)) +
    * 2^(s−1)) >> s with c the filter center and edge replication —
    * output length ⌈n / factor⌉.
    */
  def firDecimate(x: Array[Int], taps: Array[Int], shift: Int,
      factor: Int): Array[Int] = {
    require(taps.length % 2 == 1 && factor >= 1 && shift >= 1)
    val c = taps.length / 2
    val n = x.length
    val out = new Array[Int]((n + factor - 1) / factor)
    var k = 0
    while (k < out.length) {
      var s = 0
      var i = 0
      while (i < taps.length) {
        val j = math.min(math.max(k * factor + i - c, 0), n - 1)
        s += taps(i) * x(j)
        i += 1
      }
      out(k) = (s + (1 << (shift - 1))) >> shift
      k += 1
    }
    out
  }

  /** Mono PCM16 WAV with closed-form samples (the q171 synth):
    * s_i = (seed·7 + i·13) % 401 − 200 at `rate` Hz.
    */
  def synthesizePcm16Wav(n: Int, rate: Int, seed: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    def w16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out ++= "RIFF".getBytes("US-ASCII"); w32(36 + 2 * n)
    out ++= "WAVE".getBytes("US-ASCII")
    out ++= "fmt ".getBytes("US-ASCII"); w32(16)
    w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    out ++= "data".getBytes("US-ASCII"); w32(2 * n)
    var i = 0
    while (i < n) {
      w16((((seed * 7 + i * 13) % 401).toInt - 200) & 0xffff)
      i += 1
    }
    out.toArray
  }
}
