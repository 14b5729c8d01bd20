package graft.operators

import scala.collection.mutable.ArrayBuffer

/** IMA/DVI ADPCM (WAV format tag 0x0011) — the audio family's LOSSY
  * predictive-coding class, completing the decode story alongside raw
  * PCM ([[Multimodal.decodeWav]]) and lossless compression
  * ([[Flac]]). The decoder runs the canonical IMA state machine
  * (88-entry step table, bit-test difference expansion, predictor /
  * step-index clamping) over real RIFF blocks whose 4-byte headers
  * carry the block-initial predictor and step index, exactly as WAV
  * ADPCM encoders emit them. Reference anchor: the loader treats
  * media bytes as opaque row payloads (AbstractClickhouseLoaderMapper
  * .java:159-248); decode is the engine-side extension, and it runs
  * map-side — per-row arithmetic with zero shuffle, the shape that
  * holds at 100 TB.
  *
  * Tables are the published IMA ADPCM reference values (IMA Digital
  * Audio Focus and Technical Working Groups, 1992 — reproduced in
  * countless public decoders); the bit-test expansion
  * `diff = step>>3 (+step if b2) (+step>>1 if b1) (+step>>2 if b0)`
  * is the spec's truncating form, NOT the `((2m+1)·step)>>3`
  * approximation — AdpcmSpec pins the difference on vectors where
  * the two disagree.
  */
object Adpcm {

  private[graft] val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the IMA state machine: (pred', index'). */
  private[graft] def step(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val st = stepTable(index)
    var diff = st >> 3
    if ((nibble & 4) != 0) diff += st
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 1) != 0) diff += st >> 2
    val p = if ((nibble & 8) != 0) pred - diff else pred + diff
    val pc = math.max(-32768, math.min(32767, p))
    val ic = math.max(0, math.min(88, index + indexTable(nibble)))
    (pc, ic)
  }

  private def le16(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += (v & 0xff).toByte; b += ((v >> 8) & 0xff).toByte
  }
  private def le32(b: ArrayBuffer[Byte], v: Int): Unit = {
    le16(b, v & 0xffff); le16(b, (v >>> 16) & 0xffff)
  }

  /** Mono IMA ADPCM WAV: fmt (tag 0x0011, 4-bit, blockAlign 36,
    * samplesPerBlock 65 in the cbSize-2 extension), a `fact` chunk
    * (mandatory for compressed WAVE), and `data` of nBlocks blocks —
    * each a 4-byte header (int16 predictor, step index, reserved 0)
    * plus 32 nibble-packed bytes (low nibble first). Block b of doc
    * `seed` starts at predictor (seed·97 + b·131) % 2048 − 1024,
    * index (seed·5 + b·17) % 89; nibble j is (seed·7 + b·19 + j·13)
    * % 16 — closed forms the q164 oracle replays through a recursive
    * SQL state machine.
    */
  def synthesizeImaAdpcmWav(nBlocks: Int, seed: Long): Array[Byte] = {
    val blockAlign = 36
    val samplesPerBlock = (blockAlign - 4) * 2 + 1 // 65
    val rate = 8000
    val data = new ArrayBuffer[Byte]()
    var b = 0
    while (b < nBlocks) {
      val pred = ((seed * 97 + b * 131) % 2048).toInt - 1024
      val idx = ((seed * 5 + b * 17) % 89).toInt
      le16(data, pred & 0xffff)
      data += idx.toByte
      data += 0.toByte
      var j = 0
      while (j < blockAlign - 4) {
        val lo = ((seed * 7 + b * 19 + (2 * j) * 13) % 16).toInt
        val hi = ((seed * 7 + b * 19 + (2 * j + 1) * 13) % 16).toInt
        data += ((hi << 4) | lo).toByte
        j += 1
      }
      b += 1
    }
    val out = new ArrayBuffer[Byte]()
    out ++= "RIFF".getBytes("US-ASCII")
    le32(out, 4 + (8 + 20) + (8 + 4) + (8 + data.length))
    out ++= "WAVE".getBytes("US-ASCII")
    out ++= "fmt ".getBytes("US-ASCII")
    le32(out, 20)
    le16(out, 0x11)                    // wFormatTag: IMA ADPCM
    le16(out, 1)                       // channels
    le32(out, rate)
    le32(out, rate * blockAlign / samplesPerBlock) // avg bytes/sec
    le16(out, blockAlign)
    le16(out, 4)                       // bits per (coded) sample
    le16(out, 2)                       // cbSize
    le16(out, samplesPerBlock)
    out ++= "fact".getBytes("US-ASCII")
    le32(out, 4)
    le32(out, nBlocks * samplesPerBlock)
    out ++= "data".getBytes("US-ASCII")
    le32(out, data.length)
    out ++= data
    out.toArray
  }

  final case class AdpcmAudio(
      nBlocks: Int, nSamples: Long, sampleRate: Int,
      sampleSum: Long, weightedSum: Long, finalPred: Int, finalIndex: Int)

  private def rd16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], o: Int): Int =
    rd16(b, o) | (rd16(b, o + 2) << 16)
  private def tag4(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a mono IMA ADPCM WAV: RIFF chunk walk (same hardened
    * posture as [[Multimodal.decodeWav]] — negative/overflowing sizes
    * bail), fmt tag 0x0011 with 4-bit samples and a consistent
    * samplesPerBlock, then per block: the header predictor is sample
    * 0 and each nibble (low first) advances the state machine. The
    * `fact` sample count, when present, must match the decoded total.
    * None on anything outside the subset — stereo, other tags, step
    * index > 88, short final block.
    */
  def decodeImaAdpcm(p: Array[Byte]): Option[AdpcmAudio] = {
    if (p.length < 12 || tag4(p, 0) != "RIFF" || tag4(p, 8) != "WAVE") return None
    var o = 12L
    var rate = 0
    var blockAlign = 0
    var samplesPerBlock = 0
    var haveFmt = false
    var factSamples = -1L
    var nBlocks = 0
    var nSamples = 0L
    var sampleSum = 0L
    var weighted = 0L
    var finalPred = 0
    var finalIndex = 0
    while (o + 8 <= p.length) {
      val oi = o.toInt
      val id = tag4(p, oi)
      val sz = rd32(p, oi + 4)
      if (sz < 0) return None
      if (id == "fmt " && o + 8 + 16 <= p.length) {
        if (rd16(p, oi + 8) != 0x11) return None
        if (rd16(p, oi + 10) != 1) return None   // mono only in scope
        rate = rd32(p, oi + 12)
        blockAlign = rd16(p, oi + 20)
        if (rd16(p, oi + 22) != 4) return None   // 4-bit nibbles
        samplesPerBlock =
          if (sz >= 20 && o + 8 + 20 <= p.length) rd16(p, oi + 26)
          else (blockAlign - 4) * 2 + 1
        if (blockAlign < 5 || samplesPerBlock != (blockAlign - 4) * 2 + 1)
          return None
        haveFmt = true
      } else if (id == "fact" && sz >= 4 && o + 12 <= p.length) {
        factSamples = rd32(p, oi + 8).toLong & 0xffffffffL
      } else if (id == "data") {
        if (!haveFmt) return None
        val end = math.min(p.length.toLong, o + 8L + sz).toInt
        if (end - (o + 8) != sz) return None     // truncated payload
        if (sz % blockAlign != 0) return None
        var bo = oi + 8
        while (bo < end) {
          var pred = rd16(p, bo).toShort.toInt
          var idx = p(bo + 2) & 0xff
          if (idx > 88 || p(bo + 3) != 0) return None
          nSamples += 1
          sampleSum += pred
          weighted += nSamples * pred
          var j = 0
          while (j < blockAlign - 4) {
            val byte = p(bo + 4 + j) & 0xff
            var half = 0
            while (half < 2) {
              val n = if (half == 0) byte & 0xf else byte >> 4
              val (pp, ii) = step(pred, idx, n)
              pred = pp; idx = ii
              nSamples += 1
              sampleSum += pred
              weighted += nSamples * pred
              half += 1
            }
            j += 1
          }
          finalPred = pred
          finalIndex = idx
          nBlocks += 1
          bo += blockAlign
        }
      }
      o += 8L + sz + (sz & 1)
    }
    if (!haveFmt || rate <= 0 || nBlocks == 0) return None
    if (factSamples >= 0 && factSamples != nSamples) return None
    Some(AdpcmAudio(nBlocks, nSamples, rate, sampleSum, weighted,
      finalPred, finalIndex))
  }
}
