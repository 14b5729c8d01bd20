package graft.operators

import scala.collection.mutable.ArrayBuffer

/** FLAC synthesis + decode (format: xiph.org FLAC specification,
  * public) — the audio family's COMPRESSED path beside the raw-PCM
  * WAV decoder, and the codec stack's Rice/Golomb residual coding
  * (the one residual-coding family Exp-Golomb / LZW / zlib / CAVLC
  * did not cover).
  *
  * Real pieces, all spec-pinned in FlacSpec: STREAMINFO metadata,
  * frame headers with CRC-8 (poly 0x07) and frame CRC-16 (poly
  * 0x8005) — both validated against the independent published check
  * values for "123456789" (0xF4 / 0xFEE8); CONSTANT / VERBATIM /
  * FIXED(0..4) subframes; partitioned Rice residuals (zigzag fold,
  * unary quotient, k low bits, escape partitions); fixed-predictor
  * reconstruction; and the STREAMINFO MD5 verified against the
  * decoded PCM (a whole-pipeline self-check no single CRC gives).
  * Subset refusals (LPC subframes, stereo decorrelation, multi-byte
  * frame numbers) return None rather than guess — the H.264 stance.
  *
  * Scale shape: like every codec here, decode is map-side
  * partition-batched work over opaque byte columns; nothing shuffles.
  */
object Flac {

  // ---------------------------------------------------------------
  // bit I/O (byte-aligned buffers so the CRCs can run over raw bytes)
  // ---------------------------------------------------------------

  private final class BitWriter {
    val bytes = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0

    def u(v: Long, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((v >>> b) & 1L).toInt
        nBits += 1
        if (nBits == 8) { bytes += cur.toByte; cur = 0; nBits = 0 }
        b -= 1
      }
    }

    /** FLAC unary: q zero bits terminated by a 1. */
    def unary(q: Int): Unit = { var i = 0; while (i < q) { u(0, 1); i += 1 }; u(1, 1) }

    def alignZero(): Unit = while (nBits != 0) u(0, 1)

    def result(): Array[Byte] = { alignZero(); bytes.toArray }
  }

  private final class BitReader(bytes: Array[Byte], from: Int) {
    var pos: Int = from * 8

    def u(bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) {
        val byteIdx = pos >>> 3
        if (byteIdx >= bytes.length) throw new IllegalStateException("EOS")
        v = (v << 1) | ((bytes(byteIdx) >>> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }

    def unary(): Int = {
      var q = 0
      while (u(1) == 0L) {
        q += 1
        if (q > (1 << 20)) throw new IllegalStateException("unary runaway")
      }
      q
    }

    def alignToByte(): Unit = pos = (pos + 7) & ~7
    def bytePos: Int = pos >>> 3
  }

  // ---------------------------------------------------------------
  // CRCs (FLAC: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0,
  // both non-reflected — the published "123456789" check values
  // 0xF4 / 0xFEE8 pin these tables independently of any stream)
  // ---------------------------------------------------------------

  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------
  // Rice coding (residual method 0: 4-bit parameters)
  // ---------------------------------------------------------------

  private def riceWrite(bw: BitWriter, r: Int, k: Int): Unit = {
    val u = (r << 1) ^ (r >> 31) // zigzag fold
    bw.unary(u >>> k)
    if (k > 0) bw.u(u & ((1 << k) - 1), k)
  }

  private def riceRead(br: BitReader, k: Int): Int = {
    val q = br.unary()
    val u = (q << k) | (if (k > 0) br.u(k).toInt else 0)
    (u >>> 1) ^ -(u & 1) // unfold
  }

  /** Fixed-predictor residual → sample reconstruction (orders 0-4:
    * the binomial predictors from the spec).
    */
  private def fixedPredict(order: Int, s: Array[Int], i: Int): Int = order match {
    case 0 => 0
    case 1 => s(i - 1)
    case 2 => 2 * s(i - 1) - s(i - 2)
    case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
    case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
  }

  /** Rice-partitioned residual section shared by FIXED and LPC
    * subframes: reads residuals and reconstructs via `predict`.
    */
  private def readResidual(br: BitReader, blockSize: Int, order: Int,
      s: Array[Int], predict: (Array[Int], Int) => Int): Boolean = {
    if (br.u(2) != 0L) return false // method 1 (5-bit Rice) out of subset
    val po = br.u(4).toInt
    val nPart = 1 << po
    if (blockSize % nPart != 0 || (blockSize >> po) <= order) return false
    var part = 0
    var i = order
    while (part < nPart) {
      val k = br.u(4).toInt
      val cnt = (blockSize >> po) - (if (part == 0) order else 0)
      if (k == 15) {
        val raw = br.u(5).toInt
        var j = 0
        while (j < cnt) {
          val r = if (raw == 0) 0
            else ((br.u(raw) << (64 - raw)) >> (64 - raw)).toInt
          s(i) = predict(s, i) + r
          i += 1; j += 1
        }
      } else {
        var j = 0
        while (j < cnt) {
          s(i) = predict(s, i) + riceRead(br, k)
          i += 1; j += 1
        }
      }
      part += 1
    }
    true
  }

  /** One subframe → samples, for any sample width `bits` (the side
    * channel of a stereo decorrelation codes bits+1). Supported:
    * CONSTANT, VERBATIM, FIXED 0-4, LPC any order (precision/shift/
    * coefficient parse per spec, 64-bit accumulator, arithmetic
    * right-shift). None outside the subset or on reserved types.
    */
  private def readSubframe(br: BitReader, blockSize: Int,
      bits: Int): Option[Array[Int]] = {
    if (br.u(1) != 0L) return None
    val sfType = br.u(6).toInt
    if (br.u(1) != 0L) return None // wasted-bits out of subset
    def sN(v: Long): Int = ((v << (64 - bits)) >> (64 - bits)).toInt
    val s = new Array[Int](blockSize)
    sfType match {
      case 0 =>
        java.util.Arrays.fill(s, sN(br.u(bits)))
        Some(s)
      case 1 =>
        var i = 0
        while (i < blockSize) { s(i) = sN(br.u(bits)); i += 1 }
        Some(s)
      case t if t >= 8 && t <= 12 =>
        val order = t - 8
        var i = 0
        while (i < order) { s(i) = sN(br.u(bits)); i += 1 }
        if (readResidual(br, blockSize, order, s, fixedPredict(order, _, _)))
          Some(s)
        else None
      case t if t >= 32 =>
        val order = (t & 31) + 1
        var i = 0
        while (i < order) { s(i) = sN(br.u(bits)); i += 1 }
        val precision = br.u(4).toInt + 1
        if (precision == 16) return None // 0b1111 is invalid per spec
        val shift = ((br.u(5) << 59) >> 59).toInt // signed 5-bit
        if (shift < 0) return None
        val coefs = Array.fill(order)(
          ((br.u(precision) << (64 - precision)) >> (64 - precision)).toInt)
        def lpcPredict(v: Array[Int], idx: Int): Int = {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * v(idx - 1 - j); j += 1 }
          (acc >> shift).toInt
        }
        if (readResidual(br, blockSize, order, s, lpcPredict))
          Some(s)
        else None
      case _ => None // reserved types
    }
  }

  // ---------------------------------------------------------------
  // synthesis: 16-bit mono, blocksize 192 (frame-header code 0b0001)
  // ---------------------------------------------------------------

  private val BlockSize = 192

  /** Per-(stream, frame) synthesized samples — the closed form the
    * q158 oracle re-derives in SQL. Frame type cycles CONSTANT /
    * VERBATIM / FIXED(2) by (seed + f) % 3:
    *   0 CONSTANT: all samples c,  c = (seed·7 + f·13) % 201 − 100
    *   1 VERBATIM: s_i = (seed + f + i·11) % 400 − 200
    *   2 FIXED(2): warmup w0 = seed % 50 − 25, w1 = w0 + (f % 9) − 4,
    *     constant residual r = ±1 by (seed + f) % 2 →
    *     s_i = w0 + i·(w1−w0) + i(i−1)/2 · r  (second difference = r)
    */
  private[graft] def synthSamples(seed: Long, f: Int): Array[Int] = {
    val n = BlockSize
    ((seed + f) % 3).toInt match {
      case 0 =>
        val c = ((seed * 7 + f * 13) % 201).toInt - 100
        Array.fill(n)(c)
      case 1 =>
        Array.tabulate(n)(i => ((seed + f + i * 11L) % 400).toInt - 200)
      case _ =>
        val w0 = (seed % 50).toInt - 25
        val w1 = w0 + (f % 9) - 4
        val r = if ((seed + f) % 2 == 0) 1 else -1
        val s = new Array[Int](n)
        s(0) = w0; s(1) = w1
        var i = 2
        while (i < n) { s(i) = fixedPredict(2, s, i) + r; i += 1 }
        s
    }
  }

  /** A conformant 16-bit mono FLAC stream: fLaC marker, STREAMINFO
    * (with the real MD5 of the little-endian PCM), `nFrames` frames
    * of [[synthSamples]] — CONSTANT, VERBATIM and FIXED(2) subframes
    * with Rice partition orders 0 and 1, real CRC-8/CRC-16.
    */
  def synthesizeFlac(nFrames: Int, seed: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val total = nFrames.toLong * BlockSize
    val md5 = java.security.MessageDigest.getInstance("MD5")
    (0 until nFrames).foreach { f =>
      synthSamples(seed, f).foreach { s =>
        md5.update((s & 0xFF).toByte); md5.update(((s >> 8) & 0xFF).toByte)
      }
    }
    val si = new BitWriter
    si.u(BlockSize, 16); si.u(BlockSize, 16) // min/max blocksize
    si.u(0, 24); si.u(0, 24)                 // min/max framesize (unknown)
    si.u(8000, 20)                           // sample rate
    si.u(0, 3)                               // channels − 1 (mono)
    si.u(15, 5)                              // bits per sample − 1 (16)
    si.u(total, 36)
    val head = new BitWriter
    head.u(1, 1); head.u(0, 7); head.u(34, 24)
    out ++= head.result()
    out ++= si.result()
    out ++= md5.digest()

    (0 until nFrames).foreach { f =>
      val samples = synthSamples(seed, f)
      val bw = new BitWriter
      bw.u(0x3FFE, 14) // sync
      bw.u(0, 1)       // reserved
      bw.u(0, 1)       // fixed blocksize strategy
      bw.u(1, 4)       // blocksize code 1 → 192
      bw.u(0, 4)       // sample rate: from STREAMINFO
      bw.u(0, 4)       // channel assignment: mono
      bw.u(4, 3)       // sample size 0b100 → 16 bit
      bw.u(0, 1)       // reserved
      bw.u(f, 8)       // frame number, UTF-8 single byte (f < 128)
      bw.alignZero()
      val hdr = bw.bytes.toArray
      bw.u(crc8(hdr, 0, hdr.length), 8)
      // subframe
      ((seed + f) % 3).toInt match {
        case 0 =>
          bw.u(0, 1); bw.u(0, 6); bw.u(0, 1) // CONSTANT, no wasted bits
          bw.u(samples(0).toLong & 0xFFFF, 16)
        case 1 =>
          bw.u(0, 1); bw.u(1, 6); bw.u(0, 1) // VERBATIM
          samples.foreach(s => bw.u(s.toLong & 0xFFFF, 16))
        case _ =>
          val order = 2
          bw.u(0, 1); bw.u(8 + order, 6); bw.u(0, 1) // FIXED(2)
          bw.u(samples(0).toLong & 0xFFFF, 16)
          bw.u(samples(1).toLong & 0xFFFF, 16)
          // residual: method 0 (4-bit Rice), partition order 0 or 1
          val po = (f % 2)
          bw.u(0, 2); bw.u(po, 4)
          val k = 1
          val nPart = 1 << po
          var p = 0
          var idx = order
          while (p < nPart) {
            bw.u(k, 4)
            val cnt = (BlockSize >> po) - (if (p == 0) order else 0)
            var j = 0
            while (j < cnt) {
              riceWrite(bw, samples(idx) - fixedPredict(order, samples, idx), k)
              idx += 1; j += 1
            }
            p += 1
          }
      }
      bw.alignZero()
      val body = bw.bytes.toArray
      bw.u(crc16(body, 0, body.length), 16)
      out ++= bw.result()
    }
    out.toArray
  }

  /** Stereo planes for [[synthesizeFlacStereo]], frame type
    * (seed + f) % 3:
    *   0 independent: L = LPC(1) chain (coefficient 2, shift 1 —
    *     (2s)>>1 = s exactly, so the REAL shift arithmetic runs with
    *     a closed-form prefix-sum chain) over residuals
    *     r_j = (seed+f+j·7)%9 − 4 from warmup seed%40 − 20;
    *     R = CONSTANT (seed·11+f·5)%301 − 150.
    *   1 left/side: L_i = (seed+f+i·13)%500 − 250 (VERBATIM), side =
    *     CONSTANT (seed+f)%81 − 40 → R = L − side.
    *   2 mid/side: L = const (seed·3+f)%241 − 120, R = const
    *     (seed·5+f·7)%241 − 120 — the parity-bit mid/side coding
    *     reconstructs both exactly.
    */
  private[graft] def synthSamplesStereo(seed: Long, f: Int): (Array[Int], Array[Int]) = {
    val n = BlockSize
    ((seed + f) % 3).toInt match {
      case 0 =>
        val w = (seed % 40).toInt - 20
        val l = new Array[Int](n)
        l(0) = w
        var i = 1
        while (i < n) { l(i) = l(i - 1) + ((seed + f + i * 7L) % 9).toInt - 4; i += 1 }
        val r = ((seed * 11 + f * 5) % 301).toInt - 150
        (l, Array.fill(n)(r))
      case 1 =>
        val l = Array.tabulate(n)(i => ((seed + f + i * 13L) % 500).toInt - 250)
        val d = ((seed + f) % 81).toInt - 40
        (l, l.map(_ - d))
      case _ =>
        val a = ((seed * 3 + f) % 241).toInt - 120
        val b = ((seed * 5 + f * 7) % 241).toInt - 120
        (Array.fill(n)(a), Array.fill(n)(b))
    }
  }

  /** A 16-bit STEREO stream exercising the decode paths the mono
    * synthesizer cannot: LPC subframes (real precision/shift/
    * coefficient parse), independent-stereo, left/side and mid/side
    * channel decorrelation (side coded at 17 bits per spec).
    */
  def synthesizeFlacStereo(nFrames: Int, seed: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    val total = nFrames.toLong * BlockSize
    val md5 = java.security.MessageDigest.getInstance("MD5")
    (0 until nFrames).foreach { f =>
      val (l, r) = synthSamplesStereo(seed, f)
      var i = 0
      while (i < BlockSize) {
        md5.update((l(i) & 0xFF).toByte); md5.update(((l(i) >> 8) & 0xFF).toByte)
        md5.update((r(i) & 0xFF).toByte); md5.update(((r(i) >> 8) & 0xFF).toByte)
        i += 1
      }
    }
    val si = new BitWriter
    si.u(BlockSize, 16); si.u(BlockSize, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(8000, 20)
    si.u(1, 3)  // channels − 1 = 1
    si.u(15, 5) // 16-bit
    si.u(total, 36)
    val head = new BitWriter
    head.u(1, 1); head.u(0, 7); head.u(34, 24)
    out ++= head.result()
    out ++= si.result()
    out ++= md5.digest()

    def constant(bw: BitWriter, v: Int, bits: Int): Unit = {
      bw.u(0, 1); bw.u(0, 6); bw.u(0, 1)
      bw.u(v.toLong & ((1L << bits) - 1), bits)
    }
    def verbatim(bw: BitWriter, s: Array[Int], bits: Int): Unit = {
      bw.u(0, 1); bw.u(1, 6); bw.u(0, 1)
      s.foreach(v => bw.u(v.toLong & ((1L << bits) - 1), bits))
    }
    def lpc1(bw: BitWriter, s: Array[Int], bits: Int): Unit = {
      bw.u(0, 1); bw.u(32, 6); bw.u(0, 1) // LPC order 1
      bw.u(s(0).toLong & ((1L << bits) - 1), bits) // warmup
      bw.u(4, 4)  // precision − 1 = 4 → 5-bit coefficients
      bw.u(1, 5)  // shift 1
      bw.u(2, 5)  // coefficient 2: pred = (2·s[i−1]) >> 1 = s[i−1]
      bw.u(0, 2); bw.u(0, 4) // Rice method 0, partition order 0
      val k = 3
      bw.u(k, 4)
      var i = 1
      while (i < s.length) { riceWrite(bw, s(i) - s(i - 1), k); i += 1 }
    }

    (0 until nFrames).foreach { f =>
      val (l, r) = synthSamplesStereo(seed, f)
      val t = ((seed + f) % 3).toInt
      val bw = new BitWriter
      bw.u(0x3FFE, 14); bw.u(0, 1); bw.u(0, 1)
      bw.u(1, 4)  // blocksize 192
      bw.u(0, 4)  // rate from STREAMINFO
      bw.u(t match { case 0 => 1; case 1 => 8; case _ => 10 }, 4)
      bw.u(4, 3); bw.u(0, 1)
      bw.u(f, 8)
      bw.alignZero()
      val hdr = bw.bytes.toArray
      bw.u(crc8(hdr, 0, hdr.length), 8)
      t match {
        case 0 =>
          lpc1(bw, l, 16)
          constant(bw, r(0), 16)
        case 1 =>
          verbatim(bw, l, 16)
          constant(bw, l(0) - r(0), 17) // side, one extra bit
        case _ =>
          constant(bw, (l(0) + r(0)) >> 1, 16) // mid
          constant(bw, l(0) - r(0), 17)        // side
      }
      bw.alignZero()
      val body = bw.bytes.toArray
      bw.u(crc16(body, 0, body.length), 16)
      out ++= bw.result()
    }
    out.toArray
  }

  // ---------------------------------------------------------------
  // decode
  // ---------------------------------------------------------------

  final case class FlacPcm(
      nFrames: Int, totalSamples: Long, sampleRate: Int,
      sampleSum: Long, weightedSum: Long, md5Ok: Boolean)

  /** Full decode of the supported subset (16-bit mono; CONSTANT /
    * VERBATIM / FIXED 0-4 subframes; Rice method 0 with escape
    * partitions): verifies every frame's CRC-8 and CRC-16 and the
    * STREAMINFO MD5 against the decoded PCM. None on anything outside
    * the subset or any integrity failure. `collect`, when non-null,
    * receives (frameIdx, per-channel samples) after each frame's CRC
    * passes — the hook audio fingerprinting rides (the decodeInter
    * pattern).
    */
  def decodeFlac(p: Array[Byte],
      collect: (Int, Array[Array[Int]]) => Unit = null): Option[FlacPcm] = {
    try {
      if (p.length < 42 || new String(p, 0, 4, "US-ASCII") != "fLaC") return None
      var off = 4
      var sampleRate = 0
      var totalSamples = 0L
      var bps = 0
      var channels = 0
      var md5Expect: Array[Byte] = null
      var last = false
      // metadata blocks
      while (!last) {
        if (off + 4 > p.length) return None
        last = (p(off) & 0x80) != 0
        val btype = p(off) & 0x7F
        val len = ((p(off + 1) & 0xFF) << 16) | ((p(off + 2) & 0xFF) << 8) |
          (p(off + 3) & 0xFF)
        off += 4
        if (btype == 0) {
          if (len != 34 || off + 34 > p.length) return None
          val br = new BitReader(p, off)
          val minBs = br.u(16).toInt
          val maxBs = br.u(16).toInt
          if (minBs != maxBs) return None // fixed-blocksize subset
          br.u(24); br.u(24)
          sampleRate = br.u(20).toInt
          channels = br.u(3).toInt + 1
          bps = br.u(5).toInt + 1
          totalSamples = br.u(36)
          md5Expect = java.util.Arrays.copyOfRange(p, off + 18, off + 34)
        }
        off += len
      }
      if (channels < 1 || channels > 2 || bps != 16) return None // subset
      val md5 = java.security.MessageDigest.getInstance("MD5")
      var nFrames = 0
      var decoded = 0L
      var sampleSum = 0L
      var weighted = 0L
      while (off < p.length) {
        val frameStart = off
        val br = new BitReader(p, off)
        if (br.u(14) != 0x3FFE) return None
        br.u(1)
        if (br.u(1) != 0) return None // variable blocksize out of subset
        val bsCode = br.u(4).toInt
        val srCode = br.u(4).toInt
        val chan = br.u(4).toInt
        val ssCode = br.u(3).toInt
        br.u(1)
        if (ssCode != 4) return None // 16-bit subset
        // channel assignment: 0..7 independent (must equal channels−1),
        // 8 left/side, 9 right/side, 10 mid/side (stereo only)
        if (channels == 1 && chan != 0) return None
        if (channels == 2 && chan != 1 && (chan < 8 || chan > 10)) return None
        val frameNo = br.u(8).toInt
        if ((frameNo & 0x80) != 0) return None // multi-byte numbers out of subset
        val blockSize = bsCode match {
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => br.u(8).toInt + 1
          case 7 => br.u(16).toInt + 1
          case c if c >= 8 => 256 << (c - 8)
          case _ => return None
        }
        if (srCode != 0) return None // subset: rate from STREAMINFO
        br.alignToByte()
        val hdrCrc = br.u(8).toInt
        if (hdrCrc != crc8(p, frameStart, frameStart + (br.bytePos - frameStart) - 1))
          return None
        // subframes (one per channel; a stereo decorrelation's side
        // channel codes one extra bit), then inter-channel
        // reconstruction per the assignment
        val chans: Array[Array[Int]] =
          if (channels == 1)
            Array(readSubframe(br, blockSize, 16).getOrElse(return None))
          else {
            val bits0 = if (chan == 9) 17 else 16
            val bits1 = if (chan == 8 || chan == 10) 17 else 16
            val c0 = readSubframe(br, blockSize, bits0).getOrElse(return None)
            val c1 = readSubframe(br, blockSize, bits1).getOrElse(return None)
            chan match {
              case 1 => Array(c0, c1) // independent L, R
              case 8 => // left/side: R = L − side
                Array(c0, Array.tabulate(blockSize)(i => c0(i) - c1(i)))
              case 9 => // right/side: L = R + side
                Array(Array.tabulate(blockSize)(i => c1(i) + c0(i)), c1)
              case _ => // mid/side (spec reconstruction: mid recovers
                // its dropped low bit from the side's parity)
                val l = new Array[Int](blockSize)
                val rr = new Array[Int](blockSize)
                var i = 0
                while (i < blockSize) {
                  val side = c1(i)
                  val m2 = (c0(i) << 1) | (side & 1)
                  l(i) = (m2 + side) >> 1
                  rr(i) = (m2 - side) >> 1
                  i += 1
                }
                Array(l, rr)
            }
          }
        br.alignToByte()
        val crcPos = br.bytePos
        val fCrc = br.u(16).toInt
        if (fCrc != crc16(p, frameStart, crcPos)) return None
        var fSum = 0L
        var i = 0
        while (i < blockSize) {
          var c = 0
          while (c < channels) {
            val v = chans(c)(i)
            md5.update((v & 0xFF).toByte); md5.update(((v >> 8) & 0xFF).toByte)
            fSum += v
            c += 1
          }
          i += 1
        }
        if (collect != null) collect(nFrames, chans)
        nFrames += 1
        decoded += blockSize
        sampleSum += fSum
        weighted += nFrames.toLong * fSum
        off = br.bytePos
      }
      if (decoded != totalSamples) return None
      val md5Ok = java.util.Arrays.equals(md5.digest(), md5Expect)
      Some(FlacPcm(nFrames, decoded, sampleRate, sampleSum, weighted, md5Ok))
    } catch { case _: IllegalStateException | _: ArrayIndexOutOfBoundsException => None }
  }

  /** Per-frame 64-bit temporal fingerprints of a FLAC stream: decode
    * through [[decodeFlac]]'s collect hook, FNV-1a each frame's PCM
    * (all channels, 16-bit masked) with the frame's temporal index
    * folded into the hash basis — the audio twin of
    * `Multimodal.mp4FrameFingerprints`, and the unit audio clip-level
    * dedup joins on (an inverted index over frames: candidate pairs
    * only where decoded content repeats at the same position).
    */
  def flacFrameFingerprints(p: Array[Byte]): Option[Array[Long]] = {
    val out = new ArrayBuffer[Long]()
    decodeFlac(p, (f, chans) => {
      var h = 0xcbf29ce484222325L ^ (f * 0x9E3779B97F4A7C15L)
      chans.foreach { ch =>
        var i = 0
        while (i < ch.length) {
          h ^= (ch(i) & 0xFFFFL)
          h *= 0x100000001b3L
          i += 1
        }
      }
      out += h
    }).map(_ => out.toArray)
  }
}
