package graft.operators

import scala.collection.mutable.ArrayBuffer

/** H.264/AVC Annex-B bitstream METADATA layer: NAL unit scanning
  * (3- and 4-byte start codes), emulation-prevention de-escaping,
  * and Exp-Golomb SPS parsing to (profile, level, width, height) —
  * the `ffprobe`-shaped surface over the one codec family whose
  * PIXEL decode stays out of scope (entropy-coded macroblock
  * reconstruction; every other media family in
  * [[Multimodal]] decodes end-to-end). Demux→bitstream→parameter
  * sets is real: stream geometry comes out of the same ue(v)/crop
  * arithmetic a conformant decoder runs, and the gate breaks if the
  * start-code scanner, the 00 00 03 unescape, or any Exp-Golomb
  * field slips by one bit.
  *
  * The write side ([[synthesizeH264Stream]]) emits conformant
  * SPS/PPS/slice NALs with REAL emulation prevention (payloads
  * contain 00 00 0x patterns that must be escaped or the NAL scan
  * would split them) — the parser is only honest because the writer
  * makes the hazards real. Reference anchor: the loader moves opaque
  * media bytes exactly like rows (AbstractClickhouseLoaderMapper
  * .java:159-248 readRowRecord); metadata extraction is the
  * engine-side extension.
  */
object H264 {

  // ---------------------------------------------------------------
  // bit I/O
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val bytes = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0

    def u(v: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((v >>> b) & 1)
        nBits += 1
        if (nBits == 8) { bytes += cur.toByte; cur = 0; nBits = 0 }
        b -= 1
      }
    }

    /** Exp-Golomb unsigned: ⌊log2(x+1)⌋ zeros then binary(x+1). */
    def ue(x: Int): Unit = {
      val v = x + 1
      val len = 32 - Integer.numberOfLeadingZeros(v)
      u(0, len - 1)
      u(v, len)
    }

    def se(x: Int): Unit = ue(if (x <= 0) -2 * x else 2 * x - 1)

    /** pcm_alignment_zero_bit(s): pad to a byte boundary. */
    def alignZero(): Unit = while (nBits != 0) u(0, 1)

    /** rbsp_stop_one_bit + zero padding to a byte boundary. */
    def stop(): Array[Byte] = {
      u(1, 1)
      if (nBits > 0) u(0, 8 - nBits)
      bytes.toArray
    }
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0

    def u(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        val byteIdx = pos >>> 3
        if (byteIdx >= bytes.length) throw new IllegalStateException("EOS")
        val bit = (bytes(byteIdx) >>> (7 - (pos & 7))) & 1
        v = (v << 1) | bit
        pos += 1
        i += 1
      }
      v
    }

    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 31) throw new IllegalStateException("bad ue")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }

    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }

    /** Skip pcm_alignment_zero_bit(s) to the next byte boundary. */
    def alignToByte(): Unit = pos = (pos + 7) & ~7
  }

  // ---------------------------------------------------------------
  // emulation prevention (00 00 00/01/02/03 → 00 00 03 0x)
  // ---------------------------------------------------------------

  private def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  private def unescape(nal: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](until - from)
    var zeros = 0
    var i = from
    while (i < until) {
      val b = nal(i)
      if (b == 3 && zeros >= 2) zeros = 0 // emulation-prevention byte: drop
      else {
        out += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toArray
  }

  // ---------------------------------------------------------------
  // write side
  // ---------------------------------------------------------------

  /** Baseline-profile SPS for an even (w, h) with 4:2:0 cropping. */
  private def spsRbsp(w: Int, h: Int, levelIdc: Int): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "even dimensions (4:2:0 crop units)")
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val bw = new BitWriter
    bw.u(66, 8)            // profile_idc: baseline
    bw.u(0, 8)             // constraint flags + reserved
    bw.u(levelIdc, 8)
    bw.ue(0)               // seq_parameter_set_id
    bw.ue(0)               // log2_max_frame_num_minus4
    bw.ue(2)               // pic_order_cnt_type
    bw.ue(1)               // max_num_ref_frames
    bw.u(0, 1)             // gaps_in_frame_num_value_allowed_flag
    bw.ue(mbW - 1)         // pic_width_in_mbs_minus1
    bw.ue(mbH - 1)         // pic_height_in_map_units_minus1
    bw.u(1, 1)             // frame_mbs_only_flag
    bw.u(0, 1)             // direct_8x8_inference_flag
    val cropR = (mbW * 16 - w) / 2
    val cropB = (mbH * 16 - h) / 2
    if (cropR > 0 || cropB > 0) {
      bw.u(1, 1)           // frame_cropping_flag
      bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB)
    } else bw.u(0, 1)
    bw.u(0, 1)             // vui_parameters_present_flag
    bw.stop()
  }

  private def ppsRbsp(): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0)               // pic_parameter_set_id
    bw.ue(0)               // seq_parameter_set_id
    bw.u(0, 1)             // entropy_coding_mode_flag (CAVLC)
    bw.u(0, 1)             // bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)               // num_slice_groups_minus1
    bw.ue(0); bw.ue(0)     // num_ref_idx_l{0,1}_active_minus1
    bw.u(0, 1)             // weighted_pred_flag
    bw.u(0, 2)             // weighted_bipred_idc
    bw.se(0); bw.se(0)     // pic_init_qp/qs_minus26
    bw.se(0)               // chroma_qp_index_offset
    bw.u(1, 1)             // deblocking_filter_control_present_flag
    bw.u(0, 1)             // constrained_intra_pred_flag
    bw.u(0, 1)             // redundant_pic_cnt_present_flag
    bw.stop()
  }

  /** Annex-B stream: 4-byte start code before SPS, 3-byte before the
    * rest (both scanner paths are live). Slice f carries
    * `1 + (seed + f) % 19` payload bytes: byte j is ZERO when
    * `(seed + f + j) % 5 < 3` (adjacent zero RUNS — emulation
    * prevention genuinely fires) and `(seed*7 + f*3 + j) % 256`
    * otherwise. First slice is IDR (type 5).
    */
  def synthesizeH264Stream(w: Int, h: Int, levelIdc: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    def start4(): Unit = out ++= Array[Byte](0, 0, 0, 1)
    def start3(): Unit = out ++= Array[Byte](0, 0, 1)
    start4()
    out += 0x67.toByte // nal_ref_idc=3, type=7 (SPS)
    out ++= escape(spsRbsp(w, h, levelIdc))
    start3()
    out += 0x68.toByte // type=8 (PPS)
    out ++= escape(ppsRbsp())
    (0 until nFrames).foreach { f =>
      start3()
      out += (if (f == 0) 0x65 else 0x41).toByte // IDR / non-IDR slice
      val sz = 1 + ((seed + f) % 19).toInt
      val payload = Array.tabulate(sz) { j =>
        if ((seed + f + j) % 5 < 3) 0.toByte
        else ((seed * 7 + f * 3 + j) % 256).toByte
      }
      // rbsp-trailing-bits-style terminator: keeps the NAL's last byte
      // nonzero so the start-code scan has no trailing-zero ambiguity
      out ++= escape(payload :+ 0x80.toByte)
    }
    out.toArray
  }

  // ---------------------------------------------------------------
  // parse side
  // ---------------------------------------------------------------

  final case class StreamMeta(
      profileIdc: Int, levelIdc: Int, width: Int, height: Int,
      nNals: Int, nIdr: Int, nSlices: Int, sliceChecksum: Long)

  /** Scan NAL units between start codes (00 00 01 with any number of
    * leading zeros), de-escape each, parse the SPS, and checksum the
    * slice payloads weighted by slice index — None on any structural
    * violation (no SPS, bad Exp-Golomb, truncation).
    */
  /** Start-code scan → (nalStart, nalEnd) pairs; header byte at
    * nalStart. Handles any number of leading zeros before 01.
    */
  private def scanNals(p: Array[Byte]): ArrayBuffer[(Int, Int)] = {
    val nals = new ArrayBuffer[(Int, Int)]()
    var i = 0
    var cur = -1
    var zeros = 0
    while (i < p.length) {
      if (p(i) == 0) { zeros += 1 }
      else if (p(i) == 1 && zeros >= 2) {
        if (cur >= 0) nals += ((cur, i - math.min(zeros, 3)))
        cur = i + 1
        zeros = 0
      } else zeros = 0
      i += 1
    }
    if (cur >= 0) nals += ((cur, p.length))
    nals
  }

  private final case class SpsInfo(profile: Int, level: Int,
      width: Int, height: Int, mbW: Int, mbH: Int)

  /** SPS RBSP parse; None for shapes out of scope (scaling matrices,
    * POC type 1).
    */
  private def parseSps(r: BitReader): Option[SpsInfo] = {
    val profile = r.u(8)
    r.u(8) // constraint flags
    val level = r.u(8)
    r.ue() // sps id
    if (profile == 100 || profile == 110 || profile == 122 ||
      profile == 244 || profile == 44 || profile == 83 ||
      profile == 86 || profile == 118 || profile == 128) {
      val chroma = r.ue()
      if (chroma == 3) r.u(1)
      r.ue(); r.ue() // bit depths
      r.u(1) // qpprime
      if (r.u(1) == 1) return None // scaling matrices unsupported
    }
    r.ue() // log2_max_frame_num_minus4
    val poc = r.ue()
    if (poc == 0) r.ue()
    else if (poc == 1) return None // delta POC lists unsupported
    r.ue() // max_num_ref_frames
    r.u(1)
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1)
    r.u(1) // direct_8x8
    var w = mbW * 16
    var h = mbH * 16 * (2 - frameMbsOnly)
    if (r.u(1) == 1) { // cropping
      val l = r.ue(); val rr = r.ue(); val t = r.ue(); val b = r.ue()
      w -= 2 * (l + rr)
      h -= 2 * (t + b) * (2 - frameMbsOnly)
    }
    Some(SpsInfo(profile, level, w, h, mbW, mbH))
  }

  def parseStream(p: Array[Byte]): Option[StreamMeta] = {
    try {
      val nals = scanNals(p)
      if (nals.isEmpty) return None
      var sps: Option[SpsInfo] = None
      var nIdr = 0
      var nSlices = 0
      var sliceIdx = 0
      var checksum = 0L
      nals.foreach { case (s, e) =>
        val nalType = p(s) & 0x1F
        nalType match {
          case 7 =>
            sps = parseSps(new BitReader(unescape(p, s + 1, e)))
            if (sps.isEmpty) return None
          case 5 | 1 =>
            if (nalType == 5) nIdr += 1
            nSlices += 1
            sliceIdx += 1
            val payload = unescape(p, s + 1, e)
            if (payload.isEmpty || payload.last != 0x80.toByte) return None
            var acc = 0L
            payload.dropRight(1).foreach(b => acc += (b & 0xFF))
            checksum += sliceIdx * acc
          case _ => ()
        }
      }
      sps.map { i =>
        StreamMeta(i.profile, i.level, i.width, i.height,
          nals.length, nIdr, nSlices, checksum)
      }
    } catch { case _: IllegalStateException => None }
  }

  // ---------------------------------------------------------------
  // I_PCM pixel path
  // ---------------------------------------------------------------

  /** Conformant IDR I-slices made entirely of I_PCM macroblocks —
    * the H.264 macroblock type that carries RAW 4:2:0 samples
    * (mb_type 25 in I slices, pcm_alignment_zero_bit, 256 luma +
    * 2×64 chroma bytes). Any conformant decoder must reconstruct
    * these bit-exactly, which makes them the honest first rung of
    * H.26x PIXEL decode: real slice headers, real byte-alignment
    * rules, real emulation prevention over the sample bytes — only
    * entropy-coded residual decode (CAVLC/CABAC) remains beyond.
    * Luma(px,py) of frame f = (seed + f + px + 2·py) % 251; chroma
    * Cb = (seed + f + 2·cx + cy) % 251, Cr = (3·seed + f + cx + 2·cy)
    * % 251 on the half-res grid — zero runs occur, so escaping fires.
    */
  def synthesizeH264IPcm(mbW: Int, mbH: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= Array[Byte](0, 0, 0, 1)
    out += 0x67.toByte
    out ++= escape(spsRbsp(mbW * 16, mbH * 16, 30))
    out ++= Array[Byte](0, 0, 1)
    out += 0x68.toByte
    out ++= escape(ppsRbsp())
    (0 until nFrames).foreach { f =>
      out ++= Array[Byte](0, 0, 1)
      out += 0x65.toByte // IDR slice
      val bw = new BitWriter
      bw.ue(0)        // first_mb_in_slice
      bw.ue(7)        // slice_type: I (all slices in pic)
      bw.ue(0)        // pic_parameter_set_id
      bw.u(0, 4)      // frame_num (log2_max_frame_num = 4)
      bw.ue(f)        // idr_pic_id
      bw.u(0, 1); bw.u(0, 1) // dec_ref_pic_marking (IDR): no_output, no long-term
      bw.se(0)        // slice_qp_delta
      bw.ue(1)        // disable_deblocking_filter_idc = 1 (off; no offsets)
      var my = 0
      while (my < mbH) {
        var mx = 0
        while (mx < mbW) {
          bw.ue(25)   // mb_type: I_PCM
          bw.alignZero()
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val px = mx * 16 + x; val py = my * 16 + y
              bw.u(((seed + f + px + 2 * py) % 251).toInt, 8)
              x += 1
            }
            y += 1
          }
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              val cpx = mx * 8 + cx; val cpy = my * 8 + cy
              bw.u(((seed + f + 2 * cpx + cpy) % 251).toInt, 8)
              cx += 1
            }
            cy += 1
          }
          cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              val cpx = mx * 8 + cx; val cpy = my * 8 + cy
              bw.u(((3 * seed + f + cpx + 2 * cpy) % 251).toInt, 8)
              cx += 1
            }
            cy += 1
          }
          mx += 1
        }
        my += 1
      }
      out ++= escape(bw.stop())
    }
    out.toArray
  }

  final case class PcmFrames(
      nFrames: Int, width: Int, height: Int,
      lumaSum: Long, chromaSum: Long, weightedSum: Long)

  /** Pixel decode of an all-I_PCM stream: parse each IDR slice
    * header, then per macroblock require mb_type 25, byte-align,
    * and read every raw 4:2:0 sample value. Returns per-plane sums
    * + the frame-index-weighted total (a full frame buffer would be
    * the same reads at the mb-offset addresses); None on any
    * non-I_PCM macroblock or structural violation.
    */
  def decodeIPcm(p: Array[Byte]): Option[PcmFrames] = {
    try {
      val nals = scanNals(p)
      var sps: Option[SpsInfo] = None
      var nFrames = 0
      var lumaSum = 0L
      var chromaSum = 0L
      var weighted = 0L
      nals.foreach { case (s, e) =>
        val nalType = p(s) & 0x1F
        nalType match {
          case 7 =>
            sps = parseSps(new BitReader(unescape(p, s + 1, e)))
            if (sps.isEmpty) return None
          case 5 =>
            val info = sps.getOrElse(return None)
            val r = new BitReader(unescape(p, s + 1, e))
            r.ue()                       // first_mb_in_slice
            val sliceType = r.ue()
            if (sliceType % 5 != 2) return None // not an I slice
            r.ue()                       // pps id
            r.u(4)                       // frame_num
            r.ue()                       // idr_pic_id
            r.u(1); r.u(1)               // dec_ref_pic_marking
            r.se()                       // slice_qp_delta
            if (r.ue() != 1) { r.se(); r.se() } // deblocking offsets
            var fl = 0L
            var fc = 0L
            var mb = 0
            val nMbs = info.mbW * info.mbH
            while (mb < nMbs) {
              if (r.ue() != 25) return None // only I_PCM in scope
              r.alignToByte()
              var i = 0
              while (i < 256) { fl += r.u(8); i += 1 }
              i = 0
              while (i < 128) { fc += r.u(8); i += 1 }
              mb += 1
            }
            nFrames += 1
            lumaSum += fl
            chromaSum += fc
            weighted += nFrames.toLong * (fl + fc)
          case _ => ()
        }
      }
      sps.map(i => PcmFrames(nFrames, i.width, i.height, lumaSum, chromaSum, weighted))
    } catch { case _: IllegalStateException => None }
  }
}
