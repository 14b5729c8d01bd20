package graft

import graft.operators.H264
import org.scalatest.funsuite.AnyFunSuite

/** H.264 Annex-B metadata layer (q141): SPS geometry inversion,
  * emulation prevention, start-code scanning, failure modes.
  * Pure-JVM kernels — no SparkSession needed.
  */
class H264Spec extends AnyFunSuite {

  test("SPS geometry inverts across mb-aligned and cropped sizes") {
    for {
      w <- Seq(16, 20, 32, 34, 128, 1920)
      h <- Seq(16, 18, 64, 90, 1080)
    } {
      val m = H264.parseStream(H264.synthesizeH264Stream(w, h, 31, 1, 5L)).get
      assert(m.width == w && m.height == h, s"got ${m.width}x${m.height} want ${w}x$h")
      assert(m.profileIdc == 66 && m.levelIdc == 31)
    }
  }

  test("NAL census: SPS + PPS + one IDR + non-IDR slices") {
    val m = H264.parseStream(H264.synthesizeH264Stream(64, 48, 30, 4, 9L)).get
    assert(m.nNals == 6)
    assert(m.nIdr == 1)
    assert(m.nSlices == 4)
  }

  test("slice checksum matches the closed form (emulation prevention round-trips)") {
    for (seed <- 0L until 40L) {
      val nf = 1 + (seed % 5).toInt
      val m = H264.parseStream(H264.synthesizeH264Stream(32, 32, 30, nf, seed)).get
      var want = 0L
      for (f <- 0 until nf) {
        val sz = 1 + ((seed + f) % 19).toInt
        var acc = 0L
        for (j <- 0 until sz)
          acc += (if ((seed + f + j) % 5 < 3) 0L else (seed * 7 + f * 3 + j) % 256)
        want += (f + 1) * acc
      }
      assert(m.sliceChecksum == want, s"seed=$seed")
    }
  }

  test("escaping is actually present in the wire bytes (00 00 03 sequences)") {
    // zero runs in the payload force emulation-prevention bytes; a
    // stream synthesized over enough seeds must contain 00 00 03
    val hasEp = (0L until 20L).exists { seed =>
      val p = H264.synthesizeH264Stream(32, 32, 30, 5, seed)
      p.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3)
    }
    assert(hasEp, "no emulation-prevention byte ever emitted — zero runs missing")
  }

  test("no false start codes inside NAL payloads") {
    // if escaping failed, a payload 00 00 01 would split a slice and
    // change the census; sweep seeds and re-derive the census
    for (seed <- 0L until 30L) {
      val nf = 1 + (seed % 5).toInt
      val m = H264.parseStream(H264.synthesizeH264Stream(48, 32, 30, nf, seed)).get
      assert(m.nNals == 2 + nf, s"seed=$seed census ${m.nNals} != ${2 + nf}")
    }
  }

  test("I_PCM pixel decode inverts the closed-form planes") {
    for (seed <- 0L until 12L) {
      val mbW = 1 + (seed % 3).toInt
      val mbH = 1 + ((seed * 3) % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeIPcm(H264.synthesizeH264IPcm(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      assert(m.width == mbW * 16 && m.height == mbH * 16)
      var wantL = 0L; var wantC = 0L; var wantW = 0L
      for (f <- 0 until nf) {
        var fl = 0L; var fc = 0L
        for (py <- 0 until mbH * 16; px <- 0 until mbW * 16)
          fl += (seed + f + px + 2 * py) % 251
        for (cy <- 0 until mbH * 8; cx <- 0 until mbW * 8)
          fc += (seed + f + 2 * cx + cy) % 251 + (3 * seed + f + cx + 2 * cy) % 251
        wantL += fl; wantC += fc; wantW += (f + 1) * (fl + fc)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma")
      assert(m.chromaSum == wantC, s"seed=$seed chroma")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
    }
  }

  test("I_PCM decode rejects streams whose slices are not raw macroblocks") {
    // a q141-style stream has IDR slices with arbitrary payloads —
    // the strict slice-header + mb_type walk must refuse, not misread
    val p = H264.synthesizeH264Stream(32, 32, 30, 2, 7L)
    assert(H264.decodeIPcm(p).isEmpty)
  }

  test("CAVLC block coder reproduces the published worked example bit-exactly") {
    // the canonical 4x4 CAVLC example (coeffs in zigzag order
    // 0,3,0,1,-1,-1,0,1,0...): TotalCoeffs=5, TrailingOnes=3,
    // total_zeros=3 → 000010001110010111101101. Independent of our
    // tables' provenance: if any used row were wrong, this breaks.
    val scan = Array(0, 3, 0, 1, -1, -1, 0, 1) ++ Array.fill(8)(0)
    val bits = H264.encodeBlockBits(scan)
    assert(bits == "000010001110010111101101", s"got $bits")
    assert(H264.decodeBlockBits(bits).get.sameElements(scan))
  }

  test("CAVLC block coder round-trips random sparse blocks") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 500) {
      val tc = 1 + rnd.nextInt(5)
      val positions = rnd.shuffle((0 until 16).toList).take(tc).sorted
      val scan = Array.fill(16)(0)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(15) - 7
        scan(p) = v
      }
      val bits = H264.encodeBlockBits(scan)
      val back = H264.decodeBlockBits(bits)
      assert(back.isDefined && back.get.sameElements(scan),
        s"coeffs ${scan.mkString(",")} bits $bits got ${back.map(_.mkString(","))}")
    }
  }

  test("CAVLC VLC tables are prefix-free") {
    for (name <- Seq("coeff_token", "total_zeros", "chroma_total_zeros",
           "run_before");
         table <- H264.tableForSpec(name)) {
      for (a <- table; b <- table if a != b)
        assert(!b.startsWith(a), s"$name: '$a' prefixes '$b'")
    }
  }

  test("dequant + inverse transform matches an independent simulation") {
    // separately-written spec-text implementation: explicit zigzag
    // placement, V-table scaling, two explicit 1-D passes with
    // intermediate arrays (vs the decoder's in-place strided core)
    val zig = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
    val vt = Array(Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
      Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
    def sim(scan: Array[Int], qp: Int): Array[Int] = {
      val d = Array.ofDim[Int](4, 4)
      for (s <- 0 until 16) {
        val r = zig(s); val i = r / 4; val j = r % 4
        val cls = if (i % 2 == 0 && j % 2 == 0) 0
                  else if (i % 2 == 1 && j % 2 == 1) 1 else 2
        val ls = scan(s) * vt(qp % 6)(cls) * 16
        d(i)(j) = if (qp >= 24) ls << (qp / 6 - 4)
                  else (ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
      }
      val e = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4) {
        val (a, b, c, dd) = (d(i)(0), d(i)(1), d(i)(2), d(i)(3))
        e(i)(0) = (a + c) + (b + (dd >> 1)); e(i)(1) = (a - c) + ((b >> 1) - dd)
        e(i)(2) = (a - c) - ((b >> 1) - dd); e(i)(3) = (a + c) - (b + (dd >> 1))
      }
      val f = Array.ofDim[Int](4, 4)
      for (j <- 0 until 4) {
        val (a, b, c, dd) = (e(0)(j), e(1)(j), e(2)(j), e(3)(j))
        f(0)(j) = (a + c) + (b + (dd >> 1)); f(1)(j) = (a - c) + ((b >> 1) - dd)
        f(2)(j) = (a - c) - ((b >> 1) - dd); f(3)(j) = (a + c) - (b + (dd >> 1))
      }
      (for (i <- 0 until 4; j <- 0 until 4) yield (f(i)(j) + 32) >> 6).toArray
    }
    val rnd = new scala.util.Random(77)
    for (qp <- Seq(18, 22, 24, 28, 35); _ <- 0 until 50) {
      val scan = Array.fill(16)(if (rnd.nextInt(3) == 0) rnd.nextInt(13) - 6 else 0)
      assert(H264.dequantIdctForSpec(scan, qp).sameElements(sim(scan, qp)),
        s"qp=$qp scan=${scan.mkString(",")}")
    }
  }

  test("CAVLC stream decode equals the flat-block chain simulation") {
    for (seed <- 0L until 20L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeCavlcIntra(H264.synthesizeH264Cavlc(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == 16 && m.height == mbH * 16)
      val rOf = Array(-5, -2, 3, 5) // dequantized flat residual per level idx
      var wantL = 0L; var wantW = 0L; var wantN = 0L
      val wantC = 128L * 2 * 8 * (8 * mbH) // chroma stays DC-flat 128
      for (f <- 0 until nf) {
        val v = Array.ofDim[Long](4, 4 * mbH)
        var fl = 0L
        for (by <- 0 until 4 * mbH; bx <- 0 until 4) {
          val r = rOf(((seed + f * 11 + bx * 7 + by * 5) % 4).toInt)
          val parent =
            if (bx == 0 && by == 0) 128L
            else if (bx == 0) v(0)(by - 1)
            else v(bx - 1)(by)
          v(bx)(by) = math.max(0L, math.min(255L, parent + r))
          fl += 16 * v(bx)(by)
          wantN += 1
        }
        wantL += fl
        wantW += (f + 1) * (fl + wantC)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma ${m.lumaSum} != $wantL")
      assert(m.chromaSum == wantC * nf, s"seed=$seed chroma")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
      assert(m.nLevels == wantN, s"seed=$seed levels")
    }
  }

  test("AC vectors are column-constant with the pinned IDCT values") {
    // raster-row-0 coefficients → the column transform replicates row
    // 0 down every column; these exact values are hard-coded in the
    // q150 oracle, so a drift here is an oracle break, not just noise
    val want = Seq(
      Seq(5, 5, 5, 5), Seq(1, -1, -4, -6), Seq(0, 5, 5, 0), Seq(2, 5, -5, -2))
    for (k <- 0 until 4) {
      val r = H264.dequantIdctForSpec(H264.acVectorForSpec(k), 24)
      for (y <- 1 until 4; x <- 0 until 4)
        assert(r(y * 4 + x) == r(x), s"k=$k not column-constant")
      assert(r.take(4).toSeq == want(k),
        s"k=$k cols ${r.take(4).mkString(",")} != pinned ${want(k).mkString(",")}")
    }
  }

  test("CAVLC block coder round-trips in the 2<=nC<4 context") {
    val rnd = new scala.util.Random(991)
    for (_ <- 0 until 300) {
      val tc = rnd.nextInt(6) // 0..5 (TC=0 valid here: coeff_token (0,0))
      val positions = rnd.shuffle((0 until 16).toList).take(tc).sorted
      val scan = Array.fill(16)(0)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(15) - 7
        scan(p) = v
      }
      for (nC <- Seq(2, 3)) {
        val bits = H264.encodeBlockBits(scan, nC)
        val back = H264.decodeBlockBits(bits, nC)
        assert(back.isDefined && back.get.sameElements(scan),
          s"nC=$nC coeffs ${scan.mkString(",")} bits $bits")
      }
    }
  }

  test("AC CAVLC stream decode equals the per-column chain simulation") {
    val c = Array(Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    for (seed <- 0L until 20L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeCavlcIntra(H264.synthesizeH264CavlcAc(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == 16 && m.height == mbH * 16)
      def kOf(f: Int, bx: Int, by: Int): Int =
        ((seed + f * 11 + bx * 7 + by * 5) % 4).toInt
      var wantL = 0L; var wantW = 0L; var wantN = 0L
      val wantC = 128L * 2 * 8 * (8 * mbH)
      for (f <- 0 until nf) {
        // per-column scalar chains: top row chains DC left-to-right on
        // the right column value; below, VERTICAL adds per-column c
        val v = Array.ofDim[Long](4, 4 * mbH, 4) // (bx, by, col)
        var fl = 0L
        for (by <- 0 until 4 * mbH; bx <- 0 until 4) {
          val k = kOf(f, bx, by)
          for (x <- 0 until 4) {
            val base =
              if (by == 0 && bx == 0) 128L
              else if (by == 0) v(bx - 1)(0)(3) // DC = left's right column
              else v(bx)(by - 1)(x)             // VERTICAL per column
            v(bx)(by)(x) = base + c(k)(x)
            fl += 4 * v(bx)(by)(x) // 4 rows per column
          }
          wantN += (if (k == 0) 1 else 2)
        }
        wantL += fl
        wantW += (f + 1) * (fl + wantC)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma ${m.lumaSum} != $wantL")
      assert(m.chromaSum == wantC * nf, s"seed=$seed chroma")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
      assert(m.nLevels == wantN, s"seed=$seed levels ${m.nLevels} != $wantN")
    }
  }

  test("chroma DC 2x2 blocks round-trip through the nC == -1 tables") {
    val rnd = new scala.util.Random(771)
    // the four synthesized vectors first — the exact in-stream shapes
    for (k <- 0 until 4) {
      val c = H264.chromaDcVectorForSpec(k)
      val bits = H264.encodeChromaBits(c)
      val back = H264.decodeChromaBits(bits)
      assert(back.isDefined && back.get.sameElements(c),
        s"k=$k bits $bits got ${back.map(_.mkString(","))}")
    }
    for (_ <- 0 until 300) {
      val tc = rnd.nextInt(5) // 0..4
      val positions = rnd.shuffle((0 until 4).toList).take(tc).sorted
      val c = Array.fill(4)(0)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(15) - 7
        c(p) = v
      }
      val bits = H264.encodeChromaBits(c)
      val back = H264.decodeChromaBits(bits)
      assert(back.isDefined && back.get.sameElements(c),
        s"coeffs ${c.mkString(",")} bits $bits got ${back.map(_.mkString(","))}")
    }
  }

  test("chroma quadrant residuals are pinned against Hadamard + dequant") {
    // these exact quadruples are hard-coded in the q156 oracle; a
    // drift here is an oracle break. Also pins the dequant rule
    // dcC = (f · V(qpc%6) << (qpc/6)) >> 1 at qp 24 (qpc = qp).
    assert(H264.chromaQp(24) == 24)
    for (k <- 0 until 4) {
      val got = H264.chromaDcDequantForSpec(H264.chromaDcVectorForSpec(k), 24)
        .map(dc => (dc + 32) >> 6)
      assert(got.sameElements(H264.chromaQuadResiduals(k)),
        s"k=$k got ${got.mkString(",")} != pinned " +
          s"${H264.chromaQuadResiduals(k).mkString(",")}")
    }
    // chroma QP table spot checks (Table 8-15 shape)
    assert(H264.chromaQp(29) == 29 && H264.chromaQp(30) == 29 &&
      H264.chromaQp(39) == 35 && H264.chromaQp(51) == 39)
  }

  test("nC >= 8 FLC coeff_token round-trips and codes the spec values") {
    // TC = 0 is the fixed pattern 000011; TC >= 1 codes 4(TC-1)+T1
    assert(H264.encodeBlockBits(Array.fill(16)(0), nC = 8) == "000011")
    val one = Array.fill(16)(0); one(0) = 1 // TC=1, T1=1 → value 1
    assert(H264.encodeBlockBits(one, nC = 8).startsWith("000001"))
    val rnd = new scala.util.Random(88)
    for (_ <- 0 until 300) {
      val tc = rnd.nextInt(6)
      val positions = rnd.shuffle((0 until 16).toList).take(tc).sorted
      val scan = Array.fill(16)(0)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(15) - 7
        scan(p) = v
      }
      val bits = H264.encodeBlockBits(scan, nC = 8)
      val back = H264.decodeBlockBits(bits, nC = 8)
      assert(back.isDefined && back.get.sameElements(scan),
        s"coeffs ${scan.mkString(",")} bits $bits")
    }
  }

  test("chroma DC stream decode equals the quadrant chain simulation") {
    def clip(v: Long) = math.max(0L, math.min(255L, v))
    for (seed <- 0L until 20L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeCavlcIntra(H264.synthesizeH264ChromaDc(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == 16 && m.height == mbH * 16)
      val rOf = Array(-5, -2, 3, 5)
      val tcOf = Array(1, 2, 4, 2) // TotalCoeff of each chroma vector
      var wantL = 0L; var wantC = 0L; var wantW = 0L; var wantN = 0L
      for (f <- 0 until nf) {
        // luma: same flat-block chain as synthesizeH264Cavlc
        val v = Array.ofDim[Long](4, 4 * mbH)
        var fl = 0L
        for (by <- 0 until 4 * mbH; bx <- 0 until 4) {
          val r = rOf(((seed + f * 11 + bx * 7 + by * 5) % 4).toInt)
          val parent =
            if (bx == 0 && by == 0) 128L
            else if (bx == 0) v(0)(by - 1)
            else v(bx - 1)(by)
          v(bx)(by) = clip(parent + r)
          fl += 16 * v(bx)(by)
          wantN += 1
        }
        // chroma: per-plane quadrant chains — top quadrants hang off
        // the previous MB's bottom quadrants (MB-edge DC references)
        var fc = 0L
        for (pl <- 0 until 2) {
          var bL = 128L; var bR = 128L
          for (my <- 0 until mbH) {
            val k = ((seed + f * 11 + my * 5 + pl * 3) % 4).toInt
            val r = H264.chromaQuadResiduals(k)
            val pL = if (my == 0) 128L else bL
            val pR = if (my == 0) 128L else bR
            val tl = clip(pL + r(0)); val tr = clip(pR + r(1))
            val bl = clip(pL + r(2)); val br = clip(pR + r(3))
            fc += 16 * (tl + tr + bl + br)
            bL = bl; bR = br
            wantN += tcOf(k)
          }
        }
        wantL += fl; wantC += fc
        wantW += (f + 1) * (fl + fc)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma ${m.lumaSum} != $wantL")
      assert(m.chromaSum == wantC, s"seed=$seed chroma ${m.chromaSum} != $wantC")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
      assert(m.nLevels == wantN, s"seed=$seed levels ${m.nLevels} != $wantN")
    }
  }

  test("chroma AC combined residuals are pinned against dequant + transform") {
    // per-(k, quadrant, column) residuals of the q159 streams — the
    // oracle hard-codes their row sums, so a drift here is an oracle
    // break. Column-constancy (row-0 AC confinement) asserted first.
    for (k <- 0 until 4; q <- 0 until 4) {
      val dcs = H264.chromaDcDequantForSpec(H264.chromaDcVectorForSpec(k), 24)
      val full = H264.dequantIdctChromaForSpec(
        dcs(q), H264.chromaAcVectorForSpec(k), 24)
      for (y <- 1 until 4; x <- 0 until 4)
        assert(full(y * 4 + x) == full(x), s"k=$k q=$q not column-constant")
      assert(H264.chromaAcCombined(k)(q).sameElements(full.take(4)))
    }
    val want = Map(
      (0, 0) -> Seq(9, 6, -1, -4), (1, 0) -> Seq(-1, -4, -1, 6),
      (1, 1) -> Seq(-3, -7, -3, 3), (2, 0) -> Seq(5, 9, -1, 2),
      (2, 1) -> Seq(0, 4, -6, -3), (3, 0) -> Seq(5, -4, 2, 2),
      (3, 1) -> Seq(3, -7, 0, 0), (3, 2) -> Seq(8, -2, 5, 5),
      (3, 3) -> Seq(0, -9, -3, -3))
    want.foreach { case ((k, q), v) =>
      assert(H264.chromaAcCombined(k)(q).toSeq == v,
        s"k=$k q=$q got ${H264.chromaAcCombined(k)(q).toSeq} != $v")
    }
  }

  test("chroma AC blocks round-trip through maxCoeff 15 with neighbor contexts") {
    val rnd = new scala.util.Random(515)
    for (_ <- 0 until 300) {
      val tc = rnd.nextInt(6)
      val positions = rnd.shuffle((0 until 15).toList).take(tc).sorted
      val scan = Array.fill(15)(0)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(15) - 7
        scan(p) = v
      }
      for (nC <- Seq(0, 1, 2, 3)) {
        val bits = H264.encodeBlockBits15(scan, nC)
        val back = H264.decodeBlockBits15(bits, nC)
        assert(back.isDefined && back.get.sameElements(scan),
          s"nC=$nC coeffs ${scan.mkString(",")} bits $bits")
      }
    }
  }

  test("chroma AC stream decode equals the per-column chain simulation") {
    def clip(v: Long) = math.max(0L, math.min(255L, v))
    for (seed <- 0L until 20L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 1 + (seed % 2).toInt
      val m = H264.decodeCavlcIntra(H264.synthesizeH264ChromaAc(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == 16 && m.height == mbH * 16)
      val rOf = Array(-5, -2, 3, 5)
      val dcTc = Array(1, 2, 4, 2) // chroma DC TotalCoeff per k
      val acTc = Array(1, 2, 2, 2) // chroma AC TotalCoeff per k (× 4 blocks)
      var wantL = 0L; var wantC = 0L; var wantW = 0L; var wantN = 0L
      for (f <- 0 until nf) {
        val v = Array.ofDim[Long](4, 4 * mbH)
        var fl = 0L
        for (by <- 0 until 4 * mbH; bx <- 0 until 4) {
          val r = rOf(((seed + f * 11 + bx * 7 + by * 5) % 4).toInt)
          val parent =
            if (bx == 0 && by == 0) 128L
            else if (bx == 0) v(0)(by - 1)
            else v(bx - 1)(by)
          v(bx)(by) = clip(parent + r)
          fl += 16 * v(bx)(by)
          wantN += 1
        }
        var fc = 0L
        for (pl <- 0 until 2) {
          var pL = 128L; var pR = 128L
          for (my <- 0 until mbH) {
            val k = ((seed + f * 11 + my * 5 + pl * 3) % 4).toInt
            val cmb = H264.chromaAcCombined(k)
            if (my > 0) {
              // top-quad preds come from the above MB's bottom-quad
              // rows: exact scalar chain p' = p + ((Σv + 2) >> 2)
              val kPrev = ((seed + f * 11 + (my - 1) * 5 + pl * 3) % 4).toInt
              val cPrev = H264.chromaAcCombined(kPrev)
              pL += (cPrev(2).sum + 2) >> 2
              pR += (cPrev(3).sum + 2) >> 2
            }
            for (q <- 0 until 4; x <- 0 until 4) {
              val p = if (q % 2 == 0) pL else pR
              fc += 4 * clip(p + cmb(q)(x)) // 4 rows per column
            }
            wantN += dcTc(k) + 4 * acTc(k)
          }
        }
        wantL += fl; wantC += fc
        wantW += (f + 1) * (fl + fc)
      }
      assert(m.lumaSum == wantL, s"seed=$seed luma ${m.lumaSum} != $wantL")
      assert(m.chromaSum == wantC, s"seed=$seed chroma ${m.chromaSum} != $wantC")
      assert(m.weightedSum == wantW, s"seed=$seed weighted")
      assert(m.nLevels == wantN, s"seed=$seed levels ${m.nLevels} != $wantN")
    }
  }

  test("CAVLC decode refuses a run_before past the remaining zeros") {
    // coeff_token (0,2), two levels, total_zeros 14, then a >6-class
    // run_before coding run=16 > zerosLeft=14 — must refuse (None),
    // not drive the landing index negative
    val bits = "00000111" + "1" + "10" + "000000" + "000" + "000000000" + "1"
    assert(H264.decodeBlockBits(bits).isEmpty)
  }

  test("CAVLC decode refuses I_PCM and bitstream-payload streams") {
    assert(H264.decodeCavlcIntra(H264.synthesizeH264IPcm(1, 1, 1, 3L)).isEmpty)
    assert(H264.decodeCavlcIntra(H264.synthesizeH264Stream(32, 32, 30, 2, 7L)).isEmpty)
    val good = H264.synthesizeH264Cavlc(2, 1, 5L)
    assert(H264.decodeCavlcIntra(good.take(good.length - 6)).isEmpty)
  }

  test("CAVLC decode never throws on arbitrary bits (refuse, don't crash)") {
    // the decoder's contract is None on anything outside the subset —
    // a fuzz sweep over random bit strings and random byte streams
    // must never surface an exception (AIOOBE class caught by review)
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 0 until 2000) {
      val bits = (0 until 4 + rnd.nextInt(60))
        .map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
      for (nC <- Seq(0, 2))
        H264.decodeBlockBits(bits, nC) // Option either way; must not throw
    }
    for (_ <- 0 until 300) {
      val bytes = Array.fill(8 + rnd.nextInt(120))(rnd.nextInt(256).toByte)
      H264.decodeCavlcIntra(bytes)
      H264.decodeIPcm(bytes)
      H264.parseStream(bytes)
    }
    // corrupt REAL streams at a random byte: still no exceptions
    for (seed <- 0L until 30L) {
      val good = H264.synthesizeH264CavlcAc(2, 1, seed)
      val bad = good.clone()
      bad(8 + rnd.nextInt(bad.length - 8)) = rnd.nextInt(256).toByte
      H264.decodeCavlcIntra(bad)
    }
  }

  test("truncated and garbage streams parse to None") {
    val p = H264.synthesizeH264Stream(64, 48, 30, 2, 3L)
    assert(H264.parseStream(p.take(6)).isEmpty)        // cut inside SPS
    assert(H264.parseStream(Array[Byte](1, 2, 3)).isEmpty) // no start code
    assert(H264.parseStream(Array.empty[Byte]).isEmpty)
  }

  /** Independent inter simulation: I_PCM lattice frame 0, then each
    * P frame shifts the previous RECONSTRUCTED frame by the constant
    * per-frame displacement with edge clamping — no shared code with
    * decodeInter beyond the public displacement closed forms.
    */
  private def simulateInter(mbW: Int, mbH: Int, nf: Int, seed: Long):
      (Long, Long, Long, Long, Long) = {
    val w = mbW * 16; val h = mbH * 16
    def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
    var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
    var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
    var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
    var wl = 0L; var wc = 0L; var ww = 0L; var wsk = 0L; var wmv = 0L
    def addFrame(fi: Int): Unit = {
      var fl = 0L; l.foreach(_.foreach(fl += _))
      var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
      wl += fl; wc += fc; ww += (fi + 1L) * (fl + fc)
    }
    addFrame(0)
    for (f <- 1 until nf) {
      val dx = H264.synthInterDx(seed, f); val dy = H264.synthInterDy(seed, f)
      val pl = l; val pcb = cbP; val pcr = crP
      l = Array.tabulate(h, w)((y, x) => pl(clamp(y + dy, h - 1))(clamp(x + dx, w - 1)))
      cbP = Array.tabulate(h / 2, w / 2)((y, x) =>
        pcb(clamp(y + dy / 2, h / 2 - 1))(clamp(x + dx / 2, w / 2 - 1)))
      crP = Array.tabulate(h / 2, w / 2)((y, x) =>
        pcr(clamp(y + dy / 2, h / 2 - 1))(clamp(x + dx / 2, w / 2 - 1)))
      addFrame(f)
      for (my <- 1 until mbH; mx <- 1 until mbW)
        if ((seed + f + mx + 3L * my) % 3 == 0) wsk += 1
      wmv += mbW.toLong * mbH * 4 * (math.abs(dx) + math.abs(dy))
    }
    (wl, wc, ww, wsk, wmv)
  }

  test("inter P-frame decode equals an independent motion-compensated simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val m = H264.decodeInter(H264.synthesizeH264Inter(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == mbW * 16 && m.height == mbH * 16)
      val (wl, wc, ww, wsk, wmv) = simulateInter(mbW, mbH, nf, seed)
      assert(m.lumaSum == wl, s"seed=$seed luma")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww, s"seed=$seed weighted")
      assert(m.nSkipped == wsk, s"seed=$seed skips")
      assert(m.mvAbsSum == wmv, s"seed=$seed mv")
    }
  }

  test("inter decode covers the zero-mv P_Skip rule (long GOPs hit dx=dy=0 frames)") {
    // f ≡ 0 (mod 3) with seed ≡ 1 (mod 3) makes frame f's mv (0,0):
    // skipped MBs then take the A/B-zero special case, not the median
    for (seed <- Seq(1L, 4L, 7L)) {
      val nf = 6
      assert((1 until nf).exists(f =>
        H264.synthInterDx(seed, f) == 0 && H264.synthInterDy(seed, f) == 0))
      val m = H264.decodeInter(H264.synthesizeH264Inter(3, 3, nf, seed)).get
      val (wl, wc, ww, wsk, wmv) = simulateInter(3, 3, nf, seed)
      assert(m.lumaSum == wl && m.chromaSum == wc && m.weightedSum == ww)
      assert(m.nSkipped == wsk && m.mvAbsSum == wmv)
    }
  }

  test("inter decode refuses out-of-scope and orphaned streams") {
    // a P slice with no decoded reference (IDR NAL excised) → None
    val p = H264.synthesizeH264Inter(2, 2, 3, 5L)
    val idr = {
      var i = -1
      for (j <- 0 until p.length - 3 if i < 0)
        if (p(j) == 0 && p(j + 1) == 0 && p(j + 2) == 1 && (p(j + 3) & 0x1F) == 5) i = j
      i
    }
    val next = {
      var i = -1
      for (j <- idr + 4 until p.length - 2 if i < 0)
        if (p(j) == 0 && p(j + 1) == 0 && p(j + 2) == 1) i = j
      i
    }
    assert(idr > 0 && next > idr)
    assert(H264.decodeInter(p.take(idr) ++ p.drop(next)).isEmpty)
    // CAVLC intra / bitstream-payload streams are outside the subset
    assert(H264.decodeInter(H264.synthesizeH264Stream(32, 32, 30, 3, 7L)).isEmpty)
    // arbitrary bytes and single-byte corruption: None or Some, never a throw
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 0 until 300)
      H264.decodeInter(Array.fill(8 + rnd.nextInt(120))(rnd.nextInt(256).toByte))
    for (seed <- 0L until 30L) {
      val bad = H264.synthesizeH264Inter(2, 2, 3, seed)
      bad(8 + rnd.nextInt(bad.length - 8)) = rnd.nextInt(256).toByte
      H264.decodeInter(bad)
    }
  }

  test("inter residual decode equals MC + pinned-residual + clip simulation") {
    // residual columns: the q150 pinned IDCT outputs of acScanVectors
    // at QP 24 (column-constant), k-major
    val rcol = Array(
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    val tcOf = Array(1, 2, 2, 2)
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264InterResidual(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == w && m.height == h)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wwt = 0L; var wlev = 0L
      var fl0 = 0L; l.foreach(_.foreach(fl0 += _)); wl += fl0; wwt += fl0
      for (f <- 1 until nf) {
        val dx = H264.synthInterDx(seed, f); val dy = H264.synthInterDy(seed, f)
        val pl = l
        l = Array.tabulate(h, w) { (y, x) =>
          val mc = pl(clamp(y + dy, h - 1))(clamp(x + dx, w - 1))
          val mx = x / 16; val my = y / 16
          val skip = mx > 0 && my > 0 && (seed + f + mx + 3L * my) % 3 == 0
          val res =
            if (!skip && H264.synthHasResidual(seed, f, mx, my))
              rcol(H264.synthResidualK(seed, f, x / 4, y / 4))(x % 4)
            else 0
          math.min(255, math.max(0, mc + res))
        }
        var fl = 0L; l.foreach(_.foreach(fl += _))
        wl += fl; wwt += (f + 1L) * fl
        for (my <- 0 until mbH; mx <- 0 until mbW) {
          val skip = mx > 0 && my > 0 && (seed + f + mx + 3L * my) % 3 == 0
          if (!skip && H264.synthHasResidual(seed, f, mx, my))
            for (zy <- 0 until 4; zx <- 0 until 4)
              wlev += tcOf(H264.synthResidualK(seed, f, mx * 4 + zx, my * 4 + zy))
        }
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.nLevels == wlev, s"seed=$seed levels ${m.nLevels} vs $wlev")
      assert(m.nLevels > 0, s"seed=$seed must actually decode residual levels")
      // residual-free synth through the same decoder: zero levels
      assert(H264.decodeInter(
        H264.synthesizeH264Inter(mbW, mbH, nf, seed)).get.nLevels == 0)
    }
  }

  test("half-pel inter decode equals an independent 6-tap + bilinear simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 3).toInt // up to 4 frames: both filter axes chain
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264InterHalfpel(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      def clampi(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww += (fi + 1L) * (fl + fc)
      }
      add(0)
      val tap = Array(1, -5, 20, 20, -5, 1)
      for (f <- 1 until nf) {
        val qx = H264.synthHalfQx(seed, f); val qy = H264.synthHalfQy(seed, f)
        val dxI = Math.floorDiv(qx, 4); val xF = Math.floorMod(qx, 4)
        val dyI = Math.floorDiv(qy, 4); val yF = Math.floorMod(qy, 4)
        val pl = l
        def ref(x: Int, y: Int) = pl(clampi(y, h - 1))(clampi(x, w - 1))
        l = Array.tabulate(h, w) { (y, x) =>
          if (xF == 0 && yF == 0) ref(x + dxI, y + dyI)
          else if (xF == 2) {
            val s = (0 until 6).map(i => tap(i) * ref(x + dxI + i - 2, y + dyI)).sum
            math.min(255, math.max(0, (s + 16) >> 5))
          } else {
            val s = (0 until 6).map(i => tap(i) * ref(x + dxI, y + dyI + i - 2)).sum
            math.min(255, math.max(0, (s + 16) >> 5))
          }
        }
        val cdx = Math.floorDiv(qx, 8); val cxF = Math.floorMod(qx, 8)
        val cdy = Math.floorDiv(qy, 8); val cyF = Math.floorMod(qy, 8)
        def bil(p: Array[Array[Int]])(y: Int, x: Int): Int = {
          def r(xx: Int, yy: Int) = p(clampi(yy, h / 2 - 1))(clampi(xx, w / 2 - 1))
          val (a, b, c, d) = (r(x + cdx, y + cdy), r(x + cdx + 1, y + cdy),
            r(x + cdx, y + cdy + 1), r(x + cdx + 1, y + cdy + 1))
          ((8 - cxF) * (8 - cyF) * a + cxF * (8 - cyF) * b +
            (8 - cxF) * cyF * c + cxF * cyF * d + 32) >> 6
        }
        val pcb = cbP; val pcr = crP
        cbP = Array.tabulate(h / 2, w / 2)(bil(pcb))
        crP = Array.tabulate(h / 2, w / 2)(bil(pcr))
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww, s"seed=$seed weighted")
    }
  }

  test("hand-written P slices drive the sub-sample grid at the bit level") {
    // P slices written bit by bit (mvd (1,0) quarter, (2,2) center-j)
    // on a SPS/PPS/IDR prefix from a good single-MB stream — the
    // grid is reached through real slice parsing, not just the synth.
    def pSlice(mvdx: Int, mvdy: Int): Array[Byte] = {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]()
      def u(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(b => bits += ((v >>> b) & 1))
      def ue(x: Int): Unit = {
        val v = x + 1
        val len = 32 - Integer.numberOfLeadingZeros(v)
        u(0, len - 1); u(v, len)
      }
      def se(x: Int): Unit = ue(if (x <= 0) -2 * x else 2 * x - 1)
      ue(0); ue(5); ue(0)        // first_mb, slice_type P, pps
      u(1, 4)                    // frame_num
      u(0, 1); u(0, 1); u(0, 1)  // override, list_mod, marking
      se(0); ue(1)               // qp_delta, deblocking off
      ue(0)                      // mb_skip_run
      ue(0)                      // mb_type P_L0_16x16
      se(mvdx); se(mvdy)         // mvd (pred is (0,0) for the lone MB)
      ue(0)                      // cbp
      u(1, 1)                    // rbsp stop
      while (bits.length % 8 != 0) u(0, 1)
      bits.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
    val good = H264.synthesizeH264Inter(1, 1, 1, 3L) // SPS+PPS+IDR only
    assert(H264.decodeInter(good).nonEmpty)
    def withP(mvdx: Int, mvdy: Int): Array[Byte] =
      good ++ Array[Byte](0, 0, 1, 0x41.toByte) ++ pSlice(mvdx, mvdy)
    assert(H264.decodeInter(withP(8, 0)).nonEmpty)  // 2 full samples
    assert(H264.decodeInter(withP(2, 0)).nonEmpty)  // half-pel
    // quarter-pel and center-j now decode through the full grid
    // (hand-written mvd, so also a bitstream-level path check)
    assert(H264.decodeInter(withP(1, 0)).nonEmpty)
    assert(H264.decodeInter(withP(2, 2)).nonEmpty)
    // the (1,0) mv must interpolate, not copy: sums differ from (0,0)
    assert(H264.decodeInter(withP(1, 0)).get.lumaSum !=
      H264.decodeInter(withP(0, 0)).get.lumaSum)
  }

  test("bi-prediction decode equals an independent two-reference simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 3).toInt // chains of up to 3 B frames
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264Bi(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int, hh: Int, ww: Int) =
        Array.tabulate(hh, ww)((y, x) => p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      var l1 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cb1 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var cr1 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int, l: Array[Array[Int]], cB: Array[Array[Int]],
          cR: Array[Array[Int]]): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cB.foreach(_.foreach(fc += _)); cR.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0, l1, cb1, cr1)
      // frame 1: P with constant qp1
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      var l0 = l1; var cb0 = cb1; var cr0 = cr1
      var lC = shift(l1, qp1._1 / 4, qp1._2 / 4, h, w)
      var cbC = shift(cb1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      var crC = shift(cr1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      add(1, lC, cbC, crC)
      for (f <- 2 until nf) {
        val q0 = H264.synthBiQ0(seed, f); val q1 = H264.synthBiQ1(seed, f)
        val s0l = shift(lC, q0._1 / 4, q0._2 / 4, h, w)
        val s1l = shift(l0, q1._1 / 4, q1._2 / 4, h, w)
        val s0cb = shift(cbC, q0._1 / 8, q0._2 / 8, h / 2, w / 2)
        val s1cb = shift(cb0, q1._1 / 8, q1._2 / 8, h / 2, w / 2)
        val s0cr = shift(crC, q0._1 / 8, q0._2 / 8, h / 2, w / 2)
        val s1cr = shift(cr0, q1._1 / 8, q1._2 / 8, h / 2, w / 2)
        def mix(a: Array[Array[Int]], b: Array[Array[Int]], blk: Int) =
          Array.tabulate(a.length, a(0).length) { (y, x) =>
            H264.synthBiType(seed, f, x / blk, y / blk) match {
              case 1 => a(y)(x)
              case 2 => b(y)(x)
              case _ => (a(y)(x) + b(y)(x) + 1) >> 1
            }
          }
        val nl = mix(s0l, s1l, 16)
        val ncb = mix(s0cb, s1cb, 8); val ncr = mix(s0cr, s1cr, 8)
        add(f, nl, ncb, ncr)
        l0 = lC; cb0 = cbC; cr0 = crC
        lC = nl; cbC = ncb; crC = ncr
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("B-frame residual decode equals bi-prediction + pinned residual + clip") {
    val rcol = Array(
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    val tcOf = Array(1, 2, 2, 2)
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264BiRes(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nLevels > 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int, hh: Int, ww: Int) =
        Array.tabulate(hh, ww)((y, x) => p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      var l1 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cb1 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var cr1 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L; var wlev = 0L
      def add(fi: Int, l: Array[Array[Int]], cB: Array[Array[Int]],
          cR: Array[Array[Int]]): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cB.foreach(_.foreach(fc += _)); cR.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0, l1, cb1, cr1)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      var l0 = l1; var cb0 = cb1; var cr0 = cr1
      var lC = shift(l1, qp1._1 / 4, qp1._2 / 4, h, w)
      var cbC = shift(cb1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      var crC = shift(cr1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      add(1, lC, cbC, crC)
      for (f <- 2 until nf) {
        val q0 = H264.synthBiQ0(seed, f); val q1 = H264.synthBiQ1(seed, f)
        val s0l = shift(lC, q0._1 / 4, q0._2 / 4, h, w)
        val s1l = shift(l0, q1._1 / 4, q1._2 / 4, h, w)
        val nl = Array.tabulate(h, w) { (y, x) =>
          val base = H264.synthBiType(seed, f, x / 16, y / 16) match {
            case 1 => s0l(y)(x)
            case 2 => s1l(y)(x)
            case _ => (s0l(y)(x) + s1l(y)(x) + 1) >> 1
          }
          val res =
            if (H264.synthHasResidual(seed, f, x / 16, y / 16))
              rcol(H264.synthResidualK(seed, f, x / 4, y / 4))(x % 4)
            else 0
          math.min(255, math.max(0, base + res))
        }
        for (my <- 0 until mbH; mx <- 0 until mbW)
          if (H264.synthHasResidual(seed, f, mx, my))
            for (zy <- 0 until 4; zx <- 0 until 4)
              wlev += tcOf(H264.synthResidualK(seed, f, mx * 4 + zx, my * 4 + zy))
        def mixc(a: Array[Array[Int]], b: Array[Array[Int]]) =
          Array.tabulate(h / 2, w / 2) { (y, x) =>
            H264.synthBiType(seed, f, x / 8, y / 8) match {
              case 1 => a(y)(x)
              case 2 => b(y)(x)
              case _ => (a(y)(x) + b(y)(x) + 1) >> 1
            }
          }
        val ncb = mixc(shift(cbC, q0._1 / 8, q0._2 / 8, h / 2, w / 2),
          shift(cb0, q1._1 / 8, q1._2 / 8, h / 2, w / 2))
        val ncr = mixc(shift(crC, q0._1 / 8, q0._2 / 8, h / 2, w / 2),
          shift(cr0, q1._1 / 8, q1._2 / 8, h / 2, w / 2))
        add(f, nl, ncb, ncr)
        l0 = lC; cb0 = cbC; cr0 = crC
        lC = nl; cbC = ncb; crC = ncr
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.nLevels == wlev, s"seed=$seed levels ${m.nLevels} vs $wlev")
    }
  }

  test("B decode refusals: missing second reference and direct modes") {
    // excise the P frame: the B slice then sees only one reference
    val p = H264.synthesizeH264Bi(2, 2, 3, 5L)
    def nalStarts(b: Array[Byte]): Seq[Int] =
      (0 until b.length - 3).filter(j =>
        b(j) == 0 && b(j + 1) == 0 && b(j + 2) == 1)
    val starts = nalStarts(p)
    // NALs: SPS, PPS, IDR, P, B — drop the 4th (P)
    assert(starts.length == 5)
    val noP = p.take(starts(3)) ++ p.drop(starts(4))
    assert(H264.decodeInter(noP).isEmpty)
    // sanity: intact stream decodes
    assert(H264.decodeInter(p).nonEmpty)
  }

  test("weighted prediction decode equals an independent scale/offset simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264Weighted(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def wp(v: Int, w0: Int, o: Int, d: Int): Int =
        math.min(255, math.max(0,
          (if (d >= 1) (v * w0 + (1 << (d - 1))) >> d else v * w0) + o))
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val dx = H264.synthInterDx(seed, f); val dy = H264.synthInterDy(seed, f)
        val (lwd, lw, lo) = H264.synthWtLuma(seed, f)
        val (cwd, cw0, co0, cw1, co1) = H264.synthWtChroma(seed, f)
        val pl = l; val pcb = cbP; val pcr = crP
        l = Array.tabulate(h, w)((y, x) =>
          wp(pl(clamp(y + dy, h - 1))(clamp(x + dx, w - 1)), lw, lo, lwd))
        cbP = Array.tabulate(h / 2, w / 2)((y, x) =>
          wp(pcb(clamp(y + dy / 2, h / 2 - 1))(clamp(x + dx / 2, w / 2 - 1)), cw0, co0, cwd))
        crP = Array.tabulate(h / 2, w / 2)((y, x) =>
          wp(pcr(clamp(y + dy / 2, h / 2 - 1))(clamp(x + dx / 2, w / 2 - 1)), cw1, co1, cwd))
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("quarter-pel grid lands every class at its exact offset on linear ramps") {
    // on a ramp r(x,y) = base + bx·x + by·y the 6-tap half filter is
    // exact (tap moment 16 = 32·½) and every quarter average is exact
    // up to its final rounding — so each of the 16 classes must land
    // within ONE count of base + bx(x+fx/4) + by(y+fy/4). A
    // transposed or mis-signed grid entry is off by ≥ bx/4 or by/4
    // (set ≥ 8 below, i.e. ≥ 2 counts).
    // coefficients keep every read ≤ 243 (no clipping in play) while
    // |bx−by|/4 = 2 catches transposition, 2·b/4 ≥ 2 catches axis
    // sign, and b/4 = 1 > 0.8 catches a quarter landing on a half
    // (true rounding is ≤ 0.75: half/j ≤ 0.5, averages ≤ 0.75)
    val w = 32; val h = 24
    for ((bx, by) <- Seq((4, 12), (12, 4))) {
      val ref = Array.tabulate(h * w)(i => 3 + bx * (i % w) + by * (i / w))
      for (fx <- 0 until 4; fy <- 0 until 4; x <- 8 until 13; y <- 8 until 13) {
        val got = H264.lumaSubSample(ref, w, h, x, y, fx, fy)
        val exact = 3.0 + bx * (x + fx / 4.0) + by * (y + fy / 4.0)
        assert(math.abs(got - exact) <= 0.8,
          s"class ($fx,$fy) at ($x,$y) ramp ($bx,$by): $got vs $exact")
      }
    }
  }

  test("quarter-pel inter decode equals an independent grid simulation") {
    for (seed <- 0L until 16L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264InterQuarter(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      def clampi(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h * w)(i => ((seed + (i % w) + 2 * (i / w)) % 251).toInt)
      var cbP = Array.tabulate(h / 2 * (w / 2))(i =>
        ((seed + 2 * (i % (w / 2)) + (i / (w / 2))) % 251).toInt)
      var crP = Array.tabulate(h / 2 * (w / 2))(i =>
        ((3 * seed + (i % (w / 2)) + 2 * (i / (w / 2))) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(fl += _)
        var fc = 0L; cbP.foreach(fc += _); crP.foreach(fc += _)
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val qx = H264.synthQuarterQx(seed, f); val qy = H264.synthQuarterQy(seed, f)
        val fx = Math.floorMod(qx, 4); val fy = Math.floorMod(qy, 4)
        val dx = Math.floorDiv(qx, 4); val dy = Math.floorDiv(qy, 4)
        val pl = l
        l = Array.tabulate(h * w)(i =>
          H264.lumaSubSample(pl, w, h, (i % w) + dx, (i / w) + dy, fx, fy))
        val cdx = Math.floorDiv(qx, 8); val cxF = Math.floorMod(qx, 8)
        val cdy = Math.floorDiv(qy, 8); val cyF = Math.floorMod(qy, 8)
        def bil(p: Array[Int])(i: Int): Int = {
          val cw = w / 2; val ch = h / 2
          val x = i % cw; val y = i / cw
          def r(xx: Int, yy: Int) = p(clampi(yy, ch - 1) * cw + clampi(xx, cw - 1))
          ((8 - cxF) * (8 - cyF) * r(x + cdx, y + cdy) +
            cxF * (8 - cyF) * r(x + cdx + 1, y + cdy) +
            (8 - cxF) * cyF * r(x + cdx, y + cdy + 1) +
            cxF * cyF * r(x + cdx + 1, y + cdy + 1) + 32) >> 6
        }
        val pcb = cbP; val pcr = crP
        cbP = Array.tabulate(h / 2 * (w / 2))(bil(pcb))
        crP = Array.tabulate(h / 2 * (w / 2))(bil(pcr))
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("slice count never changes the reconstruction (slices are independent)") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 2 + (seed % 2).toInt // >= 2 rows so 2-3 slices exist
      val nf = 2 + (seed % 2).toInt
      val one = H264.decodeInter(
        H264.synthesizeH264InterSliced(mbW, mbH, nf, 1, seed)).get
      for (s <- 2 to mbH) {
        val multi = H264.decodeInter(
          H264.synthesizeH264InterSliced(mbW, mbH, nf, s, seed)).get
        assert(multi.lumaSum == one.lumaSum &&
          multi.chromaSum == one.chromaSum &&
          multi.weightedSum == one.weightedSum,
          s"seed=$seed slices=$s reconstruction drifted")
        assert(multi.mvAbsSum == one.mvAbsSum)
        // the skip lattice can only SHRINK (slice-first rows cannot skip)
        assert(multi.nSkipped <= one.nSkipped)
      }
    }
  }

  test("multi-slice structure violations are refusals") {
    val p = H264.synthesizeH264InterSliced(2, 3, 2, 2, 7L)
    def nalStarts(b: Array[Byte]): Seq[Int] =
      (0 until b.length - 3).filter(j =>
        b(j) == 0 && b(j + 1) == 0 && b(j + 2) == 1)
    val starts = nalStarts(p)
    // NALs: SPS, PPS, IDR, P-slice-0, P-slice-1
    assert(starts.length == 5)
    // dropping the second slice leaves the picture incomplete → None
    assert(H264.decodeInter(p.take(starts(4))).isEmpty)
    // dropping the FIRST slice starts a picture mid-frame → None
    assert(H264.decodeInter(p.take(starts(3)) ++ p.drop(starts(4))).isEmpty)
    // duplicating slice 1 (first_mb regresses) → None
    assert(H264.decodeInter(
      p ++ p.slice(starts(4), p.length)).isEmpty)
    // intact stream decodes
    assert(H264.decodeInter(p).nonEmpty)
  }

  test("refIdx-aware prediction: matching-neighbor shortcut and any-ref median") {
    // 2x2 field, predicting for MB (1,1): A=(0,1), B=(1,0), C→D=(0,0)
    val mvs = Array((10, 2), (30, 6), (50, 4), (0, 0))
    val done = Array(true, true, true, false)
    // exactly ONE neighbor (A, idx 2) has refIdx 1 → shortcut to mvA
    assert(H264.predictMvRef(mvs, done, Array(0, 0, 1, -1), 1, 1, 1, 2) == ((50, 4)))
    // curRef 0 has TWO matches (D and B) → componentwise median of all
    // three neighbor mvs (any ref): x med(10,30,50)=30, y med(2,6,4)=4
    assert(H264.predictMvRef(mvs, done, Array(0, 0, 1, -1), 0, 1, 1, 2) == ((30, 4)))
  }

  test("multi-ref decode equals an independent per-lattice simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264MultiRef(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int, hh: Int, ww: Int) =
        Array.tabulate(hh, ww)((y, x) => p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      var prev2L: Array[Array[Int]] = null
      var prev2Cb: Array[Array[Int]] = null
      var prev2Cr: Array[Array[Int]] = null
      var lC = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbC = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crC = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; lC.foreach(_.foreach(fl += _))
        var fc = 0L; cbC.foreach(_.foreach(fc += _)); crC.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val p2l = prev2L; val p2cb = prev2Cb; val p2cr = prev2Cr
        prev2L = lC; prev2Cb = cbC; prev2Cr = crC
        if (f == 1) {
          val q = H264.synthMrQ(seed, 1, 0)
          lC = shift(lC, q._1 / 4, q._2 / 4, h, w)
          cbC = shift(cbC, q._1 / 8, q._2 / 8, h / 2, w / 2)
          crC = shift(crC, q._1 / 8, q._2 / 8, h / 2, w / 2)
        } else {
          val q0 = H264.synthMrQ(seed, f, 0); val q1 = H264.synthMrQ(seed, f, 1)
          val s0l = shift(prev2L, q0._1 / 4, q0._2 / 4, h, w)
          val s1l = shift(p2l, q1._1 / 4, q1._2 / 4, h, w)
          def mix(a: Array[Array[Int]], b: Array[Array[Int]], blk: Int) =
            Array.tabulate(a.length, a(0).length) { (y, x) =>
              if (H264.synthMrRef(seed, f, x / blk, y / blk) == 0) a(y)(x)
              else b(y)(x)
            }
          lC = mix(s0l, s1l, 16)
          cbC = mix(shift(prev2Cb, q0._1 / 8, q0._2 / 8, h / 2, w / 2),
            shift(p2cb, q1._1 / 8, q1._2 / 8, h / 2, w / 2), 8)
          crC = mix(shift(prev2Cr, q0._1 / 8, q0._2 / 8, h / 2, w / 2),
            shift(p2cr, q1._1 / 8, q1._2 / 8, h / 2, w / 2), 8)
        }
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("weighted multi-ref decode applies each partition's own weight entry") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(
        H264.synthesizeH264WeightedMultiRef(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int, hh: Int, ww: Int) =
        Array.tabulate(hh, ww)((y, x) => p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      def wp(v: Int, wt: Int, o: Int, d: Int): Int =
        math.min(math.max((if (d >= 1) (v * wt + (1 << (d - 1))) >> d
                           else v * wt) + o, 0), 255)
      // apply the ref's weight entry to a whole plane
      def wL(p: Array[Array[Int]], f: Int, ref: Int) = {
        val (d, wt, o) = H264.synthWtLumaR(seed, f, ref)
        p.map(_.map(wp(_, wt, o, d)))
      }
      def wC(p: Array[Array[Int]], f: Int, ref: Int, plane: Int) = {
        val (d, cw0, co0, cw1, co1) = H264.synthWtChromaR(seed, f, ref)
        val (wt, o) = if (plane == 0) (cw0, co0) else (cw1, co1)
        p.map(_.map(wp(_, wt, o, d)))
      }
      var prev2L: Array[Array[Int]] = null
      var prev2Cb: Array[Array[Int]] = null
      var prev2Cr: Array[Array[Int]] = null
      var lC = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbC = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crC = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; lC.foreach(_.foreach(fl += _))
        var fc = 0L; cbC.foreach(_.foreach(fc += _)); crC.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val p2l = prev2L; val p2cb = prev2Cb; val p2cr = prev2Cr
        prev2L = lC; prev2Cb = cbC; prev2Cr = crC
        if (f == 1) {
          val q = H264.synthMrQ(seed, 1, 0)
          lC = wL(shift(lC, q._1 / 4, q._2 / 4, h, w), 1, 0)
          cbC = wC(shift(cbC, q._1 / 8, q._2 / 8, h / 2, w / 2), 1, 0, 0)
          crC = wC(shift(crC, q._1 / 8, q._2 / 8, h / 2, w / 2), 1, 0, 1)
        } else {
          val q0 = H264.synthMrQ(seed, f, 0); val q1 = H264.synthMrQ(seed, f, 1)
          def mix(a: Array[Array[Int]], b: Array[Array[Int]], blk: Int) =
            Array.tabulate(a.length, a(0).length) { (y, x) =>
              if (H264.synthMrRef(seed, f, x / blk, y / blk) == 0) a(y)(x)
              else b(y)(x)
            }
          lC = mix(wL(shift(prev2L, q0._1 / 4, q0._2 / 4, h, w), f, 0),
            wL(shift(p2l, q1._1 / 4, q1._2 / 4, h, w), f, 1), 16)
          cbC = mix(wC(shift(prev2Cb, q0._1 / 8, q0._2 / 8, h / 2, w / 2), f, 0, 0),
            wC(shift(p2cb, q1._1 / 8, q1._2 / 8, h / 2, w / 2), f, 1, 0), 8)
          crC = mix(wC(shift(prev2Cr, q0._1 / 8, q0._2 / 8, h / 2, w / 2), f, 0, 1),
            wC(shift(p2cr, q1._1 / 8, q1._2 / 8, h / 2, w / 2), f, 1, 1), 8)
        }
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("partition prediction uses the directional rules before the median") {
    // 8x8-block field (2x2 MBs), all decoded, ref 0, distinct mvs per
    // block row/col so directional and median results differ
    val bW = 8; val bH = 8
    val mvs = Array.tabulate(bW * bH)(i => (10 * (i % bW), 10 * (i / bW)))
    val done = Array.fill(bW * bH)(true)
    val refs = Array.fill(bW * bH)(0)
    // 16x8 TOP partition of MB (1,1): blocks (4..7, 4..5); dir 1 → B =
    // block (4,3) → mv (40,30)
    assert(H264.predictMvPart(mvs, done, refs, 0, bW, bH, 4, 4, 4, 1) == ((40, 30)))
    // 16x8 BOTTOM at (4,6): dir 2 → A = block (3,6) → (30,60)
    assert(H264.predictMvPart(mvs, done, refs, 0, bW, bH, 4, 6, 4, 2) == ((30, 60)))
    // 8x16 LEFT at (4,4): dir 3 → A = (3,4) → (30,40)
    assert(H264.predictMvPart(mvs, done, refs, 0, bW, bH, 4, 4, 2, 3) == ((30, 40)))
    // 8x16 RIGHT at (6,4): dir 4 → C = block (8,3)? out of bounds →
    // D = (5,3) → (50,30)
    assert(H264.predictMvPart(mvs, done, refs, 0, bW, bH, 6, 4, 2, 4) == ((50, 30)))
    // same position without a directional rule: median of A=(5,4)=(50,40),
    // B=(6,3)=(60,30), C→D=(5,3)=(50,30) → (50,30)
    assert(H264.predictMvPart(mvs, done, refs, 0, bW, bH, 6, 4, 2, 0) == ((50, 30)))
    // directional neighbor with a NON-matching refIdx falls back: make
    // B's ref 1 for the 16x8 top case → general rule (all-available
    // median of A=(3,4)=(30,40), B=(4,3)=(40,30), C=(8,3)→D=(3,3)=(30,30))
    val refs2 = refs.clone(); refs2(3 * bW + 4) = 1
    assert(H264.predictMvPart(mvs, done, refs2, 0, bW, bH, 4, 4, 4, 1) == ((30, 30)))
  }

  test("partitioned P decode equals an independent per-half simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264Partitions(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val qA = H264.synthPartQA(seed, f); val qB = H264.synthPartQB(seed, f)
        def useB(blk: Int)(x: Int, y: Int): Boolean = {
          val k = H264.synthPartKind(seed, f, x / blk, y / blk)
          (k == 1 && y % blk >= blk / 2) || (k == 2 && x % blk >= blk / 2)
        }
        val pl = l
        l = Array.tabulate(h, w) { (y, x) =>
          val q = if (useB(16)(x, y)) qB else qA
          pl(clamp(y + q._2 / 4, h - 1))(clamp(x + q._1 / 4, w - 1))
        }
        val pcb = cbP; val pcr = crP
        cbP = Array.tabulate(h / 2, w / 2) { (y, x) =>
          val q = if (useB(8)(x, y)) qB else qA
          pcb(clamp(y + q._2 / 8, h / 2 - 1))(clamp(x + q._1 / 8, w / 2 - 1))
        }
        crP = Array.tabulate(h / 2, w / 2) { (y, x) =>
          val q = if (useB(8)(x, y)) qB else qA
          pcr(clamp(y + q._2 / 8, h / 2 - 1))(clamp(x + q._1 / 8, w / 2 - 1))
        }
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("sub-partitioned P decode equals an independent per-region simulation") {
    // every MB carries all four sub_mb_types (the kind lattice mod 4
    // over sb = 0..3 hits each), so one green seed exercises 8x8,
    // 8x4, 4x8 AND 4x4 prediction + MC; qB regions are the 8x4
    // bottom, 4x8 right, and 4x4 anti-diagonal
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264SubParts(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L; var mvAbs = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      for (f <- 1 until nf) {
        val qA = H264.synthPartQA(seed, f); val qB = H264.synthPartQB(seed, f)
        // blk = 16 for luma, 8 for chroma; sub-MB is blk/2, sub-part blk/4
        def useB(blk: Int)(x: Int, y: Int): Boolean = {
          val half = blk / 2; val qtr = blk / 4
          val sb = 2 * ((y % blk) / half) + (x % blk) / half
          val k = H264.synthSubKind(seed, x / blk, y / blk, sb)
          val sx = x % half; val sy = y % half
          (k == 1 && sy >= qtr) || (k == 2 && sx >= qtr) ||
            (k == 3 && ((sx >= qtr) != (sy >= qtr)))
        }
        val pl = l
        l = Array.tabulate(h, w) { (y, x) =>
          val q = if (useB(16)(x, y)) qB else qA
          pl(clamp(y + q._2 / 4, h - 1))(clamp(x + q._1 / 4, w - 1))
        }
        val pcb = cbP; val pcr = crP
        cbP = Array.tabulate(h / 2, w / 2) { (y, x) =>
          val q = if (useB(8)(x, y)) qB else qA
          pcb(clamp(y + q._2 / 8, h / 2 - 1))(clamp(x + q._1 / 8, w / 2 - 1))
        }
        crP = Array.tabulate(h / 2, w / 2) { (y, x) =>
          val q = if (useB(8)(x, y)) qB else qA
          pcr(clamp(y + q._2 / 8, h / 2 - 1))(clamp(x + q._1 / 8, w / 2 - 1))
        }
        add(f)
        val na = math.abs(qA._1) + math.abs(qA._2)
        val nb = math.abs(qB._1) + math.abs(qB._2)
        for (my <- 0 until mbH; mx <- 0 until mbW; sb <- 0 until 4)
          mvAbs += (H264.synthSubKind(seed, mx, my, sb) match {
            case 0 => na
            case 3 => 2L * (na + nb)
            case _ => na + nb
          })
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.mvAbsSum == mvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $mvAbs")
    }
  }

  test("B-partition decode equals an independent per-(mode, half) simulation") {
    // every stream's kind lattice (mod 21) covers B_L0/L1/Bi_16x16
    // plus all eighteen two-partition types; nf=4 chains a second B
    // frame off (B, P) references
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264BParts(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var l2: Array[Array[Int]] = null
      var cb2: Array[Array[Int]] = null; var cr2: Array[Array[Int]] = null
      var wl = 0L; var wc = 0L; var ww2 = 0L; var mvAbs = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      // frame 1: P, constant qp1
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      def shiftBy(src: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = src.length; val wwp = src(0).length
        Array.tabulate(hh, wwp)((y, x) =>
          src(clamp(y + dy, hh - 1))(clamp(x + dx, wwp - 1)))
      }
      l2 = l; cb2 = cbP; cr2 = crP
      l = shiftBy(l, qp1._1 / 4, qp1._2 / 4)
      cbP = shiftBy(cbP, qp1._1 / 8, qp1._2 / 8)
      crP = shiftBy(crP, qp1._1 / 8, qp1._2 / 8)
      add(1)
      mvAbs += mbW.toLong * mbH * (math.abs(qp1._1) + math.abs(qp1._2))
      for (f <- 2 until nf) {
        val q0 = Array(H264.synthBiQ0(seed, f), H264.synthBPartQ0b(seed, f))
        val q1 = Array(H264.synthBiQ1(seed, f), H264.synthBPartQ1b(seed, f))
        // per-pixel (mode, part) from the kind lattice
        def sel(blk: Int)(x: Int, y: Int): (Int, Int) = { // (mode, part)
          val t = H264.synthBPartType(seed, f, x / blk, y / blk)
          if (t <= 3) (t - 1, 0)
          else {
            val pm = H264.bPartModes((t - 4) / 2)
            val part = if ((t - 4) % 2 == 0) (y % blk) / (blk / 2)
              else (x % blk) / (blk / 2)
            (if (part == 0) pm._1 else pm._2, part)
          }
        }
        def predict(prev: Array[Array[Int]], prev2: Array[Array[Int]],
            blk: Int, div: Int) = {
          val hh = prev.length; val wwp = prev(0).length
          Array.tabulate(hh, wwp) { (y, x) =>
            val (mode, part) = sel(blk)(x, y)
            def s(src: Array[Array[Int]], q: (Int, Int)) =
              src(clamp(y + q._2 / div, hh - 1))(clamp(x + q._1 / div, wwp - 1))
            mode match {
              case 0 => s(prev, q0(part))
              case 1 => s(prev2, q1(part))
              case _ => (s(prev, q0(part)) + s(prev2, q1(part)) + 1) >> 1
            }
          }
        }
        val nl = predict(l, l2, 16, 4)
        val nc = predict(cbP, cb2, 8, 8)
        val nr = predict(crP, cr2, 8, 8)
        l2 = l; cb2 = cbP; cr2 = crP
        l = nl; cbP = nc; crP = nr
        add(f)
        for (my <- 0 until mbH; mx <- 0 until mbW) {
          val t = H264.synthBPartType(seed, f, mx, my)
          def n(q: (Int, Int)) = math.abs(q._1) + math.abs(q._2)
          mvAbs += (if (t <= 3) {
            (if (t != 2) n(q0(0)) else 0) + (if (t != 1) n(q1(0)) else 0)
          } else {
            val pm = H264.bPartModes((t - 4) / 2)
            def c(mode: Int, part: Int) = mode match {
              case 0 => n(q0(part)); case 1 => n(q1(part))
              case _ => n(q0(part)) + n(q1(part))
            }
            c(pm._1, 0) + c(pm._2, 1)
          })
        }
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.mvAbsSum == mvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $mvAbs")
    }
  }

  test("B-partition + residual decode equals MC + pinned residual + clip") {
    // whole-MB cbp-15 luma residuals (mod-2 lattice, q150 pinned IDCT
    // columns) layered over partitioned B prediction
    val resCols = Array(
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264BPartsRes(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      assert(m.nLevels > 0, s"seed=$seed must actually decode residual levels")
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def clip255(v: Int) = math.min(math.max(v, 0), 255)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var l2: Array[Array[Int]] = null
      var cb2: Array[Array[Int]] = null; var cr2: Array[Array[Int]] = null
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      def shiftBy(src: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = src.length; val wwp = src(0).length
        Array.tabulate(hh, wwp)((y, x) =>
          src(clamp(y + dy, hh - 1))(clamp(x + dx, wwp - 1)))
      }
      l2 = l; cb2 = cbP; cr2 = crP
      l = shiftBy(l, qp1._1 / 4, qp1._2 / 4)
      cbP = shiftBy(cbP, qp1._1 / 8, qp1._2 / 8)
      crP = shiftBy(crP, qp1._1 / 8, qp1._2 / 8)
      add(1)
      for (f <- 2 until nf) {
        val q0 = Array(H264.synthBiQ0(seed, f), H264.synthBPartQ0b(seed, f))
        val q1 = Array(H264.synthBiQ1(seed, f), H264.synthBPartQ1b(seed, f))
        def sel(blk: Int)(x: Int, y: Int): (Int, Int) = {
          val t = H264.synthBPartType(seed, f, x / blk, y / blk)
          if (t <= 3) (t - 1, 0)
          else {
            val pm = H264.bPartModes((t - 4) / 2)
            val part = if ((t - 4) % 2 == 0) (y % blk) / (blk / 2)
              else (x % blk) / (blk / 2)
            (if (part == 0) pm._1 else pm._2, part)
          }
        }
        def predict(prev: Array[Array[Int]], prev2: Array[Array[Int]],
            blk: Int, div: Int) = {
          val hh = prev.length; val wwp = prev(0).length
          Array.tabulate(hh, wwp) { (y, x) =>
            val (mode, part) = sel(blk)(x, y)
            def s(src: Array[Array[Int]], q: (Int, Int)) =
              src(clamp(y + q._2 / div, hh - 1))(clamp(x + q._1 / div, wwp - 1))
            mode match {
              case 0 => s(prev, q0(part))
              case 1 => s(prev2, q1(part))
              case _ => (s(prev, q0(part)) + s(prev2, q1(part)) + 1) >> 1
            }
          }
        }
        val mc = predict(l, l2, 16, 4)
        val nl = Array.tabulate(h, w) { (y, x) =>
          if (H264.synthHasResidual(seed, f, x / 16, y / 16))
            clip255(mc(y)(x) +
              resCols(H264.synthResidualK(seed, f, x / 4, y / 4))(x % 4))
          else mc(y)(x)
        }
        val nc = predict(cbP, cb2, 8, 8)
        val nr = predict(crP, cr2, 8, 8)
        l2 = l; cb2 = cbP; cr2 = crP
        l = nl; cbP = nc; crP = nr
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("B_8x8 sub-partition decode equals an independent per-region simulation") {
    // every MB is B_8x8 with all twelve non-direct Table 7-18
    // sub-types across the lattice; qB regions are the 8x4 bottom,
    // 4x8 right and 4x4 anti-diagonal, per list
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264BSubParts(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var l2: Array[Array[Int]] = null
      var cb2: Array[Array[Int]] = null; var cr2: Array[Array[Int]] = null
      var wl = 0L; var wc = 0L; var ww2 = 0L; var mvAbs = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      def shiftBy(src: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = src.length; val wwp = src(0).length
        Array.tabulate(hh, wwp)((y, x) =>
          src(clamp(y + dy, hh - 1))(clamp(x + dx, wwp - 1)))
      }
      l2 = l; cb2 = cbP; cr2 = crP
      l = shiftBy(l, qp1._1 / 4, qp1._2 / 4)
      cbP = shiftBy(cbP, qp1._1 / 8, qp1._2 / 8)
      crP = shiftBy(crP, qp1._1 / 8, qp1._2 / 8)
      add(1)
      mvAbs += mbW.toLong * mbH * (math.abs(qp1._1) + math.abs(qp1._2))
      for (f <- 2 until nf) {
        val qA = Array(H264.synthBiQ0(seed, f), H264.synthBiQ1(seed, f))
        val qB = Array(H264.synthBPartQ0b(seed, f), H264.synthBPartQ1b(seed, f))
        def mode(k: Int): Int =
          if (k == 1 || k == 4 || k == 5 || k == 10) 0
          else if (k == 2 || k == 6 || k == 7 || k == 11) 1
          else 2
        def isQb(k: Int, sx: Int, sy: Int, half: Int): Boolean = k match {
          case 4 | 6 | 8 => sy >= half
          case 5 | 7 | 9 => sx >= half
          case 10 | 11 | 12 => (sx >= half) != (sy >= half)
          case _ => false
        }
        def predict(prev: Array[Array[Int]], prev2: Array[Array[Int]],
            blk: Int, div: Int) = {
          val hh = prev.length; val wwp = prev(0).length
          val half = blk / 4
          Array.tabulate(hh, wwp) { (y, x) =>
            val sb = 2 * ((y % blk) / (blk / 2)) + (x % blk) / (blk / 2)
            val k = H264.synthBSubKind(seed, f, x / blk, y / blk, sb)
            val qb = isQb(k, x % (blk / 2), y % (blk / 2), half)
            def s(src: Array[Array[Int]], li: Int) = {
              val q = if (qb) qB(li) else qA(li)
              src(clamp(y + q._2 / div, hh - 1))(clamp(x + q._1 / div, wwp - 1))
            }
            mode(k) match {
              case 0 => s(prev, 0)
              case 1 => s(prev2, 1)
              case _ => (s(prev, 0) + s(prev2, 1) + 1) >> 1
            }
          }
        }
        val nl = predict(l, l2, 16, 4)
        val nc = predict(cbP, cb2, 8, 8)
        val nr = predict(crP, cr2, 8, 8)
        l2 = l; cb2 = cbP; cr2 = crP
        l = nl; cbP = nc; crP = nr
        add(f)
        for (my <- 0 until mbH; mx <- 0 until mbW; sb <- 0 until 4) {
          val k = H264.synthBSubKind(seed, f, mx, my, sb)
          def n(q: (Int, Int)) = math.abs(q._1) + math.abs(q._2)
          def listSum(li: Int): Long = k match {
            case 1 | 2 | 3 => n(qA(li))
            case 10 | 11 | 12 => 2L * (n(qA(li)) + n(qB(li)))
            case _ => n(qA(li)) + n(qB(li))
          }
          if (mode(k) != 1) mvAbs += listSum(0)
          if (mode(k) != 0) mvAbs += listSum(1)
        }
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.mvAbsSum == mvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $mvAbs")
    }
  }

  test("weighted-bipred B-partition decode equals an independent simulation") {
    // the q184 lattice under weighted_bipred_idc 1: single-list
    // partitions scale/offset with their list's entry, Bi partitions
    // run the two-list weighted combine
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 2).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264WBiParts(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.nSkipped == 0)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def clip255(v: Int) = math.min(math.max(v, 0), 255)
      var l = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cbP = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var crP = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var l2: Array[Array[Int]] = null
      var cb2: Array[Array[Int]] = null; var cr2: Array[Array[Int]] = null
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cbP.foreach(_.foreach(fc += _)); crP.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      def shiftBy(src: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = src.length; val wwp = src(0).length
        Array.tabulate(hh, wwp)((y, x) =>
          src(clamp(y + dy, hh - 1))(clamp(x + dx, wwp - 1)))
      }
      l2 = l; cb2 = cbP; cr2 = crP
      l = shiftBy(l, qp1._1 / 4, qp1._2 / 4)
      cbP = shiftBy(cbP, qp1._1 / 8, qp1._2 / 8)
      crP = shiftBy(crP, qp1._1 / 8, qp1._2 / 8)
      add(1)
      for (f <- 2 until nf) {
        val q0 = Array(H264.synthBiQ0(seed, f), H264.synthBPartQ0b(seed, f))
        val q1 = Array(H264.synthBiQ1(seed, f), H264.synthBPartQ1b(seed, f))
        val (ld, lw0, lo0) = H264.synthWtLumaR(seed, f, 0)
        val (_, lw1, lo1) = H264.synthWtLumaR(seed, f, 1)
        val (_, cbw0, cbo0, crw0, cro0) = H264.synthWtChromaR(seed, f, 0)
        val (_, cbw1, cbo1, crw1, cro1) = H264.synthWtChromaR(seed, f, 1)
        def sel(blk: Int)(x: Int, y: Int): (Int, Int) = {
          val t = H264.synthBPartType(seed, f, x / blk, y / blk)
          if (t <= 3) (t - 1, 0)
          else {
            val pm = H264.bPartModes((t - 4) / 2)
            val part = if ((t - 4) % 2 == 0) (y % blk) / (blk / 2)
              else (x % blk) / (blk / 2)
            (if (part == 0) pm._1 else pm._2, part)
          }
        }
        // per-plane weight entries: (w0, o0, w1, o1, denom)
        def predict(prev: Array[Array[Int]], prev2: Array[Array[Int]],
            blk: Int, div: Int, w0: Int, o0: Int, w1: Int, o1: Int, d: Int) = {
          val hh = prev.length; val wwp = prev(0).length
          Array.tabulate(hh, wwp) { (y, x) =>
            val (mode, part) = sel(blk)(x, y)
            def s(src: Array[Array[Int]], q: (Int, Int)) =
              src(clamp(y + q._2 / div, hh - 1))(clamp(x + q._1 / div, wwp - 1))
            mode match {
              case 0 => clip255(((s(prev, q0(part)) * w0 + (1 << (d - 1))) >> d) + o0)
              case 1 => clip255(((s(prev2, q1(part)) * w1 + (1 << (d - 1))) >> d) + o1)
              case _ => clip255(
                ((s(prev, q0(part)) * w0 + s(prev2, q1(part)) * w1 + (1 << d))
                  >> (d + 1)) + ((o0 + o1 + 1) >> 1))
            }
          }
        }
        val nl = predict(l, l2, 16, 4, lw0, lo0, lw1, lo1, ld)
        val nc = predict(cbP, cb2, 8, 8, cbw0, cbo0, cbw1, cbo1, 1)
        val nr = predict(crP, cr2, 8, 8, crw0, cro0, crw1, cro1, 1)
        l2 = l; cb2 = cbP; cr2 = crP
        l = nl; cbP = nc; crP = nr
        add(f)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma ${m.chromaSum} vs $wc")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
    }
  }

  test("diagonal intra decode equals an independent reconstruction") {
    // full in-subset mode set (V/H/DC/DDL/DDR) with the q150 AC
    // residual columns; the sim independently implements the
    // prediction equations INCLUDING the decode-order top-right
    // availability test and the p[3,-1] substitution
    val resCols = Array(
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    val zs = Array(
      (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))
    val zInv = { val a = new Array[Int](16)
      zs.zipWithIndex.foreach { case ((x, y), i) => a(y * 4 + x) = i }; a }
    for (seed <- 0L until 12L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = 16; val h = 16 * mbH
      val m = H264.decodeCavlcIntra(
        H264.synthesizeH264IntraDiag(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == w && m.height == h)
      def clip255(v: Int) = math.min(math.max(v, 0), 255)
      var wl = 0L; var wc = 0L; var ww2 = 0L; var nLev = 0L
      for (f <- 0 until nf) {
        val luma = Array.fill(h, w)(0)
        for (my <- 0 until mbH; i <- 0 until 16) {
          val (zx, zy) = zs(i)
          val (bx, by) = (zx, my * 4 + zy)
          val px = bx * 4; val py = by * 4
          val mode = H264.synthDiagMode(seed)(bx, by)
          val k = ((seed + f * 11 + bx * 7 + by * 5) % 4).toInt
          nLev += (if (k == 0) 1 else 2)
          // top-right availability in decode order (bW = 4, mbW = 1)
          val trAvail = by > 0 && bx + 1 < 4 && {
            val nMb = (by - 1) / 4
            nMb < my || (nMb == my && zInv(((by - 1) % 4) * 4 + bx + 1) < i)
          }
          def tS(kk: Int): Int =
            if (kk < 0) luma(py - 1)(px - 1)
            else if (kk <= 3 || trAvail) luma(py - 1)(px + kk)
            else luma(py - 1)(px + 3)
          def lS(kk: Int): Int =
            if (kk < 0) luma(py - 1)(px - 1) else luma(py + kk)(px - 1)
          for (y <- 0 until 4; x <- 0 until 4) {
            val pred = mode match {
              case 0 => luma(py - 1)(px + x)
              case 1 => luma(py + y)(px - 1)
              case 3 =>
                if (x == 3 && y == 3) (tS(6) + 3 * tS(7) + 2) >> 2
                else (tS(x + y) + 2 * tS(x + y + 1) + tS(x + y + 2) + 2) >> 2
              case 4 =>
                if (x > y) (tS(x - y - 2) + 2 * tS(x - y - 1) + tS(x - y) + 2) >> 2
                else if (x < y)
                  (lS(y - x - 2) + 2 * lS(y - x - 1) + lS(y - x) + 2) >> 2
                else (tS(0) + 2 * tS(-1) + lS(0) + 2) >> 2
              case _ =>
                val hasL = px > 0; val hasT = py > 0
                if (hasL && hasT)
                  ((0 until 4).map(kk => luma(py + kk)(px - 1)
                    + luma(py - 1)(px + kk)).sum + 4) >> 3
                else if (hasL)
                  ((0 until 4).map(kk => luma(py + kk)(px - 1)).sum + 2) >> 2
                else if (hasT)
                  ((0 until 4).map(kk => luma(py - 1)(px + kk)).sum + 2) >> 2
                else 128
            }
            luma(py + y)(px + x) = clip255(pred + resCols(k)(x))
          }
        }
        var fl = 0L; luma.foreach(_.foreach(fl += _))
        val fc = 128L * (h / 2) * (w / 2) * 2 // residual-free chroma: DC 128
        wl += fl; wc += fc; ww2 += (f + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.nLevels == nLev, s"seed=$seed nLevels ${m.nLevels} vs $nLev")
    }
  }

  test("angular intra modes 5-8 match hand-derived prediction matrices") {
    // fixed neighborhood: top p[k,-1] = 10(k+1) for k = 0..7, corner
    // p[-1,-1] = 5, left p[-1,k] = 12(k+1) for k = 0..3 — every value
    // below is worked by hand from §8.3.1.2.6-.9
    val top = Array(10, 20, 30, 40, 50, 60, 70, 80)
    val left = Array(12, 24, 36, 48)
    def tS(k: Int): Int = if (k < 0) 5 else top(k)
    def lS(k: Int): Int = if (k < 0) 5 else left(k)
    val expected = Map(
      5 -> Array( // vertical-right
        Array(8, 15, 25, 35),
        Array(8, 11, 20, 30),
        Array(13, 8, 15, 25),
        Array(24, 8, 11, 20)),
      6 -> Array( // horizontal-down
        Array(9, 8, 11, 20),
        Array(18, 13, 9, 8),
        Array(30, 24, 18, 13),
        Array(42, 36, 30, 24)),
      7 -> Array( // vertical-left
        Array(15, 25, 35, 45),
        Array(20, 30, 40, 50),
        Array(25, 35, 45, 55),
        Array(30, 40, 50, 60)),
      8 -> Array( // horizontal-up
        Array(18, 24, 30, 36),
        Array(30, 36, 42, 45),
        Array(42, 45, 48, 48),
        Array(48, 48, 48, 48)))
    for (mode <- Seq(5, 6, 7, 8); y <- 0 until 4; x <- 0 until 4)
      assert(H264.intra4x4PredPx(mode, x, y, tS, lS, true, true) ==
        expected(mode)(y)(x), s"mode=$mode x=$x y=$y")
  }

  test("constant neighborhoods are fixed points of every intra 4x4 mode") {
    // all the §8.3.1.2 interpolators are affine with weights summing
    // to the rounding divisor, so a flat neighborhood must predict
    // itself exactly — a transcription error in any tap breaks this
    for (c <- Seq(0, 37, 255); mode <- 0 to 8; y <- 0 until 4; x <- 0 until 4)
      assert(H264.intra4x4PredPx(mode, x, y, _ => c, _ => c, true, true) == c,
        s"c=$c mode=$mode x=$x y=$y")
  }

  test("full-mode intra decode equals an independent reconstruction") {
    // all NINE §8.3.1.2 modes composed in-stream; the sim re-derives
    // the angular equations from the diagonal-index form (zVR/zHD/zHU
    // written as explicit case tables, not the decoder's arithmetic)
    val resCols = Array(
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    val zs = Array(
      (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))
    val zInv = { val a = new Array[Int](16)
      zs.zipWithIndex.foreach { case ((x, y), i) => a(y * 4 + x) = i }; a }
    for (seed <- 0L until 12L) {
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + (seed % 2).toInt
      val w = 16; val h = 16 * mbH
      val m = H264.decodeCavlcIntra(
        H264.synthesizeH264IntraFull(mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == w && m.height == h)
      def clip255(v: Int) = math.min(math.max(v, 0), 255)
      var wl = 0L; var wc = 0L; var ww2 = 0L; var nLev = 0L
      for (f <- 0 until nf) {
        val luma = Array.fill(h, w)(0)
        for (my <- 0 until mbH; i <- 0 until 16) {
          val (zx, zy) = zs(i)
          val (bx, by) = (zx, my * 4 + zy)
          val px = bx * 4; val py = by * 4
          val mode = H264.synthFullMode(seed)(bx, by)
          val k = ((seed + f * 11 + bx * 7 + by * 5) % 4).toInt
          nLev += (if (k == 0) 1 else 2)
          val trAvail = by > 0 && bx + 1 < 4 && {
            val nMb = (by - 1) / 4
            nMb < my || (nMb == my && zInv(((by - 1) % 4) * 4 + bx + 1) < i)
          }
          def tS(kk: Int): Int =
            if (kk < 0) luma(py - 1)(px - 1)
            else if (kk <= 3 || trAvail) luma(py - 1)(px + kk)
            else luma(py - 1)(px + 3)
          def lS(kk: Int): Int =
            if (kk < 0) luma(py - 1)(px - 1) else luma(py + kk)(px - 1)
          // interpolator helpers: 2-tap rounding average along a
          // sample walk, 3-tap [1 2 1] filter
          def avg2(a: Int, b: Int) = (a + b + 1) >> 1
          def f121(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2
          for (y <- 0 until 4; x <- 0 until 4) {
            val pred = mode match {
              case 0 => luma(py - 1)(px + x)
              case 1 => luma(py + y)(px - 1)
              case 3 =>
                if (x == 3 && y == 3) (tS(6) + 3 * tS(7) + 2) >> 2
                else f121(tS(x + y), tS(x + y + 1), tS(x + y + 2))
              case 4 =>
                if (x > y) f121(tS(x - y - 2), tS(x - y - 1), tS(x - y))
                else if (x < y) f121(lS(y - x - 2), lS(y - x - 1), lS(y - x))
                else f121(tS(0), tS(-1), lS(0))
              case 5 => (2 * x - y) match {
                case 0 | 2 | 4 | 6 => avg2(tS(x - (y >> 1) - 1), tS(x - (y >> 1)))
                case 1 | 3 | 5 =>
                  f121(tS(x - (y >> 1) - 2), tS(x - (y >> 1) - 1), tS(x - (y >> 1)))
                case -1 => f121(lS(0), tS(-1), tS(0))
                case _ => f121(lS(y - 1), lS(y - 2), lS(y - 3))
              }
              case 6 => (2 * y - x) match {
                case 0 | 2 | 4 | 6 => avg2(lS(y - (x >> 1) - 1), lS(y - (x >> 1)))
                case 1 | 3 | 5 =>
                  f121(lS(y - (x >> 1) - 2), lS(y - (x >> 1) - 1), lS(y - (x >> 1)))
                case -1 => f121(lS(0), tS(-1), tS(0))
                case _ => f121(tS(x - 1), tS(x - 2), tS(x - 3))
              }
              case 7 =>
                if ((y & 1) == 0) avg2(tS(x + (y >> 1)), tS(x + (y >> 1) + 1))
                else f121(tS(x + (y >> 1)), tS(x + (y >> 1) + 1), tS(x + (y >> 1) + 2))
              case 8 => (x + 2 * y) match {
                case 0 | 2 | 4 => avg2(lS(y + (x >> 1)), lS(y + (x >> 1) + 1))
                case 1 | 3 =>
                  f121(lS(y + (x >> 1)), lS(y + (x >> 1) + 1), lS(y + (x >> 1) + 2))
                case 5 => (lS(2) + 3 * lS(3) + 2) >> 2
                case _ => lS(3)
              }
              case _ =>
                val hasL = px > 0; val hasT = py > 0
                if (hasL && hasT)
                  ((0 until 4).map(kk => luma(py + kk)(px - 1)
                    + luma(py - 1)(px + kk)).sum + 4) >> 3
                else if (hasL)
                  ((0 until 4).map(kk => luma(py + kk)(px - 1)).sum + 2) >> 2
                else if (hasT)
                  ((0 until 4).map(kk => luma(py - 1)(px + kk)).sum + 2) >> 2
                else 128
            }
            luma(py + y)(px + x) = clip255(pred + resCols(k)(x))
          }
        }
        var fl = 0L; luma.foreach(_.foreach(fl += _))
        val fc = 128L * (h / 2) * (w / 2) * 2
        wl += fl; wc += fc; ww2 += (f + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.nLevels == nLev, s"seed=$seed nLevels ${m.nLevels} vs $nLev")
    }
  }

  test("luma DC Hadamard + dequant matches hand-derived and matrix-multiply sims") {
    // hand-derived at qp 24 (v = 10): a lone DC level 2 spreads to
    // every block as (2*160 + 2) >> 2 = 80; the [1, -1] pair lights
    // only block columns 2..3 (f(i,j) = 1 - T(j,1) in {0, 2})
    val lone = new Array[Int](16); lone(0) = 2
    assert(H264.lumaDcDequantForSpec(lone, 24).forall(_ == 80))
    val pair = new Array[Int](16); pair(0) = 1; pair(1) = -1
    val got = H264.lumaDcDequantForSpec(pair, 24)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(got(i * 4 + j) == (if (j >= 2) 80 else 0), s"($i,$j)")
    // independent simulation: explicit T * C * T' with the spec's
    // rounding arm selection, random inputs across qp
    val T = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    def sim(c: Array[Int], qp: Int): Array[Int] = {
      val v = Array(10, 11, 13, 14, 16, 18)(qp % 6)
      val out = new Array[Int](16)
      for (i <- 0 until 4; j <- 0 until 4) {
        var f = 0
        for (k <- 0 until 4; l <- 0 until 4)
          f += T(i)(k) * c(k * 4 + l) * T(j)(l)
        val ls = f * v * 16
        out(i * 4 + j) =
          if (qp >= 36) ls << (qp / 6 - 6)
          else (ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      }
      out
    }
    val rnd = new scala.util.Random(191)
    for (qp <- Seq(18, 24, 30, 36, 40); _ <- 0 until 30) {
      val c = Array.fill(16)(if (rnd.nextInt(3) == 0) rnd.nextInt(9) - 4 else 0)
      assert(H264.lumaDcDequantForSpec(c, qp).sameElements(sim(c, qp)),
        s"qp=$qp c=${c.mkString(",")}")
    }
  }

  test("intra 16x16 prediction: plane-mode hand values and constant fixed points") {
    // ramp neighborhood p[x,-1] = 10 + 2x, p[-1,y] = 20 + 3y, corner
    // 7: worked by hand through §8.3.2.4, H = 824, V = 1304,
    // a = 1680, b = 64, c = 102
    def tS(k: Int): Int = if (k < 0) 7 else 10 + 2 * k
    def lS(k: Int): Int = if (k < 0) 7 else 20 + 3 * k
    val plane = H264.intra16Pred(3, tS, lS, true, true)
    for (((x, y), want) <- Seq((0, 0) -> 16, (15, 15) -> 94, (7, 7) -> 53,
        (15, 0) -> 46, (0, 15) -> 64))
      assert(plane(y * 16 + x) == want, s"plane($x,$y)")
    // vertical/horizontal copy their rails; DC is the rounded mean
    val v = H264.intra16Pred(0, tS, lS, true, true)
    val hP = H264.intra16Pred(1, tS, lS, true, true)
    assert((0 until 16).forall(x => v(5 * 16 + x) == 10 + 2 * x))
    assert((0 until 16).forall(y => hP(y * 16 + 9) == 20 + 3 * y))
    val dcWant = ((0 until 16).map(k => 10 + 2 * k + 20 + 3 * k).sum + 16) >> 5
    assert(H264.intra16Pred(2, tS, lS, true, true).forall(_ == dcWant))
    // every mode is a fixed point on flat neighborhoods
    for (c <- Seq(0, 37, 255); mode <- 0 to 3)
      assert(H264.intra16Pred(mode, _ => c, _ => c, true, true).forall(_ == c),
        s"c=$c mode=$mode")
  }

  test("mixed I_16x16 / I_4x4 decode equals an independent reconstruction") {
    // the sim re-walks the mixed stream from the lattices alone:
    // matrix-multiply Hadamard, spec-text dequant + two-pass IDCT
    // with preset DC, direct-formula §8.3.2 prediction, and the
    // §8.3.1.2 equations of the q190 test for the I_4x4 MBs
    val zig = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
    val vt = Array(Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
      Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
    val T = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    val qp = 24
    // dequant scan positions 1..15 + preset DC, two explicit passes
    def idctPreset(dc: Int, ac15: Array[Int]): Array[Int] = {
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = dc
      for (s <- 1 until 16) {
        val r = zig(s); val i = r / 4; val j = r % 4
        val cls = if (i % 2 == 0 && j % 2 == 0) 0
                  else if (i % 2 == 1 && j % 2 == 1) 1 else 2
        d(i)(j) = (ac15(s - 1) * vt(qp % 6)(cls) * 16) << (qp / 6 - 4)
      }
      val e = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4) {
        val (a, b, c, dd) = (d(i)(0), d(i)(1), d(i)(2), d(i)(3))
        e(i)(0) = (a + c) + (b + (dd >> 1)); e(i)(1) = (a - c) + ((b >> 1) - dd)
        e(i)(2) = (a - c) - ((b >> 1) - dd); e(i)(3) = (a + c) - (b + (dd >> 1))
      }
      val f = Array.ofDim[Int](4, 4)
      for (j <- 0 until 4) {
        val (a, b, c, dd) = (e(0)(j), e(1)(j), e(2)(j), e(3)(j))
        f(0)(j) = (a + c) + (b + (dd >> 1)); f(1)(j) = (a - c) + ((b >> 1) - dd)
        f(2)(j) = (a - c) - ((b >> 1) - dd); f(3)(j) = (a + c) - (b + (dd >> 1))
      }
      (for (i <- 0 until 4; j <- 0 until 4) yield (f(i)(j) + 32) >> 6).toArray
    }
    def lumaDc(c16: Array[Int]): Array[Int] = {
      val out = new Array[Int](16)
      for (i <- 0 until 4; j <- 0 until 4) {
        var f = 0
        for (k <- 0 until 4; l <- 0 until 4)
          f += T(i)(k) * c16(k * 4 + l) * T(j)(l)
        out(i * 4 + j) = (f * 10 * 16 + 2) >> 2 // qp 24 arm
      }
      out
    }
    val resCols = Array( // q150's pinned I_4x4 residual columns
      Array(5, 5, 5, 5), Array(1, -1, -4, -6),
      Array(0, 5, 5, 0), Array(2, 5, -5, -2))
    val zs = Array(
      (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))
    val zInv = { val a = new Array[Int](16)
      zs.zipWithIndex.foreach { case ((x, y), i) => a(y * 4 + x) = i }; a }
    def clip255(v: Int) = math.min(math.max(v, 0), 255)
    for (seed <- 0L until 10L) {
      val mbW = 2 + (seed % 2).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 2 + ((seed / 2) % 2).toInt
      val w = 16 * mbW; val h = 16 * mbH
      val m = H264.decodeCavlcIntra(
        H264.synthesizeH264Intra16(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf && m.width == w && m.height == h)
      var wl = 0L; var wc = 0L; var ww2 = 0L; var nLev = 0L
      for (f <- 0 until nf) {
        val luma = Array.fill(h, w)(0)
        for (my <- 0 until mbH; mx <- 0 until mbW) {
          val kind = H264.synthMbKind(seed)(f, mx, my)
          val px0 = mx * 16; val py0 = my * 16
          if (kind == 0) {
            for (i <- 0 until 16) {
              val (zx, zy) = zs(i)
              val (bx, by) = (mx * 4 + zx, my * 4 + zy)
              val px = bx * 4; val py = by * 4
              val mode =
                if (bx == 0 && by == 0) 2
                else if (by == 0) Array(1, 2, 8)(((seed + bx) % 3).toInt)
                else if (bx == 0) Array(0, 2, 3, 7)(((seed + by) % 4).toInt)
                else ((seed + 3L * bx + 7L * by) % 9).toInt
              val k = ((seed + f * 11 + bx * 7 + by * 5) % 4).toInt
              nLev += (if (k == 0) 1 else 2)
              val trAvail = by > 0 && bx + 1 < mbW * 4 && {
                val nMb = ((by - 1) / 4) * mbW + (bx + 1) / 4
                val here = my * mbW + mx
                nMb < here || (nMb == here &&
                  zInv(((by - 1) % 4) * 4 + (bx + 1) % 4) < i)
              }
              def tS(kk: Int): Int =
                if (kk < 0) luma(py - 1)(px - 1)
                else if (kk <= 3 || trAvail) luma(py - 1)(px + kk)
                else luma(py - 1)(px + 3)
              def lS(kk: Int): Int =
                if (kk < 0) luma(py - 1)(px - 1) else luma(py + kk)(px - 1)
              for (y <- 0 until 4; x <- 0 until 4) {
                val pred = H264.intra4x4PredPx(mode, x, y, tS, lS, px > 0, py > 0)
                luma(py + y)(px + x) = clip255(pred + resCols(k)(x))
              }
            }
          } else {
            val i16Mode = H264.synthI16Mode(seed)(f, mx, my)
            val k2 = ((seed + f * 11 + mx * 7 + my * 5) % 2).toInt
            nLev += (if (k2 == 0) 1 else 2)
            val dcScan = new Array[Int](16)
            if (k2 == 0) dcScan(0) = 2 else { dcScan(0) = 1; dcScan(1) = -1 }
            val dcRaster = new Array[Int](16)
            for (s <- 0 until 16) dcRaster(zig(s)) = dcScan(s)
            val dcY = lumaDc(dcRaster)
            def tS(kk: Int): Int =
              if (kk < 0) luma(py0 - 1)(px0 - 1) else luma(py0 - 1)(px0 + kk)
            def lS(kk: Int): Int =
              if (kk < 0) luma(py0 - 1)(px0 - 1) else luma(py0 + kk)(px0 - 1)
            val pred = H264.intra16Pred(i16Mode, tS, lS, px0 > 0, py0 > 0)
            for (i <- 0 until 16) {
              val (zx, zy) = zs(i)
              val dc = dcY(zy * 4 + zx)
              val res =
                if (kind == 1) Array.fill(16)((dc + 32) >> 6)
                else {
                  val (bx, by) = (mx * 4 + zx, my * 4 + zy)
                  val k3 = ((seed + f * 11 + bx * 7 + by * 5) % 4).toInt
                  nLev += (if (k3 == 0) 1 else 2)
                  val ac = new Array[Int](15)
                  k3 match {
                    case 0 => ac(0) = 2
                    case 1 => ac(0) = -1; ac(1) = 1
                    case 2 => ac(0) = 1; ac(4) = -1
                    case _ => ac(1) = 1; ac(5) = -1
                  }
                  idctPreset(dc, ac)
                }
              for (y <- 0 until 4; x <- 0 until 4)
                luma(py0 + zy * 4 + y)(px0 + zx * 4 + x) =
                  clip255(pred((zy * 4 + y) * 16 + zx * 4 + x) + res(y * 4 + x))
            }
          }
        }
        var fl = 0L; luma.foreach(_.foreach(fl += _))
        val fc = 128L * (h / 2) * (w / 2) * 2
        wl += fl; wc += fc; ww2 += (f + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.nLevels == nLev, s"seed=$seed nLevels ${m.nLevels} vs $nLev")
    }
  }

  test("inter decode of an all-I_PCM stream matches decodeIPcm (P machinery dormant)") {
    val p = H264.synthesizeH264IPcm(2, 2, 2, 9L)
    val a = H264.decodeInter(p).get
    val b = H264.decodeIPcm(p).get
    assert(a.lumaSum == b.lumaSum && a.chromaSum == b.chromaSum &&
      a.weightedSum == b.weightedSum && a.nSkipped == 0 && a.mvAbsSum == 0)
  }

  test("all-direct B streams (B_Skip + B_Direct_16x16) equal the two-frame-average simulation") {
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val nf = 3 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val m = H264.decodeInter(H264.synthesizeH264BDirect(mbW, mbH, nf, seed)).get
      assert(m.nFrames == nf)
      // every direct mv derives to zero here, so each B frame is the
      // exact per-pixel (a + b + 1) >> 1 of its two predecessors
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int, hh: Int, ww: Int) =
        Array.tabulate(hh, ww)((y, x) => p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      var l1 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      var cb1 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      var cr1 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      var wl = 0L; var wc = 0L; var ww2 = 0L
      def add(fi: Int, l: Array[Array[Int]], cB: Array[Array[Int]],
          cR: Array[Array[Int]]): Unit = {
        var fl = 0L; l.foreach(_.foreach(fl += _))
        var fc = 0L; cB.foreach(_.foreach(fc += _)); cR.foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (fi + 1L) * (fl + fc)
      }
      add(0, l1, cb1, cr1)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      var l0 = l1; var cb0 = cb1; var cr0 = cr1
      var lC = shift(l1, qp1._1 / 4, qp1._2 / 4, h, w)
      var cbC = shift(cb1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      var crC = shift(cr1, qp1._1 / 8, qp1._2 / 8, h / 2, w / 2)
      add(1, lC, cbC, crC)
      var skips = 0L
      for (f <- 2 until nf) {
        def avg(a: Array[Array[Int]], b: Array[Array[Int]]) =
          Array.tabulate(a.length, a(0).length)((y, x) => (a(y)(x) + b(y)(x) + 1) >> 1)
        val nl = avg(lC, l0)
        val ncb = avg(cbC, cb0); val ncr = avg(crC, cr0)
        add(f, nl, ncb, ncr)
        for (my <- 0 until mbH; mx <- 0 until mbW)
          if (!H264.synthBDirCoded(seed, f, mx, my)) skips += 1
        l0 = lC; cb0 = cbC; cr0 = crC
        lC = nl; cbC = ncb; crC = ncr
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      assert(m.nSkipped == skips, s"seed=$seed skips ${m.nSkipped} vs $skips")
    }
  }

  test("spatial direct MV derivation matches an independent reimplementation on mixed streams") {
    // the pin the r12 verdict asked for: decode the MIXED family
    // (explicit nonzero-mv B MBs + B_Direct_16x16 + B_Skip + B_8x8
    // with B_Direct_8x8 subs) and compare the decoder's per-4x4
    // motion field of every B frame against a derivation REWRITTEN
    // here from the spec text (min-positive refs, A-only rule,
    // exactly-one-matching-ref rule, component median, per-4x4
    // colZeroFlag) -- no call into the production spatialDirect or
    // predictMvPart
    for (seed <- 0L until 10L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 2 + (seed % 2).toInt
      val nf = 4 + (seed % 3).toInt // >= 2 B frames: colZero goes live
      val bW = 4 * mbW; val bH = 4 * mbH
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val m = H264.decodeInter(
        H264.synthesizeH264BDirectMixed(mbW, mbH, nf, seed), frames += _)
      assert(m.isDefined, s"seed=$seed decode failed")
      assert(m.get.nFrames == nf)
      val qp1 = (8 * (((seed + 1) % 3).toInt - 1), 8 * (((seed + 2) % 3).toInt - 1))
      // independent motion-field simulation
      case class Fld(mvs0: Array[(Int, Int)], refs0: Array[Int],
        mvs1: Array[(Int, Int)], refs1: Array[Int])
      var col: Fld = null // field of frame f-2 (null = intra IDR)
      var prev: Fld = Fld(Array.fill(bW * bH)(qp1), Array.fill(bW * bH)(0),
        Array.fill(bW * bH)((0, 0)), Array.fill(bW * bH)(-1))
      for (f <- 2 until nf) {
        val q0 = H264.synthBiQ0(seed, f); val q1 = H264.synthBiQ1(seed, f)
        val mvs0 = Array.fill(bW * bH)((0, 0)); val refs0 = Array.fill(bW * bH)(-1)
        val mvs1 = Array.fill(bW * bH)((0, 0)); val refs1 = Array.fill(bW * bH)(-1)
        val done = Array.fill(bW * bH)(false)
        def nb(x: Int, y: Int): Option[Int] =
          if (x < 0 || y < 0 || x >= bW || y >= bH || !done(y * bW + x)) None
          else Some(y * bW + x)
        def medPred(mvA: Array[(Int, Int)], rfA: Array[Int],
            bx: Int, by: Int): (Int, Int) = {
          val a = nb(bx - 1, by); val b = nb(bx, by - 1)
          val c = nb(bx + 4, by - 1).orElse(nb(bx - 1, by - 1))
          if (b.isEmpty && c.isEmpty && a.nonEmpty) mvA(a.get)
          else {
            val withRef = Seq(a, b, c).flatten.filter(i => rfA(i) == 0)
            if (withRef.size == 1) mvA(withRef.head)
            else {
              def med(sel: ((Int, Int)) => Int): Int = {
                val vs = Seq(a, b, c).map {
                  case Some(i) if rfA(i) >= 0 => sel(mvA(i))
                  case _ => 0
                }.sorted
                vs(1)
              }
              (med(_._1), med(_._2))
            }
          }
        }
        def deriveSim(bx: Int, by: Int): (Boolean, Boolean, Int => (Int, Int), Int => (Int, Int)) = {
          val a = nb(bx - 1, by); val b = nb(bx, by - 1)
          val c = nb(bx + 4, by - 1).orElse(nb(bx - 1, by - 1))
          def mp(rfA: Array[Int]): Int = {
            val rs = Seq(a, b, c).flatten.map(rfA).filter(_ >= 0)
            if (rs.isEmpty) -1 else rs.min
          }
          val r0 = mp(refs0); val r1 = mp(refs1)
          val zp = r0 < 0 && r1 < 0
          val p0 = if (!zp && r0 == 0) medPred(mvs0, refs0, bx, by) else (0, 0)
          val p1 = if (!zp && r1 == 0) medPred(mvs1, refs1, bx, by) else (0, 0)
          def cz(blk: Int): Boolean = col != null && {
            val i = (by + blk / 4) * bW + bx + blk % 4
            if (col.refs0(i) >= 0)
              col.refs0(i) == 0 && math.abs(col.mvs0(i)._1) <= 1 && math.abs(col.mvs0(i)._2) <= 1
            else if (col.refs1(i) >= 0)
              col.refs1(i) == 0 && math.abs(col.mvs1(i)._1) <= 1 && math.abs(col.mvs1(i)._2) <= 1
            else false
          }
          (zp || r0 == 0, zp || r1 == 0,
            blk => if (zp || cz(blk)) (0, 0) else p0,
            blk => if (zp || cz(blk)) (0, 0) else p1)
        }
        def stamp(mvA: Array[(Int, Int)], rfA: Array[Int],
            bx: Int, by: Int, wB: Int, hB: Int, mv: (Int, Int)): Unit =
          for (yy <- by until by + hB; xx <- bx until bx + wB) {
            mvA(yy * bW + xx) = mv; rfA(yy * bW + xx) = 0; done(yy * bW + xx) = true
          }
        def stampD(d: (Boolean, Boolean, Int => (Int, Int), Int => (Int, Int)),
            mbBx: Int, mbBy: Int, bx: Int, by: Int, wB: Int, hB: Int): Unit =
          for (yy <- by until by + hB; xx <- bx until bx + wB) {
            val blk = (yy - mbBy) * 4 + (xx - mbBx)
            if (d._1) { mvs0(yy * bW + xx) = d._3(blk); refs0(yy * bW + xx) = 0 }
            if (d._2) { mvs1(yy * bW + xx) = d._4(blk); refs1(yy * bW + xx) = 0 }
            done(yy * bW + xx) = true
          }
        for (my <- 0 until mbH; mx <- 0 until mbW) {
          val bx = mx * 4; val by = my * 4
          H264.synthBDirMixKind(seed, f, mx, my) match {
            case 0 | 4 => stampD(deriveSim(bx, by), bx, by, bx, by, 4, 4)
            case 5 =>
              var d: (Boolean, Boolean, Int => (Int, Int), Int => (Int, Int)) = null
              for (sb <- 0 until 4) {
                val sbx = bx + 2 * (sb % 2); val sby = by + 2 * (sb / 2)
                H264.synthBDirMixSub(seed, f, mx, my, sb) match {
                  case 0 =>
                    if (d == null) d = deriveSim(bx, by)
                    stampD(d, bx, by, sbx, sby, 2, 2)
                  case t =>
                    if (t != 2) stamp(mvs0, refs0, sbx, sby, 2, 2, q0)
                    if (t != 1) stamp(mvs1, refs1, sbx, sby, 2, 2, q1)
                }
              }
            case t =>
              if (t != 2) stamp(mvs0, refs0, bx, by, 4, 4, q0)
              if (t != 1) stamp(mvs1, refs1, bx, by, 4, 4, q1)
          }
        }
        // compare against the decoder's collected field for frame f
        val st = frames.find(_.frameIdx == f).get
        assert(st.isB)
        for (i <- 0 until bW * bH) {
          assert(st.refs0(i) == refs0(i), s"seed=$seed f=$f blk=$i refs0 ${st.refs0(i)} vs ${refs0(i)}")
          assert(st.refs1(i) == refs1(i), s"seed=$seed f=$f blk=$i refs1")
          if (refs0(i) >= 0)
            assert(st.mvs0(i) == mvs0(i), s"seed=$seed f=$f blk=$i mv0 ${st.mvs0(i)} vs ${mvs0(i)}")
          if (refs1(i) >= 0)
            assert(st.mvs1(i) == mvs1(i), s"seed=$seed f=$f blk=$i mv1 ${st.mvs1(i)} vs ${mvs1(i)}")
        }
        col = prev
        prev = Fld(mvs0, refs0, mvs1, refs1)
      }
    }
  }

  test("spatial direct derivation edge cases: zero-pred, single-list, refIdx>0 refusal") {
    val bW = 8; val bH = 8
    def empty() = (Array.fill(bW * bH)((0, 0)), Array.fill(bW * bH)(-1),
      Array.fill(bW * bH)((0, 0)), Array.fill(bW * bH)(-1),
      Array.fill(bW * bH)(false))
    // no decoded neighbors: directZeroPrediction -- both lists, mv 0
    locally {
      val (m0, r0, m1, r1, dn) = empty()
      val d = H264.spatialDirect(m0, r0, m1, r1, dn, bW, bH, 0, 0,
        null, null, null, null)
      assert(d._1 && d._2)
      for (b <- 0 until 16) assert(d._3(b) == ((0, 0)) && d._4(b) == ((0, 0)))
    }
    // left neighbor L0-only with mv (8, 0): L0 used (mvp = A by the
    // exactly-one rule), L1 unused
    locally {
      val (m0, r0, m1, r1, dn) = empty()
      for (y <- 4 until 8) { m0(y * bW + 3) = (8, 0); r0(y * bW + 3) = 0; dn(y * bW + 3) = true }
      val d = H264.spatialDirect(m0, r0, m1, r1, dn, bW, bH, 4, 4,
        null, null, null, null)
      assert(d._1 && !d._2)
      for (b <- 0 until 16) assert(d._3(b) == ((8, 0)))
    }
    // a neighbor with refIdx 1 in scope: refused (null)
    locally {
      val (m0, r0, m1, r1, dn) = empty()
      r0(4 * bW + 3) = 1; dn(4 * bW + 3) = true
      assert(H264.spatialDirect(m0, r0, m1, r1, dn, bW, bH, 4, 4,
        null, null, null, null) == null)
    }
    // colZeroFlag zeroes refIdx-0 blocks whose colocated block is a
    // near-static refIdx-0 block -- per 4x4, only where it holds
    locally {
      val (m0, r0, m1, r1, dn) = empty()
      // MB at block corner (4, 0); A = column x=3, L0-only mv (8, 4)
      for (y <- 0 until 4) { m0(y * bW + 3) = (8, 4); r0(y * bW + 3) = 0; dn(y * bW + 3) = true }
      val cm0 = Array.fill(bW * bH)((0, 0)); val cr0 = Array.fill(bW * bH)(-1)
      val cm1 = Array.fill(bW * bH)((0, 0)); val cr1 = Array.fill(bW * bH)(-1)
      cr0(4) = 0; cm0(4) = (1, -1)       // blk 0: colZero true
      cr0(5) = 0; cm0(5) = (2, 0)        // blk 1: |mv| > 1, false
      cr0(bW + 4) = 1; cm0(bW + 4) = (0, 0) // blk 4: refIdxCol 1, false
      cr1(bW + 5) = 0; cm1(bW + 5) = (0, 0) // blk 5: L1 colocated, true
      val d = H264.spatialDirect(m0, r0, m1, r1, dn, bW, bH, 4, 0,
        cm0, cr0, cm1, cr1)
      assert(d._1 && !d._2)
      assert(d._3(0) == ((0, 0)))  // zeroed by colZero
      assert(d._3(1) == ((8, 4)))  // mvp survives
      assert(d._3(4) == ((8, 4)))  // refIdxCol != 0 keeps the mvp
      assert(d._3(5) == ((0, 0)))  // L1-colocated zero
    }
  }

  test("temporal direct equals an independent POC-scaling reconstruction (nonzero mv scaling)") {
    // decode the q218 family and compare every frame against a
    // derivation REWRITTEN here from §8.4.1.2.3: POCs from the
    // type-2 arithmetic (+2 per reference, non-ref at prevRef + 1),
    // td/tb clip3, tx = (16384 + |td/2|) / td, DistScaleFactor =
    // clip3(−1024, 1023, (tb·tx + 32) >> 6), mvL0 = (DSF·mvCol +
    // 128) >> 8, mvL1 = mvL0 − mvCol — no call into the decoder's
    // derivation. The streams' ±16 colocated mvs give DSF = 640 and
    // scaled vectors ±40 / ±24 (NONZERO — the mvCol = 0 degenerate
    // form exercises none of this arithmetic).
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264TemporalDirect(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 6)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def avg(a: Array[Array[Int]], b: Array[Array[Int]]) =
        Array.tabulate(a.length, a(0).length)((y, x) => (a(y)(x) + b(y)(x) + 1) >> 1)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qps = Seq((16 * sgn(0), 16 * sgn(1)), (16 * sgn(2), 16 * sgn(3)),
        (16 * sgn(4), 16 * sgn(5)))
      // independent POC scaling: refs at POC 0,2,4,6; Bs at 5 and 7
      def scale(currPoc: Int, colPoc: Int, refPoc: Int,
          mvCol: (Int, Int)): ((Int, Int), (Int, Int)) = {
        def c3(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
        val tb = c3(currPoc - refPoc, -128, 127)
        val td = c3(colPoc - refPoc, -128, 127)
        val tx = (16384 + math.abs(td / 2)) / td
        val dsf = c3((tb * tx + 32) >> 6, -1024, 1023)
        val m0 = ((dsf * mvCol._1 + 128) >> 8, (dsf * mvCol._2 + 128) >> 8)
        (m0, (m0._1 - mvCol._1, m0._2 - mvCol._2))
      }
      val (a0, a1) = scale(5, 2, 0, qps(0)) // B1: colocated P(qp1) -> IDR
      val (b0, b1) = scale(7, 4, 2, qps(1)) // B2: colocated P(qp2) -> P(qp1)
      // nonzero scaling, integer-sample by construction
      Seq(a0, a1, b0, b1).foreach { mv =>
        assert(mv._1 != 0 && mv._2 != 0 && mv._1 % 4 == 0 && mv._2 % 4 == 0)
      }
      assert(math.abs(a0._1) == 40 && math.abs(a1._1) == 24)
      // frame chain (luma + both chroma planes)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l1 = mc(l0, qps(0), 4); val cB1 = mc(cB0, qps(0), 8); val cR1 = mc(cR0, qps(0), 8)
      val l2 = mc(l1, qps(1), 4); val cB2 = mc(cB1, qps(1), 8); val cR2 = mc(cR1, qps(1), 8)
      val l3 = avg(mc(l0, a0, 4), mc(l1, a1, 4))
      val cB3 = avg(mc(cB0, a0, 8), mc(cB1, a1, 8))
      val cR3 = avg(mc(cR0, a0, 8), mc(cR1, a1, 8))
      val l4 = mc(l2, qps(2), 4); val cB4 = mc(cB2, qps(2), 8); val cR4 = mc(cR2, qps(2), 8)
      val l5 = avg(mc(l1, b0, 4), mc(l2, b1, 4))
      val cB5 = avg(mc(cB1, b0, 8), mc(cB2, b1, 8))
      val cR5 = avg(mc(cR1, b0, 8), mc(cR2, b1, 8))
      val ls = Seq(l0, l1, l2, l3, l4, l5)
      val cbs = Seq(cB0, cB1, cB2, cB3, cB4, cB5)
      val crs = Seq(cR0, cR1, cR2, cR3, cR4, cR5)
      assert(frames.length == 6)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // the B frames' stamped motion field: every 4x4 block carries
      // the SCALED vectors with refIdxL0 = 2 (the mapped oldest ref)
      Seq((3, a0, a1), (5, b0, b1)).foreach { case (fi, e0, e1) =>
        val fs = frames(fi)
        for (b <- 0 until 16 * mbW * mbH) {
          assert(fs.mvs0(b) == e0 && fs.refs0(b) == 2,
            s"seed=$seed frame $fi blk $b L0 ${fs.mvs0(b)}/${fs.refs0(b)}")
          assert(fs.mvs1(b) == e1 && fs.refs1(b) == 0)
        }
      }
      // aggregate cross-checks
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 6) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      var skips = 0L
      for (f <- Seq(3, 5); my <- 0 until mbH; mx <- 0 until mbW)
        if (!H264.synthBDirCoded(seed, f, mx, my)) skips += 1
      assert(m.nSkipped == skips, s"seed=$seed skips")
      val expMvAbs = mbW.toLong * mbH *
        (3L * 32L + 2L * 16L * (40 + 40 + 24 + 24))
      assert(m.mvAbsSum == expMvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $expMvAbs")
    }
  }

  test("temporal direct over a 4-deep DPB: colocated list0[1] resolves with its own DistScaleFactor") {
    // the q224 family vs a derivation REWRITTEN here: the colocated
    // P2m is a MULTI-REF frame, so one B picture mixes two mappings —
    // refIdxCol 0 → dpb(2) (DSF 640, mvL0 ±80 / mvL1 ±48) and
    // refIdxCol 1 → dpb(3) (DSF 448, mvL0 ±56 / mvL1 ±24), the case
    // the 3-picture DPB refused. No call into the decoder's own
    // derivation.
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264TemporalDirectDeep(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 5)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (32 * sgn(2), 32 * sgn(3))
      val qp3 = (16 * sgn(4), 16 * sgn(5))
      // independent §8.4.1.2.3 scaling (type-2 POCs: 0,2,4,6; B at 7)
      def scale(currPoc: Int, colPoc: Int, refPoc: Int,
          mvCol: (Int, Int)): ((Int, Int), (Int, Int)) = {
        def c3(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
        val tb = c3(currPoc - refPoc, -128, 127)
        val td = c3(colPoc - refPoc, -128, 127)
        val tx = (16384 + math.abs(td / 2)) / td
        val dsf = c3((tb * tx + 32) >> 6, -1024, 1023)
        val m0 = ((dsf * mvCol._1 + 128) >> 8, (dsf * mvCol._2 + 128) >> 8)
        (m0, (m0._1 - mvCol._1, m0._2 - mvCol._2))
      }
      val (k00, k01) = scale(7, 4, 2, qp2) // refIdxCol 0 → P1 (dpb 2)
      val (k10, k11) = scale(7, 4, 0, qp2) // refIdxCol 1 → IDR (dpb 3)
      assert(math.abs(k00._1) == 80 && math.abs(k01._1) == 48)
      assert(math.abs(k10._1) == 56 && math.abs(k11._1) == 24)
      // all integer-sample, luma AND chroma
      Seq(k00, k01, k10, k11).foreach { mv =>
        assert(mv._1 % 8 == 0 && mv._2 % 8 == 0)
      }
      // frame chain with PER-MB mixing on the synthMrRef lattice
      def mbKind(px: Int, py: Int, mbPix: Int): Int =
        H264.synthMrRef(seed, 2, px / mbPix, py / mbPix)
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mixed(a: Array[Array[Int]], b: Array[Array[Int]], mbPix: Int) =
        Array.tabulate(a.length, a(0).length)((y, x) =>
          if (mbKind(x, y, mbPix) == 0) a(y)(x) else b(y)(x))
      def avg(a: Array[Array[Int]], b: Array[Array[Int]]) =
        Array.tabulate(a.length, a(0).length)((y, x) => (a(y)(x) + b(y)(x) + 1) >> 1)
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mixed(mc(l1, qp2, 4), mc(l0, qp2, 4), 16)
      val cB2 = mixed(mc(cB1, qp2, 8), mc(cB0, qp2, 8), 8)
      val cR2 = mixed(mc(cR1, qp2, 8), mc(cR0, qp2, 8), 8)
      val l3 = mc(l2, qp3, 4); val cB3 = mc(cB2, qp3, 8); val cR3 = mc(cR2, qp3, 8)
      val l4 = mixed(avg(mc(l1, k00, 4), mc(l2, k01, 4)),
        avg(mc(l0, k10, 4), mc(l2, k11, 4)), 16)
      val cB4 = mixed(avg(mc(cB1, k00, 8), mc(cB2, k01, 8)),
        avg(mc(cB0, k10, 8), mc(cB2, k11, 8)), 8)
      val cR4 = mixed(avg(mc(cR1, k00, 8), mc(cR2, k01, 8)),
        avg(mc(cR0, k10, 8), mc(cR2, k11, 8)), 8)
      val ls = Seq(l0, l1, l2, l3, l4)
      val cbs = Seq(cB0, cB1, cB2, cB3, cB4)
      val crs = Seq(cR0, cR1, cR2, cR3, cR4)
      assert(frames.length == 5)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // stamped motion field of the B: refIdxL0 follows the mapping
      // (2 for kind-0 blocks, 3 — the new case — for kind-1)
      val bf = frames(4)
      for (by <- 0 until 4 * mbH; bx <- 0 until 4 * mbW) {
        val b = by * 4 * mbW + bx
        if (mbKind(bx, by, 4) == 0) {
          assert(bf.mvs0(b) == k00 && bf.refs0(b) == 2,
            s"seed=$seed blk $b L0 ${bf.mvs0(b)}/${bf.refs0(b)}")
          assert(bf.mvs1(b) == k01 && bf.refs1(b) == 0)
        } else {
          assert(bf.mvs0(b) == k10 && bf.refs0(b) == 3,
            s"seed=$seed blk $b L0 ${bf.mvs0(b)}/${bf.refs0(b)}")
          assert(bf.mvs1(b) == k11 && bf.refs1(b) == 0)
        }
      }
      // aggregate cross-checks
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 5) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl, s"seed=$seed luma ${m.lumaSum} vs $wl")
      assert(m.chromaSum == wc, s"seed=$seed chroma")
      assert(m.weightedSum == ww2, s"seed=$seed weighted")
      var skips = 0L
      for (my <- 0 until mbH; mx <- 0 until mbW)
        if (!H264.synthBDirCoded(seed, 4, mx, my)) skips += 1
      assert(m.nSkipped == skips, s"seed=$seed skips")
      var expMvAbs = 0L
      expMvAbs += mbW.toLong * mbH * 32L          // P1
      expMvAbs += mbW.toLong * mbH * 64L          // P2m (|32|+|32|)
      expMvAbs += mbW.toLong * mbH * 32L          // P3
      for (my <- 0 until mbH; mx <- 0 until mbW)  // B, per 4x4 block
        expMvAbs +=
          (if (H264.synthMrRef(seed, 2, mx, my) == 0) 16L * (80 + 80 + 48 + 48)
           else 16L * (56 + 56 + 24 + 24))
      assert(m.mvAbsSum == expMvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $expMvAbs")
    }
  }

  test("explicit multi-ref B 16x16: te-coded ref_idx selects any of three DPB pictures") {
    // the q225 family vs an independent reconstruction: every B MB is
    // B_Bi_16x16 with a real ue-coded ref_idx_l0 over list0 =
    // [P2, P1, IDR] (the case the MB layer refused before the
    // indexed DPB), L1 fixed at the post-swap list1[0] = P1
    var hitRef2 = false
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264BMultiRef(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 4 && frames.length == 4)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (16 * sgn(2), 16 * sgn(3))
      val qb0 = (16 * sgn(4), 16 * sgn(5))
      val qb1 = (16 * sgn(6), 16 * sgn(7))
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mc(l1, qp2, 4); val cB2 = mc(cB1, qp2, 8); val cR2 = mc(cR1, qp2, 8)
      // B: per-MB list0 source on the synthBMrRef lattice, list1 = P1
      def bi(srcs: Seq[Array[Array[Int]]], l1src: Array[Array[Int]], mbPix: Int) = {
        val a = srcs.map(s => mc(s, qb0, if (mbPix == 16) 4 else 8))
        val b = mc(l1src, qb1, if (mbPix == 16) 4 else 8)
        Array.tabulate(l1src.length, l1src(0).length) { (y, x) =>
          val r = H264.synthBMrRef(seed, x / mbPix, y / mbPix)
          (a(r)(y)(x) + b(y)(x) + 1) >> 1
        }
      }
      val l3 = bi(Seq(l2, l1, l0), l1, 16)
      val cB3 = bi(Seq(cB2, cB1, cB0), cB1, 8)
      val cR3 = bi(Seq(cR2, cR1, cR0), cR1, 8)
      val ls = Seq(l0, l1, l2, l3)
      val cbs = Seq(cB0, cB1, cB2, cB3)
      val crs = Seq(cR0, cR1, cR2, cR3)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // stamped refs follow the lattice; with mbW+2*mbH ≥ 4 every
      // stream exercises refIdx 2 (the beyond-two-aliases pick)
      val bf = frames(3)
      for (by <- 0 until 4 * mbH; bx <- 0 until 4 * mbW) {
        val b = by * 4 * mbW + bx
        val r = H264.synthBMrRef(seed, bx / 4, by / 4)
        assert(bf.mvs0(b) == qb0 && bf.refs0(b) == r,
          s"seed=$seed blk $b L0 ${bf.mvs0(b)}/${bf.refs0(b)} want ref $r")
        assert(bf.mvs1(b) == qb1 && bf.refs1(b) == 0)
      }
      hitRef2 ||= (0 until mbH).exists(my => (0 until mbW).exists(mx =>
        H264.synthBMrRef(seed, mx, my) == 2))
      // aggregates
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 4) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl && m.chromaSum == wc && m.weightedSum == ww2,
        s"seed=$seed sums")
      assert(m.nSkipped == 0L)
      assert(m.mvAbsSum == mbW.toLong * mbH * (32L + 32L + 64L),
        s"seed=$seed mvAbs ${m.mvAbsSum}")
    }
    assert(hitRef2, "the seed family never exercised refIdx 2")
  }

  test("partitioned multi-ref B: per-partition te ref_idx with per-reference mvs") {
    // the q226 family vs an independent reconstruction: 16x8/8x16
    // MBs in (L0,L0) and (Bi,Bi) modes where each partition carries
    // its own ue-coded ref_idx_l0 over [P2, P1, IDR] and each
    // reference has its OWN constant mv — the refIdx-aware
    // directional prediction rules genuinely change the mvds, and
    // the two partitions of one MB usually read different pictures
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264BPartsMultiRef(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 4 && frames.length == 4)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (16 * sgn(2), 16 * sgn(3))
      def q0(ref: Int) = (16 * sgn(4 + 2 * ref), 16 * sgn(5 + 2 * ref))
      val qb1 = (16 * sgn(10), 16 * sgn(11))
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mc(l1, qp2, 4); val cB2 = mc(cB1, qp2, 8); val cR2 = mc(cR1, qp2, 8)
      // B: per-partition L0 source + per-ref mv; Bi adds list1 = P1
      def bFrame(srcs: Seq[Array[Array[Int]]], l1src: Array[Array[Int]],
          mbPix: Int, div: Int) = {
        val a = (0 to 2).map(r => mc(srcs(r), q0(r), div))
        val b = mc(l1src, qb1, div)
        Array.tabulate(l1src.length, l1src(0).length) { (y, x) =>
          val mx = x / mbPix; val my = y / mbPix
          val kind = H264.synthBPartMrKind(seed, mx, my)
          val part =
            if (kind % 2 == 0) (y % mbPix) / (mbPix / 2)  // 16x8
            else (x % mbPix) / (mbPix / 2)                // 8x16
          val r = H264.synthBPartMrRef(seed, mx, my, part)
          val l0read = a(r)(y)(x)
          if (kind >= 2) (l0read + b(y)(x) + 1) >> 1 else l0read
        }
      }
      val l3 = bFrame(Seq(l2, l1, l0), l1, 16, 4)
      val cB3 = bFrame(Seq(cB2, cB1, cB0), cB1, 8, 8)
      val cR3 = bFrame(Seq(cR2, cR1, cR0), cR1, 8, 8)
      val ls = Seq(l0, l1, l2, l3)
      val cbs = Seq(cB0, cB1, cB2, cB3)
      val crs = Seq(cR0, cR1, cR2, cR3)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // stamped motion/ref fields follow the per-partition lattice
      val bf = frames(3)
      for (by <- 0 until 4 * mbH; bx <- 0 until 4 * mbW) {
        val b = by * 4 * mbW + bx
        val mx = bx / 4; val my = by / 4
        val kind = H264.synthBPartMrKind(seed, mx, my)
        val part =
          if (kind % 2 == 0) (by % 4) / 2 else (bx % 4) / 2
        val r = H264.synthBPartMrRef(seed, mx, my, part)
        assert(bf.mvs0(b) == q0(r) && bf.refs0(b) == r,
          s"seed=$seed blk $b L0 ${bf.mvs0(b)}/${bf.refs0(b)} want ref $r")
        if (kind >= 2) assert(bf.mvs1(b) == qb1 && bf.refs1(b) == 0)
        else assert(bf.refs1(b) == -1)
      }
      // aggregates
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 4) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl && m.chromaSum == wc && m.weightedSum == ww2,
        s"seed=$seed sums")
      assert(m.nSkipped == 0L)
      var expMvAbs = 2L * mbW * mbH * 32L // the two P frames
      for (my <- 0 until mbH; mx <- 0 until mbW)
        expMvAbs +=
          (if (H264.synthBPartMrKind(seed, mx, my) >= 2) 128L else 64L)
      assert(m.mvAbsSum == expMvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $expMvAbs")
    }
  }

  test("multi-ref B_8x8: per-sub-MB te ref_idx across mixed sub-partition shapes") {
    // the q228 family vs an independent reconstruction: every MB is
    // B_8x8, each of its four sub-MBs mixing B_L0_8x8 / B_Bi_8x8 /
    // B_Bi_8x4 / B_L0_4x4 with its OWN ue-coded ref_idx_l0 over
    // [P2, P1, IDR] — the last multi-ref refusal in the B layer
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264B8x8MultiRef(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 4 && frames.length == 4)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (16 * sgn(2), 16 * sgn(3))
      def q0(ref: Int) = (16 * sgn(4 + 2 * ref), 16 * sgn(5 + 2 * ref))
      val qb1 = (16 * sgn(10), 16 * sgn(11))
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mc(l1, qp2, 4); val cB2 = mc(cB1, qp2, 8); val cR2 = mc(cR1, qp2, 8)
      def bFrame(srcs: Seq[Array[Array[Int]]], l1src: Array[Array[Int]],
          mbPix: Int, div: Int) = {
        val a = (0 to 2).map(r => mc(srcs(r), q0(r), div))
        val b = mc(l1src, qb1, div)
        Array.tabulate(l1src.length, l1src(0).length) { (y, x) =>
          val mx = x / mbPix; val my = y / mbPix
          val half = mbPix / 2
          val sb = (x % mbPix) / half + 2 * ((y % mbPix) / half)
          val t = Array(1, 3, 8, 10)(H264.synthB8MrKind(seed, mx, my, sb))
          val r = H264.synthB8MrRef(seed, mx, my, sb)
          val l0read = a(r)(y)(x)
          if (t == 3 || t == 8) (l0read + b(y)(x) + 1) >> 1 else l0read
        }
      }
      val l3 = bFrame(Seq(l2, l1, l0), l1, 16, 4)
      val cB3 = bFrame(Seq(cB2, cB1, cB0), cB1, 8, 8)
      val cR3 = bFrame(Seq(cR2, cR1, cR0), cR1, 8, 8)
      val ls = Seq(l0, l1, l2, l3)
      val cbs = Seq(cB0, cB1, cB2, cB3)
      val crs = Seq(cR0, cR1, cR2, cR3)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // stamped fields follow the per-sub-MB lattice
      val bf = frames(3)
      for (by <- 0 until 4 * mbH; bx <- 0 until 4 * mbW) {
        val b = by * 4 * mbW + bx
        val mx = bx / 4; val my = by / 4
        val sb = (bx % 4) / 2 + 2 * ((by % 4) / 2)
        val t = Array(1, 3, 8, 10)(H264.synthB8MrKind(seed, mx, my, sb))
        val r = H264.synthB8MrRef(seed, mx, my, sb)
        assert(bf.mvs0(b) == q0(r) && bf.refs0(b) == r,
          s"seed=$seed blk $b L0 ${bf.mvs0(b)}/${bf.refs0(b)} want ref $r")
        if (t == 3 || t == 8) assert(bf.mvs1(b) == qb1 && bf.refs1(b) == 0)
        else assert(bf.refs1(b) == -1)
      }
      // aggregates
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 4) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl && m.chromaSum == wc && m.weightedSum == ww2,
        s"seed=$seed sums")
      assert(m.nSkipped == 0L)
      var expMvAbs = 2L * mbW * mbH * 32L // the two P frames
      for (my <- 0 until mbH; mx <- 0 until mbW; sb <- 0 until 4)
        expMvAbs += (H264.synthB8MrKind(seed, mx, my, sb) match {
          case 0 => 32L   // B_L0_8x8: one part, one list
          case 1 => 64L   // B_Bi_8x8: one part, two lists
          case 2 => 128L  // B_Bi_8x4: two parts, two lists
          case _ => 128L  // B_L0_4x4: four parts, one list
        })
      assert(m.mvAbsSum == expMvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $expMvAbs")
    }
  }

  test("three-ref P slices: te ref_idx over the indexed DPB for 16x16 and per-partition 16x8") {
    // the q230 family vs an independent reconstruction — the P-side
    // symmetry completion of the N-deep DPB (P previously capped at
    // two references)
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264PMultiRef3(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 4 && frames.length == 4)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (16 * sgn(2), 16 * sgn(3))
      def q0(ref: Int) = (16 * sgn(4 + 2 * ref), 16 * sgn(5 + 2 * ref))
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mc(l1, qp2, 4); val cB2 = mc(cB1, qp2, 8); val cR2 = mc(cR1, qp2, 8)
      def pFrame3(srcs: Seq[Array[Array[Int]]], mbPix: Int, div: Int) = {
        val a = (0 to 2).map(r => mc(srcs(r), q0(r), div))
        Array.tabulate(srcs.head.length, srcs.head(0).length) { (y, x) =>
          val mx = x / mbPix; val my = y / mbPix
          val part =
            if (H264.synthPMr3Kind(seed, mx, my) == 0) 0
            else (y % mbPix) / (mbPix / 2) // 16x8: top/bottom halves
          a(H264.synthPMr3Ref(seed, mx, my, part))(y)(x)
        }
      }
      val l3 = pFrame3(Seq(l2, l1, l0), 16, 4)
      val cB3 = pFrame3(Seq(cB2, cB1, cB0), 8, 8)
      val cR3 = pFrame3(Seq(cR2, cR1, cR0), 8, 8)
      val ls = Seq(l0, l1, l2, l3)
      val cbs = Seq(cB0, cB1, cB2, cB3)
      val crs = Seq(cR0, cR1, cR2, cR3)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      // stamped refs follow the lattice (part 0 for 16x16 MBs)
      val pf = frames(3)
      for (by <- 0 until 4 * mbH; bx <- 0 until 4 * mbW) {
        val b = by * 4 * mbW + bx
        val mx = bx / 4; val my = by / 4
        val part =
          if (H264.synthPMr3Kind(seed, mx, my) == 0) 0 else (by % 4) / 2
        val r = H264.synthPMr3Ref(seed, mx, my, part)
        assert(pf.mvs0(b) == q0(r) && pf.refs0(b) == r,
          s"seed=$seed blk $b ${pf.mvs0(b)}/${pf.refs0(b)} want ref $r")
      }
      var wl = 0L; var wc = 0L; var ww2 = 0L
      for (i <- 0 until 4) {
        var fl = 0L; ls(i).foreach(_.foreach(fl += _))
        var fc = 0L; cbs(i).foreach(_.foreach(fc += _)); crs(i).foreach(_.foreach(fc += _))
        wl += fl; wc += fc; ww2 += (i + 1L) * (fl + fc)
      }
      assert(m.lumaSum == wl && m.chromaSum == wc && m.weightedSum == ww2,
        s"seed=$seed sums")
      assert(m.nSkipped == 0L)
      var expMvAbs = 2L * mbW * mbH * 32L
      for (my <- 0 until mbH; mx <- 0 until mbW)
        expMvAbs += (if (H264.synthPMr3Kind(seed, mx, my) == 0) 32L else 64L)
      assert(m.mvAbsSum == expMvAbs, s"seed=$seed mvAbs ${m.mvAbsSum} vs $expMvAbs")
    }
  }

  test("weighted bi-prediction over a multi-ref L0: per-reference weight entries") {
    // the q231 family vs an independent §8.4.2.3.2 reconstruction:
    // each B_Bi_16x16 MB picks its L0 picture AND its weight entry by
    // ref_idx; the previously-refused multi-ref wBi header parse
    for (seed <- 0L until 12L) {
      val mbW = 2 + (seed % 3).toInt
      val mbH = 1 + (seed % 3).toInt
      val w = mbW * 16; val h = mbH * 16
      val frames = scala.collection.mutable.ArrayBuffer[H264.FrameState]()
      val mo = H264.decodeInter(
        H264.synthesizeH264WBiMultiRef(mbW, mbH, seed), frames += _)
      assert(mo.isDefined, s"seed=$seed decode failed")
      val m = mo.get
      assert(m.nFrames == 4 && frames.length == 4)
      def clamp(v: Int, hi: Int) = math.min(math.max(v, 0), hi)
      def clip255(v: Int) = math.min(255, math.max(0, v))
      def sgn(bit: Int): Int = 1 - 2 * (((seed >> bit) % 2).toInt & 1)
      val qp1 = (16 * sgn(0), 16 * sgn(1))
      val qp2 = (16 * sgn(2), 16 * sgn(3))
      val qb0 = (16 * sgn(4), 16 * sgn(5))
      val qb1 = (16 * sgn(6), 16 * sgn(7))
      def shift(p: Array[Array[Int]], dx: Int, dy: Int) = {
        val hh = p.length; val ww = p(0).length
        Array.tabulate(hh, ww)((y, x) =>
          p(clamp(y + dy, hh - 1))(clamp(x + dx, ww - 1)))
      }
      def mc(p: Array[Array[Int]], mv: (Int, Int), div: Int) =
        shift(p, mv._1 / div, mv._2 / div)
      val l0 = Array.tabulate(h, w)((y, x) => ((seed + x + 2 * y) % 251).toInt)
      val cB0 = Array.tabulate(h / 2, w / 2)((y, x) => ((seed + 2 * x + y) % 251).toInt)
      val cR0 = Array.tabulate(h / 2, w / 2)((y, x) => ((3 * seed + x + 2 * y) % 251).toInt)
      val l1 = mc(l0, qp1, 4); val cB1 = mc(cB0, qp1, 8); val cR1 = mc(cR0, qp1, 8)
      val l2 = mc(l1, qp2, 4); val cB2 = mc(cB1, qp2, 8); val cR2 = mc(cR1, qp2, 8)
      val (ld, _, _) = H264.synthWtLumaR(seed, 3, 0)
      def wbi(srcs: Seq[Array[Array[Int]]], l1src: Array[Array[Int]],
          mbPix: Int, div: Int, plane: Int) = {
        val a = (0 to 2).map(r => mc(srcs(r), qb0, div))
        val b = mc(l1src, qb1, div)
        Array.tabulate(l1src.length, l1src(0).length) { (y, x) =>
          val r = H264.synthBMrRef(seed, x / mbPix, y / mbPix)
          if (plane == 0) {
            val (_, w0, o0) = H264.synthWtLumaR(seed, 3, r)
            val (_, w1, o1) = H264.synthWtLumaR(seed, 3, 3)
            clip255(((a(r)(y)(x) * w0 + b(y)(x) * w1 + (1 << ld)) >> (ld + 1))
              + ((o0 + o1 + 1) >> 1))
          } else {
            val e0 = H264.synthWtChromaR(seed, 3, r)
            val e1 = H264.synthWtChromaR(seed, 3, 3)
            val (w0, o0) = if (plane == 1) (e0._2, e0._3) else (e0._4, e0._5)
            val (w1, o1) = if (plane == 1) (e1._2, e1._3) else (e1._4, e1._5)
            clip255(((a(r)(y)(x) * w0 + b(y)(x) * w1 + 2) >> 2)
              + ((o0 + o1 + 1) >> 1)) // chroma denom fixed at 1
          }
        }
      }
      val l3 = wbi(Seq(l2, l1, l0), l1, 16, 4, 0)
      val cB3 = wbi(Seq(cB2, cB1, cB0), cB1, 8, 8, 1)
      val cR3 = wbi(Seq(cR2, cR1, cR0), cR1, 8, 8, 2)
      val ls = Seq(l0, l1, l2, l3)
      val cbs = Seq(cB0, cB1, cB2, cB3)
      val crs = Seq(cR0, cR1, cR2, cR3)
      frames.zipWithIndex.foreach { case (fs, i) =>
        for (y <- 0 until h; x <- 0 until w)
          assert(fs.luma(y * w + x) == ls(i)(y)(x),
            s"seed=$seed frame $i luma ($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert(fs.cb(y * (w / 2) + x) == cbs(i)(y)(x), s"seed=$seed frame $i cb")
          assert(fs.cr(y * (w / 2) + x) == crs(i)(y)(x), s"seed=$seed frame $i cr")
        }
      }
      assert(m.nSkipped == 0L)
      assert(m.mvAbsSum == mbW.toLong * mbH * (32L + 32L + 64L))
    }
  }
}
