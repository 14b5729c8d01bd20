package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The Spark-side machinery (schema, partition-batched processing,
  * typed output) is real. The decode step is REAL for everything whose
  * structure lives in the header/marker/box stream (JPEG dimensions +
  * EXIF strip, BMP, PCM WAV, MP4 container metadata —
  * [[decodeJpeg]]/[[stripExif]]/[[decodeBmp]]/[[decodeWav]]/
  * [[decodeMp4]], no codec library needed); only FRAME-level decode
  * (JPEG entropy data, MP4 track samples) is a deterministic STUB
  * (`decodeStub`, clearly marked; swap the body for a real codec).
  * At scale this runs embarrassingly parallel: one task per partition,
  * no shuffle, codec state initialized once per partition (the
  * mapPartitions pattern — the Scala analogue of `mapInPandas` batch
  * UDFs).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, head: Long, feature: Long)

  /** Text → binary payload frame (the harness has no real media
    * column; any binary column slots in identically).
    */
  def asBinaryFrame(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic features from the raw bytes. A real
    * implementation would decode the payload (image/audio/video) here;
    * everything around it (batching, schema, parallelism) is the real
    * production shape.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val head = if (payload.nonEmpty) (payload(0) & 0xff).toLong else -1L
    (head, (payload.length.toLong * 31 + head) % 997)
  }

  /** Partition-batched feature extraction. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens here (codec handles, model weights…)
      rows.map { r =>
        val (head, feature) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, head, feature)
      }
    }
  }

  /** STUB resize — a real implementation decodes, scales to
    * `targetBytes` pixels, re-encodes; the stub deterministically
    * samples the byte stream to the target length (keeps the
    * batch/schema contract: binary in → fixed-budget binary out).
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else Array.tabulate(targetBytes)(i =>
      payload((i.toLong * payload.length / targetBytes).toInt))

  /** STUB frame sampling — a real implementation seeks to n key
    * frames; the stub cuts the payload into n contiguous spans (the
    * output shape a video pipeline hands to a captioner: one row per
    * sampled frame, ordered).
    */
  def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val span = math.max(1, payload.length / n)
    (0 until n).map { i =>
      payload.slice(i * span, math.min((i + 1) * span, payload.length))
    }.filter(_.nonEmpty)
  }

  // ---- Real decoders for self-describing structure -------------------
  //
  // BMP/WAV headers, the JPEG marker stream, and the MP4 box tree are
  // fully specified without a codec library, so metadata decode is
  // REAL for all four families; only frame/sample-level decode remains
  // stubbed. Dispatch is by magic bytes.

  final case class MediaMeta(
      doc_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, duration_ms: Long, rms: Double, n_bytes: Long,
      pix_sum: Long = 0L)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** BMP header parse: (width, height, bitsPerPixel). */
  def decodeBmp(p: Array[Byte]): Option[(Int, Int, Int)] =
    if (p.length >= 30 && p(0) == 'B' && p(1) == 'M')
      Some((le32(p, 18), le32(p, 22), le16(p, 28)))
    else None

  /** RIFF/WAVE parse: walks chunks for `fmt ` + `data`, returns
    * (sampleRate, durationMs, RMS of 16-bit PCM samples). Only
    * uncompressed PCM16 is handled — anything else is "not ours".
    */
  def decodeWav(p: Array[Byte]): Option[(Int, Long, Double)] = {
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return None
    // the offset is a Long: a malformed large-positive chunk size
    // (e.g. 0x7FFFFFF0) would wrap an Int offset negative, pass the
    // loop guard, and crash tag() — the walk must terminate instead
    var o = 12L
    var rate = 0
    var channels = 0
    var bits = 0
    var rms = 0.0
    var nSamples = 0L
    while (o + 8 <= p.length) {
      val oi = o.toInt // o + 8 <= length, so o fits an Int here
      val id = tag(p, oi)
      val sz = le32(p, oi + 4)
      // malformed negative chunk size would walk backwards (infinite
      // loop) — a decoder fed arbitrary bytes must bail, not hang an
      // executor
      if (sz < 0) return None
      if (id == "fmt " && o + 24 <= p.length) {
        if (le16(p, oi + 8) != 1) return None // not PCM
        channels = le16(p, oi + 10)
        rate = le32(p, oi + 12)
        bits = le16(p, oi + 22)
      } else if (id == "data" && bits == 16 && channels > 0) {
        val end = math.min(p.length.toLong, o + 8L + sz).toInt
        var i = oi + 8
        var sumSq = 0.0
        var n = 0L
        while (i + 1 < end) {
          val s = le16(p, i).toShort.toDouble
          sumSq += s * s
          n += 1
          i += 2
        }
        if (n > 0) rms = math.sqrt(sumSq / n)
        nSamples = n / math.max(1, channels)
      }
      o += 8L + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    if (rate > 0 && bits == 16) Some((rate, nSamples * 1000L / rate, rms))
    else None
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** JPEG frame-header parse: (width, height, nComponents) from the
    * first SOFn segment — the same marker-walk style as [[decodeWav]]'s
    * chunk walk. No entropy decode (that needs a codec); dimensions,
    * component count and structural validity live entirely in the
    * marker stream. A payload that doesn't open with SOI, walks a
    * malformed segment (bad length, truncated), or reaches SOS/EOI
    * without a frame header is "not ours" → None.
    */
  def decodeJpeg(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xFF || (p(1) & 0xff) != 0xD8) return None
    var o = 2
    while (o + 4 <= p.length) {
      if ((p(o) & 0xff) != 0xFF) return None // lost marker sync
      var m = p(o + 1) & 0xff
      while (m == 0xFF && o + 2 < p.length) { o += 1; m = p(o + 1) & 0xff } // fill bytes
      if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) o += 2 // parameterless markers
      else {
        // fill-byte skipping may have advanced o past the loop guard
        if (o + 4 > p.length) return None
        val len = be16(p, o + 2)
        if (len < 2 || o + 2 + len > p.length) return None // malformed: bail, never loop
        // SOFn = C0–CF minus DHT (C4), DAC (CC): baseline, progressive,
        // lossless … all share precision(1) height(2) width(2) ncomp(1)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (len < 8) return None
          val h = be16(p, o + 5)
          val w = be16(p, o + 7)
          val nc = p(o + 9) & 0xff
          return if (w > 0 && h > 0) Some((w, h, nc)) else None
        }
        o += 2 + len
      }
    }
    None
  }

  /** Remove APP1 (EXIF/XMP) segments from a JPEG, leaving every other
    * byte identical — the metadata-scrub pass a training pipeline runs
    * before content hashing (EXIF carries PII: GPS, timestamps, device
    * serials). From SOS onward the entropy-coded stream is copied
    * verbatim. Non-JPEG payloads pass through unchanged.
    */
  def stripExif(p: Array[Byte]): Array[Byte] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xFF || (p(1) & 0xff) != 0xD8) return p
    val out = new java.io.ByteArrayOutputStream(p.length)
    out.write(p, 0, 2)
    var o = 2
    while (o + 2 <= p.length) {
      if ((p(o) & 0xff) != 0xFF) { out.write(p, o, p.length - o); return out.toByteArray }
      val m = p(o + 1) & 0xff
      if (m == 0xDA || m == 0xD9) { out.write(p, o, p.length - o); return out.toByteArray }
      if (m == 0xFF) { out.write(p, o, 1); o += 1 } // single fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        out.write(p, o, 2); o += 2
      } else {
        if (o + 4 > p.length) { out.write(p, o, p.length - o); return out.toByteArray }
        val len = be16(p, o + 2)
        if (len < 2 || o + 2 + len > p.length) {
          out.write(p, o, p.length - o); return out.toByteArray
        }
        if (m != 0xE1) out.write(p, o, 2 + len) // drop only APP1
        o += 2 + len
      }
    }
    out.toByteArray
  }

  /** MP4 / ISO-BMFF metadata parse: (major brand, timescale,
    * duration_ms) from the ftyp + moov/mvhd box walk — the container
    * structure is fully specified without any codec (frame DECODE
    * still needs one; that part remains stubbed). Boxes are
    * [size:u32BE][type:4cc][payload] with size covering the header;
    * size==1 → 64-bit extended size follows, size==0 → box runs to
    * EOF. The walk bails (None) on any malformed size rather than
    * looping or overrunning — same posture as [[decodeWav]].
    */
  def decodeMp4(p: Array[Byte]): Option[(String, Int, Long)] = {
    def be32(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    if (p.length < 16 || tag(p, 4) != "ftyp") return None
    val brand = tag(p, 8)
    // walk top-level boxes for moov, then moov's children for mvhd
    def walk(from: Long, end: Long, want: String): Option[(Long, Long)] = {
      var o = from
      while (o + 8 <= end) {
        val oi = o.toInt
        var sz = be32(oi)
        var hdr = 8L
        if (sz == 1) {
          if (o + 16 > end) return None
          sz = be64(oi + 8); hdr = 16L
          if (sz < 16) return None // extended size must cover both headers
        } else if (sz == 0) sz = end - o // box runs to EOF
        else if (sz < 8) return None // malformed: would walk backwards
        if (o + sz > end) return None // truncated box
        if (tag(p, oi + 4) == want) return Some((o + hdr, o + sz))
        o += sz
      }
      None
    }
    for {
      (moovStart, moovEnd) <- walk(0L, p.length.toLong, "moov")
      (mvhdStart, mvhdEnd) <- walk(moovStart, moovEnd, "mvhd")
      out <- {
        val v = p(mvhdStart.toInt) & 0xff // version byte
        // v0: ver/flags(4) created(4) modified(4) timescale(4) duration(4)
        // v1: ver/flags(4) created(8) modified(8) timescale(4) duration(8)
        val need = if (v == 1) 4 + 8 + 8 + 4 + 8 else 4 + 4 + 4 + 4 + 4
        if (mvhdStart + need > mvhdEnd) None
        else {
          val tsOff = mvhdStart.toInt + (if (v == 1) 20 else 12)
          val ts = be32(tsOff)
          val dur = if (v == 1) be64(tsOff + 4) else be32(tsOff + 4)
          if (ts <= 0 || ts > Int.MaxValue) None
          else Some((brand, ts.toInt, dur * 1000L / ts))
        }
      }
    } yield out
  }

  /** Deterministic minimal-but-valid MP4 synthesis (gate generator,
    * arithmetic layout like [[synthesizeJpeg]]): ftyp(brand, one
    * compatible brand) + free(`freeBytes`) + moov(mvhd v0, timescale,
    * durationUnits) + mdat(`mdatBytes`). Total = 152 + freeBytes +
    * mdatBytes.
    */
  def synthesizeMp4(brand: String, timescale: Int, durationUnits: Long,
      freeBytes: Int, mdatBytes: Int): Array[Byte] = {
    require(brand.length == 4, "brand is a 4cc")
    val out = new java.io.ByteArrayOutputStream(152 + freeBytes + mdatBytes)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Long): Unit = { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }
    def four(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    w32(20); four("ftyp"); four(brand); w32(0); four(brand)
    w32(8L + freeBytes); four("free")
    var i = 0
    while (i < freeBytes) { w8(i); i += 1 }
    w32(116); four("moov")
    w32(108); four("mvhd")
    w32(0) // version 0 + flags
    w32(0); w32(0) // created, modified
    w32(timescale); w32(durationUnits)
    w32(0x00010000L); w8(0x01); w8(0); w8(0); w8(0) // rate 1.0, volume 1.0, reserved
    (1 to 2).foreach(_ => w32(0)) // reserved[2]
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(w32) // unity matrix
    (1 to 6).foreach(_ => w32(0)) // pre_defined[6]
    w32(2) // next_track_ID
    w32(8L + mdatBytes); four("mdat")
    i = 0
    while (i < mdatBytes) { w8(0x55); i += 1 }
    out.toByteArray
  }

  /** Partition-batched media probe: real header/payload decode for
    * JPEG, BMP, PCM WAV and MP4 container metadata (brand, timescale →
    * the `sample_rate` slot, duration); only frame-level codec decode
    * remains stubbed. Same mapPartitions shape as [[extractFeatures]].
    */
  def probeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        decodePng(p) match {
          case Some((w, h, pixSum)) =>
            MediaMeta(r.doc_id, "png", w, h, 0, 0L, 0.0, p.length.toLong, pixSum)
          case None =>
        decodeGif(p) match {
          case Some((w, h, pixSum)) =>
            MediaMeta(r.doc_id, "gif", w, h, 0, 0L, 0.0, p.length.toLong, pixSum)
          case None =>
        decodeJpeg(p) match {
          case Some((w, h, _)) =>
            MediaMeta(r.doc_id, "jpeg", w, h, 0, 0L, 0.0, p.length.toLong)
          case None => decodeBmp(p) match {
            case Some((w, h, _)) =>
              MediaMeta(r.doc_id, "bmp", w, h, 0, 0L, 0.0, p.length.toLong)
            case None => decodeWav(p) match {
              case Some((rate, durMs, rms)) =>
                MediaMeta(r.doc_id, "wav", 0, 0, rate, durMs, rms, p.length.toLong)
              case None => decodeMp4(p) match {
                // the mvhd timescale (units/second) rides the
                // sample_rate slot
                case Some((_, ts, durMs)) =>
                  MediaMeta(r.doc_id, "mp4", 0, 0, ts, durMs, 0.0, p.length.toLong)
                case None =>
                  MediaMeta(r.doc_id, "bin", 0, 0, 0, 0L, 0.0, p.length.toLong)
              }
            }
          }
        }
      }
    }
    }
    }
  }

  /** PNG parse with REAL pixel decode: signature + chunk walk with
    * per-chunk CRC32 validation, IDAT concatenation + zlib inflate
    * (JDK `Inflater` — the real zlib), then FULL scanline filter
    * reconstruction implemented here: None/Sub/Up/Average/Paeth, the
    * PNG-specific codec layer (8-bit grayscale, bpp=1). Returns
    * `(width, height, sum of reconstructed pixel bytes)` — a content
    * checksum that is wrong unless every filter math path is right.
    * Malformed anywhere (bad signature, CRC mismatch, wrong inflated
    * length, unsupported depth/color, truncation) → None.
    */
  def decodePng(p: Array[Byte]): Option[(Int, Int, Long)] = {
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 8 + 25 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i)))
      return None
    def be32(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    var o = 8
    var w = 0; var h = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (o + 12 > p.length) return None
      val len = be32(o)
      if (len > Int.MaxValue - 12 || o + 12 + len > p.length) return None
      val ctype = new String(p, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(p, o + 4, 4 + len.toInt)
      if (crc.getValue != be32(o + 8 + len.toInt)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(o + 8).toInt; h = be32(o + 12).toInt
          val bitDepth = p(o + 16) & 0xff; val colorType = p(o + 17) & 0xff
          val interlace = p(o + 20) & 0xff
          if (bitDepth != 8 || colorType != 0 || interlace != 0) return None
          seenIhdr = true
        case "IDAT" => idat.write(p, o + 8, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC-checked, content skipped
      }
      o += 12 + len.toInt
    }
    if (!seenIhdr || w <= 0 || h <= 0) return None
    for {
      raw <- pngInflate(idat.toByteArray, (w + 1) * h)
      sum <- pngDefilter(raw, w, h)
    } yield (w, h, sum)
  }

  /** zlib inflate to an exact expected length (JDK `Inflater` — the
    * real zlib); None on truncation, excess, or stream corruption.
    */
  private def pngInflate(data: Array[Byte], expectLen: Int): Option[Array[Byte]] = {
    val raw = new Array[Byte](expectLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length) None else Some(raw)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Full PNG scanline filter reconstruction, bpp = 1 (8-bit
    * grayscale): None/Sub/Up/Average/Paeth. Returns the reconstructed
    * pixel sum; None on an unknown filter type.
    */
  private def pngDefilter(raw: Array[Byte], w: Int, h: Int): Option[Long] =
    pngDefilterPixels(raw, w, h).map { px =>
      var s = 0L; var i = 0
      while (i < px.length) { s += px(i); i += 1 }
      s
    }

  /** Filter reconstruction returning the pixel grid itself (row-major
    * w×h) — the APNG compositor needs values, not just the checksum.
    */
  private def pngDefilterPixels(raw: Array[Byte], w: Int, h: Int): Option[Array[Int]] =
    pngDefilterBytes(raw, w, h, bpp = 1)

  /** Byte-level PNG filter reconstruction for `bpp` bytes/pixel (1 =
    * grayscale, 2 = grayscale+alpha): PNG filters predict bytewise
    * with `left` = the byte `bpp` positions back, so one loop serves
    * every channel layout. Returns w·h·bpp reconstructed bytes
    * row-major, channels interleaved; None on an unknown filter type.
    */
  private def pngDefilterBytes(raw: Array[Byte], w: Int, h: Int,
      bpp: Int): Option[Array[Int]] = {
    val rb = w * bpp // bytes per scanline (excluding the filter byte)
    val prev = new Array[Int](rb)
    val cur = new Array[Int](rb)
    val out = new Array[Int](rb * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (rb + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < rb) {
        val f = raw(y * (rb + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) else 0
        val above = if (y > 0) prev(x) else 0
        val ul = if (x >= bpp && y > 0) prev(x - bpp) else 0
        val rec = ft match {
          case 0 => f
          case 1 => (f + left) & 0xff
          case 2 => (f + above) & 0xff
          case 3 => (f + ((left + above) >> 1)) & 0xff
          case 4 =>
            val pp = left + above - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - above)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) above else ul
            (f + pred) & 0xff
        }
        cur(x) = rec; out(y * rb + x) = rec; x += 1
      }
      System.arraycopy(cur, 0, prev, 0, rb)
      y += 1
    }
    Some(out)
  }

  /** Deterministic PNG synthesis (write-side counterpart of
    * [[decodePng]]): 8-bit grayscale, pixel `(x, y)` is
    * `(seed + x + y) mod 251`, scanline `y` filtered with type
    * `y mod 5` — so every one of the five PNG filters is ENCODED and
    * must be correctly reconstructed on decode. zlib via JDK
    * `Deflater`; CRC32 per chunk.
    */
  def synthesizePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    pngChunk(out, "IHDR", pngBe32(w.toLong) ++ pngBe32(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0)) // depth 8, gray, deflate, adaptive, no interlace
    pngChunk(out, "IDAT", deflateBytes(pngFilteredRaw(w, h,
      (x, y) => (((seed + x + y) % 251 + 251) % 251).toInt)))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** APNG synthesis (write-side counterpart of [[decodeApng]]):
    * grayscale frames of the same geometry as [[synthesizePng]]'s,
    * frame `f`'s pixel `(x, y)` being `(seed + f + x + y) mod 251` and
    * every scanline filtered with type `y mod 5`. Chunk stream is the
    * real APNG layout: acTL after IHDR, an fcTL before every frame,
    * frame 0 in IDAT, frames 1+ in fdAT with the shared sequence
    * counter, each frame a separate zlib stream.
    */
  def synthesizeApng(w: Int, h: Int, seed: Long, frames: Int): Array[Byte] = {
    require(frames >= 1, "frames must be >= 1")
    synthesizeApngRegions(w, h, seed, frames, subRects = false)
  }

  /** The deterministic sub-rectangle geometry frame `f >= 1` patches
    * in region mode: a half-size rect sliding with `f`.
    */
  def apngRect(w: Int, h: Int, f: Int): (Int, Int, Int, Int) = {
    val wf = math.max(1, w / 2); val hf = math.max(1, h / 2)
    ((f % (w - wf + 1)), ((2 * f) % (h - hf + 1)), wf, hf)
  }

  /** APNG synthesis with optional SUB-RECTANGLE frames (the shape real
    * APNGs use): with `subRects`, frame `f >= 1` patches only
    * [[apngRect]]'s region, its pixels carrying the same
    * global-coordinate formula `(seed + f + gx + gy) mod 251` — so
    * the composited canvas has a closed form (each pixel shows the
    * LATEST frame covering it).
    */
  def synthesizeApngRegions(w: Int, h: Int, seed: Long, frames: Int,
      subRects: Boolean): Array[Byte] = {
    require(frames >= 1, "frames must be >= 1")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    pngChunk(out, "IHDR", pngBe32(w.toLong) ++ pngBe32(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0))
    pngChunk(out, "acTL", pngBe32(frames.toLong) ++ pngBe32(0L)) // plays=0: loop forever
    var seq = 0
    def fctl(x: Int, y: Int, fw: Int, fh: Int): Unit = { // delay 1/10s, dispose/blend 0
      pngChunk(out, "fcTL", pngBe32(seq.toLong) ++
        pngBe32(fw.toLong) ++ pngBe32(fh.toLong) ++
        pngBe32(x.toLong) ++ pngBe32(y.toLong) ++
        Array[Byte](0, 1, 0, 10, 0, 0))
      seq += 1
    }
    var f = 0
    while (f < frames) {
      val ff = f
      val (x0, y0, fw, fh) =
        if (ff == 0 || !subRects) (0, 0, w, h) else apngRect(w, h, ff)
      fctl(x0, y0, fw, fh)
      val dat = deflateBytes(pngFilteredRaw(fw, fh,
        (px, py) => (((seed + ff + (x0 + px) + (y0 + py)) % 251 + 251) % 251).toInt))
      if (f == 0) pngChunk(out, "IDAT", dat)
      else { pngChunk(out, "fdAT", pngBe32(seq.toLong) ++ dat); seq += 1 }
      f += 1
    }
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** APNG synthesis exercising the full fcTL semantics, one mode per
    * stream (pixel formula is [[synthesizeApngRegions]]'s global
    * `(seed + f + gx + gy) mod 251` throughout):
    *
    *   - mode 0 — DISPOSE=BACKGROUND: frame 0 full-canvas, frames
    *     `1..frames−1` patch [[apngRect]] and clear it before the
    *     next frame;
    *   - mode 1 — fcTL-LESS DEFAULT IMAGE + DISPOSE=PREVIOUS: the
    *     IDAT default image is NOT part of the animation (no fcTL
    *     precedes it); `frames` fdAT frames patch `apngRect(f)`,
    *     `f = 1..frames`, each reverting its region afterwards —
    *     onto the transparent canvas;
    *   - mode 2 — BLEND=OVER (colorType 4, gray+alpha): frame 0
    *     full-canvas opaque; frames `1..frames−1` patch `apngRect(f)`
    *     with alpha 255 where `(gx + gy + f)` is even and 0 elsewhere,
    *     blended OVER — binary alphas, so compositing is exactly
    *     copy-or-keep and the canvas keeps a closed form.
    */
  def synthesizeApngModes(w: Int, h: Int, seed: Long, frames: Int,
      mode: Int): Array[Byte] = {
    require(frames >= 1, "frames must be >= 1")
    require(mode >= 0 && mode <= 2, "mode in 0..2")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    val colorType: Byte = if (mode == 2) 4 else 0
    val bpp = if (mode == 2) 2 else 1
    pngChunk(out, "IHDR", pngBe32(w.toLong) ++ pngBe32(h.toLong) ++
      Array[Byte](8, colorType, 0, 0, 0))
    pngChunk(out, "acTL", pngBe32(frames.toLong) ++ pngBe32(0L))
    var seq = 0
    def fctl(x: Int, y: Int, fw: Int, fh: Int, dispose: Int, blend: Int): Unit = {
      pngChunk(out, "fcTL", pngBe32(seq.toLong) ++
        pngBe32(fw.toLong) ++ pngBe32(fh.toLong) ++
        pngBe32(x.toLong) ++ pngBe32(y.toLong) ++
        Array[Byte](0, 1, 0, 10, dispose.toByte, blend.toByte))
      seq += 1
    }
    def frameBytes(f: Int, x0: Int, y0: Int, fw: Int, fh: Int): Array[Byte] =
      deflateBytes(pngFilteredRawBytes(fw, fh, bpp, (px, py, c) => {
        val (gx, gy) = (x0 + px, y0 + py)
        if (c == 0) (((seed + f + gx + gy) % 251 + 251) % 251).toInt
        else if (f == 0) 255 // frame 0 fully opaque
        else if ((gx + gy + f) % 2 == 0) 255 else 0
      }))
    if (mode == 1) {
      // fcTL-less default image: IDAT with NO fcTL, then fdAT frames
      pngChunk(out, "IDAT", frameBytes(0, 0, 0, w, h))
      var f = 1
      while (f <= frames) {
        val (x0, y0, fw, fh) = apngRect(w, h, f)
        fctl(x0, y0, fw, fh, dispose = 2, blend = 0)
        pngChunk(out, "fdAT", pngBe32(seq.toLong) ++ frameBytes(f, x0, y0, fw, fh))
        seq += 1
        f += 1
      }
    } else {
      var f = 0
      while (f < frames) {
        val (x0, y0, fw, fh) =
          if (f == 0) (0, 0, w, h) else apngRect(w, h, f)
        val dispose = if (mode == 0 && f > 0) 1 else 0
        val blend = if (mode == 2 && f > 0) 1 else 0
        fctl(x0, y0, fw, fh, dispose, blend)
        val dat = frameBytes(f, x0, y0, fw, fh)
        if (f == 0) pngChunk(out, "IDAT", dat)
        else { pngChunk(out, "fdAT", pngBe32(seq.toLong) ++ dat); seq += 1 }
        f += 1
      }
    }
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Filtered raw scanlines for one grayscale frame: pixel `(x, y)` =
    * `value(x, y)`, scanline `y` filtered with type `y mod 5` — every
    * one of the five PNG filters is ENCODED and must be correctly
    * reconstructed on decode.
    */
  private def pngFilteredRaw(w: Int, h: Int, value: (Int, Int) => Int): Array[Byte] =
    pngFilteredRawBytes(w, h, bpp = 1, (x, y, _) => value(x, y))

  /** Byte-level filtered scanlines for `bpp` bytes/pixel: channel `c`
    * of pixel `(x, y)` is `byteVal(x, y, c)`, filters applied bytewise
    * with `left` = `bpp` bytes back (the PNG contract
    * [[pngDefilterBytes]] reverses).
    */
  private def pngFilteredRawBytes(w: Int, h: Int, bpp: Int,
      byteVal: (Int, Int, Int) => Int): Array[Byte] = {
    val rb = w * bpp
    val raw = new Array[Byte]((rb + 1) * h)
    val prevRow = new Array[Int](rb)
    val curRow = new Array[Int](rb)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (rb + 1)) = ft.toByte
      var x = 0
      while (x < rb) {
        curRow(x) = byteVal(x / bpp, y, x % bpp)
        val left = if (x >= bpp) curRow(x - bpp) else 0
        val above = if (y > 0) prevRow(x) else 0
        val ul = if (x >= bpp && y > 0) prevRow(x - bpp) else 0
        val enc = ft match {
          case 0 => curRow(x)
          case 1 => (curRow(x) - left) & 0xff
          case 2 => (curRow(x) - above) & 0xff
          case 3 => (curRow(x) - ((left + above) >> 1)) & 0xff
          case 4 =>
            val pp = left + above - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - above)
            val pc = math.abs(pp - ul)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) above else ul
            (curRow(x) - pred) & 0xff
        }
        raw(y * (rb + 1) + 1 + x) = enc.toByte
        x += 1
      }
      System.arraycopy(curRow, 0, prevRow, 0, rb)
      y += 1
    }
    raw
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    zbuf.toByteArray
  }

  private def pngBe32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(out: java.io.ByteArrayOutputStream, ctype: String,
      body: Array[Byte]): Unit = {
    out.write(pngBe32(body.length.toLong), 0, 4)
    val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb, 0, 4); out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(body)
    out.write(pngBe32(crc.getValue), 0, 4)
  }

  /** APNG frame walk (read-side counterpart of [[synthesizeApng]]):
    * CRC-validated chunk walk, acTL frame count cross-checked against
    * the fcTL count, per-frame zlib streams (IDAT concat when the
    * default image IS the first frame, fdAT concat per later frame —
    * consecutive fdAT chunks of one frame merge by chunk order)
    * inflated and filter-reconstructed individually, then COMPOSITED
    * onto the canvas with the full fcTL semantics:
    *
    *   - an IDAT with NO preceding fcTL is a default image that is
    *     not part of the animation — its bytes are skipped and the
    *     frames live entirely in fdAT (canvas starts transparent);
    *   - dispose_op none/background/previous: background clears the
    *     frame's region to transparent black before the next frame,
    *     previous restores the region saved before the frame rendered
    *     (a first frame with dispose=previous degrades to background,
    *     per spec);
    *   - blend_op source/over: over is straight-alpha compositing in
    *     exact integer arithmetic — documented engine contract:
    *     `denA = srcA·255 + dstA·(255−srcA)`,
    *     `outV = (srcV·srcA·255 + dstV·dstA·(255−srcA)) div denA`
    *     (0 when denA = 0), `outA = denA div 255` — which reduces to
    *     plain copy/keep for 255/0 alphas;
    *   - grayscale (colorType 0, opaque) and grayscale+alpha
    *     (colorType 4) frames.
    *
    * Returns (w, h, frame count, Σ canvas-sum-after-each-frame,
    * Σ (frame_idx+1)·canvas_sum), where a canvas sum is the
    * premultiplied `Σ v·a div 255` — for opaque pixels the plain
    * value sum, so fully-opaque streams keep their closed-form
    * oracles. A plain single-image PNG (no acTL) returns None — it
    * is not an animation.
    */
  /** Integer straight-alpha OVER (the documented [[decodeApng]]
    * contract): `denA = srcA·255 + dstA·(255−srcA)`,
    * `outV = (srcV·srcA·255 + dstV·dstA·(255−srcA)) div denA` (0 when
    * denA = 0), `outA = denA div 255`. Exact copy/keep at alpha
    * 255/0; floor divisions everywhere else.
    */
  private[graft] def blendOver(sv: Int, sa: Int, dv: Int, da: Int): (Int, Int) = {
    val denA = sa * 255 + da * (255 - sa)
    val ov = if (denA == 0) 0
      else ((sv.toLong * sa * 255 + dv.toLong * da * (255 - sa)) / denA).toInt
    (ov, denA / 255)
  }

  def decodeApng(p: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 8 + 25 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i)))
      return None
    def be32(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    var o = 8
    var w = 0; var h = 0; var bpp = 1
    var seenIhdr = false; var seenIend = false; var sawIdat = false
    var idatIsFrame = false
    var declared = -1
    val streams = scala.collection.mutable.ArrayBuffer.empty[java.io.ByteArrayOutputStream]
    val rects = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    val ops = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (dispose, blend)
    while (!seenIend) {
      if (o + 12 > p.length) return None
      val len = be32(o)
      if (len > Int.MaxValue - 12 || o + 12 + len > p.length) return None
      val ctype = new String(p, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(p, o + 4, 4 + len.toInt)
      if (crc.getValue != be32(o + 8 + len.toInt)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(o + 8).toInt; h = be32(o + 12).toInt
          val bitDepth = p(o + 16) & 0xff; val colorType = p(o + 17) & 0xff
          val interlace = p(o + 20) & 0xff
          if (bitDepth != 8 || (colorType != 0 && colorType != 4) ||
            interlace != 0) return None
          bpp = if (colorType == 4) 2 else 1
          seenIhdr = true
        case "acTL" =>
          if (len != 8) return None
          declared = be32(o + 8).toInt
        case "fcTL" =>
          if (len != 26) return None
          val fw = be32(o + 12).toInt; val fh = be32(o + 16).toInt
          val fx = be32(o + 20).toInt; val fy = be32(o + 24).toInt
          val dispose = p(o + 32) & 0xff; val blend = p(o + 33) & 0xff
          // only a default image that IS the first frame must cover
          // the canvas (spec); fdAT-only animations may start with any
          // in-bounds sub-rectangle onto the transparent canvas
          if (rects.isEmpty && !sawIdat &&
            (fw != w || fh != h || fx != 0 || fy != 0)) return None
          if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
            fx + fw > w || fy + fh > h) return None
          if (dispose > 2 || blend > 1) return None
          if (!sawIdat && rects.isEmpty) idatIsFrame = true
          rects += ((fx, fy, fw, fh))
          ops += ((dispose, blend))
          streams += new java.io.ByteArrayOutputStream()
        case "IDAT" =>
          sawIdat = true
          // an fcTL-less default image is shown before the animation
          // but is NOT a frame: skip its bytes entirely
          if (idatIsFrame) streams.head.write(p, o + 8, len.toInt)
        case "fdAT" =>
          if (len < 4) return None
          // the write target must be an fdAT frame, not the IDAT one
          if (streams.isEmpty || (idatIsFrame && streams.length < 2))
            return None
          streams.last.write(p, o + 12, len.toInt - 4) // skip sequence number
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC-checked, content skipped
      }
      o += 12 + len.toInt
    }
    if (!seenIhdr || w <= 0 || h <= 0 || !sawIdat) return None
    if (declared <= 0 || declared != streams.length) return None
    // composite with full dispose/blend semantics; per-frame
    // contribution = premultiplied canvas sum after rendering
    val cv = new Array[Int](w * h) // values
    val ca = new Array[Int](w * h) // straight alpha
    var sum = 0L
    var weighted = 0L
    var f = 0
    while (f < streams.length) {
      val (fx, fy, fw, fh) = rects(f)
      val (disposeRaw, blend) = ops(f)
      // spec: a FIRST frame asking for dispose=previous means background
      val dispose = if (f == 0 && disposeRaw == 2) 1 else disposeRaw
      val bytes = pngInflate(streams(f).toByteArray, (fw * bpp + 1) * fh)
        .flatMap(raw => pngDefilterBytes(raw, fw, fh, bpp)) match {
        case Some(px) => px
        case None => return None
      }
      // save the region only when this frame disposes to previous
      val saved = if (dispose == 2) {
        val s = new Array[Int](fw * fh * 2)
        var py = 0
        while (py < fh) {
          var px = 0
          while (px < fw) {
            val ci = (fy + py) * w + (fx + px); val si = (py * fw + px) * 2
            s(si) = cv(ci); s(si + 1) = ca(ci); px += 1
          }
          py += 1
        }
        s
      } else null
      var py = 0
      while (py < fh) {
        var px = 0
        while (px < fw) {
          val ci = (fy + py) * w + (fx + px)
          val bi = (py * fw + px) * bpp
          val sv = bytes(bi)
          val sa = if (bpp == 2) bytes(bi + 1) else 255
          if (blend == 0 || sa == 255) { cv(ci) = sv; ca(ci) = sa }
          else if (sa != 0) {
            val (ov, oa) = blendOver(sv, sa, cv(ci), ca(ci))
            cv(ci) = ov; ca(ci) = oa
          } // sa == 0 under OVER: keep destination
          px += 1
        }
        py += 1
      }
      var cs = 0L
      var i = 0
      while (i < cv.length) { cs += cv(i).toLong * ca(i) / 255; i += 1 }
      sum += cs
      weighted += (f + 1).toLong * cs
      // dispose applies when advancing to the next frame
      if (dispose == 1) {
        var py2 = 0
        while (py2 < fh) {
          var px2 = 0
          while (px2 < fw) {
            val ci = (fy + py2) * w + (fx + px2)
            cv(ci) = 0; ca(ci) = 0; px2 += 1
          }
          py2 += 1
        }
      } else if (dispose == 2) {
        var py2 = 0
        while (py2 < fh) {
          var px2 = 0
          while (px2 < fw) {
            val ci = (fy + py2) * w + (fx + px2); val si = (py2 * fw + px2) * 2
            cv(ci) = saved(si); ca(ci) = saved(si + 1); px2 += 1
          }
          py2 += 1
        }
      }
      f += 1
    }
    Some((w, h, declared, sum, weighted))
  }

  final case class AnimMeta(doc_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, pix_sum: Long, frame_weighted: Long)

  /** Animation probe over binary payloads: APNG first (signature +
    * acTL), then multi-frame GIF; everything else is opaque. Same
    * partition-batched shape as [[probeMedia]] — pure map work, no
    * shuffle, memory bounded by one payload.
    */
  def probeAnimation(spark: SparkSession, media: DataFrame): Dataset[AnimMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        decodeApng(p) match {
          case Some((w, h, nf, s, ws)) => AnimMeta(r.doc_id, "apng", w, h, nf, s, ws)
          case None => decodeGifFrames(p) match {
            case Some((w, h, nf, s, ws)) => AnimMeta(r.doc_id, "gif", w, h, nf, s, ws)
            case None => AnimMeta(r.doc_id, "bin", 0, 0, 0, 0L, 0L)
          }
        }
      }
    }
  }

  /** GIF parse with REAL pixel decode: header + logical screen
    * descriptor, skip color tables/extensions, then run the first
    * image's data through a full variable-code-width LZW decoder
    * (clear/end codes, deferred dictionary growth, 12-bit cap with
    * clear-reset, LSB-first bit packing, 255-byte sub-blocks — the
    * actual GIF89a algorithm, not a header peek). Returns
    * `(width, height, sum of decoded pixel indices)` — the pixel sum
    * is a frame-content checksum a structural parse cannot fake.
    * Malformed anywhere (bad header, truncated stream, code out of
    * range, pixel overflow) → None.
    */
  def decodeGif(p: Array[Byte]): Option[(Int, Int, Long)] = {
    gifHeader(p).flatMap { case (w, h, o0) =>
      var o = o0
      while (o < p.length && (p(o) & 0xff) == 0x21) { // extensions
        o += 2 // introducer + label
        while (o < p.length && p(o) != 0) o += 1 + (p(o) & 0xff)
        o += 1 // block terminator
      }
      gifDecodeImage(p, o).map { case (_, sum) => (w, h, sum) }
    }
  }

  /** Header + logical screen descriptor + global color table skip.
    * Returns (screen width, screen height, offset of the first block).
    */
  private def gifHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 14) return None
    val hdr = new String(p, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val packed = p(10) & 0xff
    var o = 13
    if ((packed & 0x80) != 0) o += 3 * (1 << ((packed & 7) + 1)) // global table
    Some((le16(p, 6), le16(p, 8), o))
  }

  /** Decode ONE image block (must start at an 0x2c image descriptor):
    * the full variable-width LZW pipeline of [[decodeGif]]. Returns
    * (offset past the block terminator, decoded pixel-index sum); None
    * on any malformation, including a pixel count that disagrees with
    * the image descriptor.
    */
  private def gifDecodeImage(p: Array[Byte], start: Int): Option[(Int, Long)] = {
    var o = start
    if (o + 10 > p.length || (p(o) & 0xff) != 0x2c) return None
    val iw = le16(p, o + 5); val ih = le16(p, o + 7)
    val ipacked = p(o + 9) & 0xff
    o += 10
    if ((ipacked & 0x80) != 0) o += 3 * (1 << ((ipacked & 7) + 1)) // local table
    if (o >= p.length) return None
    val minCode = p(o) & 0xff
    o += 1
    if (minCode < 2 || minCode > 8) return None
    // collect LZW bytes from sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (o < p.length && p(o) != 0) {
      val len = p(o) & 0xff
      if (o + 1 + len > p.length) return None
      data.write(p, o + 1, len)
      o += 1 + len
    }
    if (o >= p.length) return None
    val endOffset = o + 1 // past the 0x00 block terminator
    val bytes = data.toByteArray
    val nPixels = iw.toLong * ih
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary: prefix link + last byte per code (12-bit max = 4096)
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    var next = end + 1
    var width = minCode + 1
    var prev = -1
    var bitPos = 0
    var produced = 0L
    var sum = 0L
    val tail = new Array[Byte](4097) // expansion scratch (longest chain + KwKwK byte)
    def expandLen(code: Int): Int = { // writes chain into tail reversed
      var c = code; var n = 0
      while (c >= clear) { tail(n) = last(c); n += 1; c = prefix(c) }
      tail(n) = c.toByte; n + 1
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (true) {
      if (bitPos + width > bytes.length * 8) return None // truncated
      var code = 0
      var b = 0
      while (b < width) {
        val bit = bitPos + b
        if ((bytes(bit >> 3) & (1 << (bit & 7))) != 0) code |= 1 << b
        b += 1
      }
      bitPos += width
      if (code == end) {
        return if (produced == nPixels) Some((endOffset, sum)) else None
      } else if (code == clear) {
        next = end + 1; width = minCode + 1; prev = -1
      } else {
        var entryLen = 0
        if (code < next) {
          entryLen = expandLen(code)
        } else if (code == next && prev >= 0) {
          // KwKwK: prev chain + its first byte
          val pl = expandLen(prev)
          // shift to make room for the appended first byte at the front
          // (tail is reversed: appended byte is index 0 shifted in)
          var i = pl
          while (i > 0) { tail(i) = tail(i - 1); i -= 1 }
          tail(0) = firstByte(prev)
          entryLen = pl + 1
        } else return None // out-of-range code
        // emit (reversed chain: tail(entryLen-1) .. tail(0))
        var i = entryLen - 1
        while (i >= 0) {
          sum += tail(i) & 0xff
          i -= 1
        }
        produced += entryLen
        if (produced > nPixels) return None
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; last(next) = tail(entryLen - 1)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    None
  }

  /** Deterministic GIF synthesis with a REAL LZW encoder (write-side
    * counterpart of [[decodeGif]]): 4-color global table, pixel i of
    * the `w × h` frame is `(seed + i) mod 4` — so the decoded pixel
    * sum has a closed form an SQL oracle can compute. The encoder is
    * the genuine algorithm (prefix-table growth, width bumps at
    * `next == 2^width + 1`, clear-code reset at 4096), so large
    * frames drive the decoder through every code path.
    */
  def synthesizeGif(w: Int, h: Int, seed: Long, cycle: Int = 4): Array[Byte] = {
    require(cycle >= 1 && cycle <= 4, "cycle must be 1..4 (4-color table)")
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, w, h)
    writeGifImage(out, w, h,
      i => (((seed + i) % cycle + cycle) % cycle).toInt)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Animated GIF synthesis: `frames` full-screen frames, each behind
    * a Graphic Control Extension, pixel `i` of frame `f` being
    * `(seed + f + i) mod 4` — every frame differs by a fixed offset,
    * so a per-frame-weighted checksum catches frame miscounts AND
    * misattributed content.
    */
  def synthesizeGifAnim(w: Int, h: Int, seed: Long, frames: Int): Array[Byte] = {
    require(frames >= 1, "frames must be >= 1")
    val out = new java.io.ByteArrayOutputStream()
    writeGifHeader(out, w, h)
    var f = 0
    while (f < frames) {
      // GCE: introducer, label, block size 4, flags, delay 10cs, no
      // transparency, terminator
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(10); out.write(0); out.write(0); out.write(0)
      val ff = f
      writeGifImage(out, w, h,
        i => (((seed + ff + i) % 4 + 4) % 4).toInt)
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Header + logical screen descriptor + the 4-entry grayscale GCT
    * shared by both GIF synthesizers.
    */
  private def writeGifHeader(out: java.io.ByteArrayOutputStream, w: Int, h: Int): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16le(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    w16le(w); w16le(h)
    w8(0x80 | 0x01) // GCT present, 2^(1+1)=4 entries
    w8(0); w8(0)    // bg color, aspect
    var j = 0
    while (j < 4) { w8(j * 85); w8(j * 85); w8(j * 85); j += 1 }
  }

  /** Per-thread LZW dictionary scratch: codes + generation stamps
    * over the (cur << 8 | px) key space (cur < 4096, px < 256 →
    * 2^20 slots). A generation bump IS the dictionary clear — no
    * per-frame allocation or fill, and no boxed HashMap on the
    * encode hot path (the q95/q104 bench top cost).
    */
  private val lzwScratch =
    ThreadLocal.withInitial[(Array[Int], Array[Int], Array[Int])](() =>
      (new Array[Int](1 << 20), new Array[Int](1 << 20), Array(0)))

  /** One full-screen image block: descriptor + REAL LZW encode of the
    * pixel stream (the genuine algorithm — prefix-table growth, width
    * bumps at `next == 2^width + 1`, clear-code reset at 4096), so
    * large frames drive the decoder through every code path.
    */
  private def writeGifImage(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
      pixelAt: Long => Int): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16le(v: Int): Unit = { w8(v); w8(v >> 8) }
    w8(0x2c); w16le(0); w16le(0); w16le(w); w16le(h); w8(0) // image descriptor
    val minCode = 2
    w8(minCode)
    val clear = 1 << minCode
    val end = clear + 1
    // bit writer, LSB-first
    val lzw = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    def putCode(c: Int, width: Int): Unit = {
      acc |= c.toLong << nBits; nBits += width
      while (nBits >= 8) { lzw.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    // The emit width must track the DECODER's width state machine, not
    // the encoder's dictionary counter: the decoder adds one entry per
    // received code (none for the first after a clear) and widens when
    // its next-code counter fills the current width — including across
    // emissions that add nothing on the encoder side (hits, the final
    // flush). Mirroring it exactly is the only pairing that stays in
    // sync for every stream shape.
    var width = minCode + 1
    var decRC = end + 1        // decoder's next-code counter, mirrored
    var firstCode = true       // decoder adds nothing for this one
    def emitMirrored(c: Int): Unit = {
      putCode(c, width)
      if (!firstCode && decRC < 4096) {
        decRC += 1
        if (decRC == (1 << width) && width < 12) width += 1
      }
      firstCode = false
    }
    var next = end + 1
    val (codes, stamps, genBox) = lzwScratch.get() // (cur<<8 | px) -> code
    genBox(0) += 1
    var gen = genBox(0)
    putCode(clear, width)
    val n = w.toLong * h
    var cur = pixelAt(0L)
    var i = 1L
    while (i < n) {
      val px = pixelAt(i)
      val key = (cur << 8) | px
      if (stamps(key) == gen) cur = codes(key)
      else {
        emitMirrored(cur)
        if (next < 4096) {
          codes(key) = next; stamps(key) = gen; next += 1
        } else { // dictionary full: clear and start over
          emitMirrored(clear)
          genBox(0) += 1; gen = genBox(0); next = end + 1
          width = minCode + 1; decRC = end + 1; firstCode = true
        }
        cur = px
      }
      i += 1
    }
    emitMirrored(cur)
    emitMirrored(end)
    if (nBits > 0) lzw.write((acc & 0xff).toInt)
    val bytes = lzw.toByteArray
    var off = 0
    while (off < bytes.length) { // 255-byte sub-blocks
      val len = math.min(255, bytes.length - off)
      w8(len); out.write(bytes, off, len); off += len
    }
    w8(0) // block terminator
  }

  /** Walk EVERY frame of a (possibly animated) GIF: per-frame LZW
    * decode via [[gifDecodeImage]], skipping extensions between
    * frames. Returns (screen w, screen h, frame count, total decoded
    * pixel sum, Σ (frame_idx+1)·frame_sum) — the weighted term pins
    * both the count and which content sits in which frame.
    */
  def decodeGifFrames(p: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    gifHeader(p).flatMap { case (w, h, o0) =>
      var o = o0
      var frames = 0
      var sum = 0L
      var weighted = 0L
      while (o < p.length && (p(o) & 0xff) != 0x3b) {
        if ((p(o) & 0xff) == 0x21) { // extension: skip sub-blocks
          o += 2
          while (o < p.length && p(o) != 0) o += 1 + (p(o) & 0xff)
          o += 1
        } else if ((p(o) & 0xff) == 0x2c) {
          gifDecodeImage(p, o) match {
            case Some((end, s)) =>
              sum += s; weighted += (frames + 1).toLong * s
              frames += 1; o = end
            case None => return None
          }
        } else return None // unknown block type
      }
      if (frames == 0 || o >= p.length) None
      else Some((w, h, frames, sum, weighted))
    }
  }

  /** Deterministic minimal-but-valid JPEG synthesis (write-side
    * encoder; also the gate's payload generator): SOI + APP1 with an
    * `exifBytes`-long fake TIFF body + SOF0(w, h, 3 components) + SOS
    * + `entropyBytes` of FF-free entropy filler + EOI. Total size is
    * arithmetic — 47 + exifBytes + entropyBytes — so a SQL oracle can
    * predict every decoded feature, and [[stripExif]] must shrink it
    * by exactly the APP1 segment (10 + exifBytes).
    */
  def synthesizeJpeg(w: Int, h: Int, exifBytes: Int, entropyBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(47 + exifBytes + entropyBytes)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w8(0xFF); w8(0xD8)                     // SOI
    w8(0xFF); w8(0xE1); w16(8 + exifBytes) // APP1: len covers itself + Exif\0\0 + body
    out.write("Exif".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    w8(0); w8(0)
    var i = 0
    while (i < exifBytes) { w8(i); i += 1 }
    w8(0xFF); w8(0xC0); w16(17)            // SOF0: len = 8 + 3 components
    w8(8); w16(h); w16(w); w8(3)
    (1 to 3).foreach { c => w8(c); w8(0x11); w8(0) }
    w8(0xFF); w8(0xDA); w16(12)            // SOS: len = 6 + 2 per component
    w8(3); (1 to 3).foreach { c => w8(c); w8(0) }; w8(0); w8(63); w8(0)
    i = 0
    while (i < entropyBytes) { w8(0x55); i += 1 } // no FF → no marker aliasing
    w8(0xFF); w8(0xD9)                     // EOI
    out.toByteArray
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte], n_bytes: Long)

  /** Partition-batched resize + frame sampling over binary payloads:
    * one output row per sampled frame. The explode happens inside the
    * partition iterator — no shuffle, memory bounded by one payload.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, nFrames: Int,
      targetBytes: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val resized = resizeStub(r.payload, targetBytes)
        frameSampleStub(resized, nFrames).zipWithIndex.map { case (f, i) =>
          Frame(r.doc_id, i, f, f.length.toLong)
        }
      }
    }
  }
}
