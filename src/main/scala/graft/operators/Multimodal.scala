package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The Spark-side machinery (schema, partition-batched processing,
  * typed output) is real. The decode step is REAL for self-contained
  * header formats (BMP, PCM WAV — [[decodeBmp]]/[[decodeWav]], no
  * codec library needed) and a deterministic STUB for jpeg/mp4-class
  * formats whose codecs are not available in this environment
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

  // ---- Real decoders for self-contained formats ----------------------
  //
  // BMP and WAV are fully specified header+payload formats needing no
  // codec library, so the decode step is REAL for them (the stub
  // remains the stand-in for jpeg/mp4-class formats whose codecs
  // aren't in this environment). Dispatch is by magic bytes.

  final case class MediaMeta(
      doc_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, duration_ms: Long, rms: Double, n_bytes: Long)

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

  /** Partition-batched media probe: real header/payload decode for
    * BMP and PCM WAV, stub passthrough ("bin") for everything else.
    * Same mapPartitions shape as [[extractFeatures]].
    */
  def probeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        decodeBmp(p) match {
          case Some((w, h, _)) =>
            MediaMeta(r.doc_id, "bmp", w, h, 0, 0L, 0.0, p.length.toLong)
          case None => decodeWav(p) match {
            case Some((rate, durMs, rms)) =>
              MediaMeta(r.doc_id, "wav", 0, 0, rate, durMs, rms, p.length.toLong)
            case None =>
              MediaMeta(r.doc_id, "bin", 0, 0, 0, 0L, 0.0, p.length.toLong)
          }
        }
      }
    }
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
