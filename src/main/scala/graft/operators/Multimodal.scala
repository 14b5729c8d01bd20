package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The Spark-side machinery (schema, partition-batched processing,
  * typed output) is real; the media decode itself is a deterministic
  * STUB — image/audio codecs are not available in this environment, so
  * `decodeStub` stands in for "call the codec on the byte payload"
  * (clearly marked; swap the function body for a real decoder).
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
