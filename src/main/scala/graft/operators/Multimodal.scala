package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for the training-data pipeline: image/audio/
  * video payloads travel as opaque `BinaryType` columns with a typed
  * metadata struct; decode / feature-extraction runs batched per
  * partition.
  *
  * The actual codecs are STUBBED (this container ships no image/audio
  * libraries — see `decodeStub`): the stub is deterministic so the
  * plumbing (schema, partitioning, batch shape, null handling) is real and
  * testable, and swapping in a real decoder changes one function.
  *
  * Scale notes: payloads never pass through a groupBy — per-item transforms
  * are `mapPartitions` (one JVM-side batch per partition, the Scala
  * equivalent of `mapInPandas` batches), and metadata-only operations
  * (filtering by width, joining labels) prune the binary column before any
  * shuffle via Catalyst column pruning.
  */
object Multimodal {

  /** media row: (id, kind, payload, meta) — meta mirrors what a real
    * decoder would fill. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic fake "decode": byte-histogram statistics standing in for
    * a real `decode(payload)`. REPLACE THIS to integrate real codecs. */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, Array.fill(8)(0.0f))
    else {
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xFF) >> 5) += 1.0f
        i += 1
      }
      val n = payload.length.toFloat
      (payload.length, (payload.head & 0xFF) + 1, hist.map(_ / n))
    }
  }

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      pseudo_dim: Int, features: Array[Float])

  /** Batched per-partition feature extraction — the `mapInPandas` shape:
    * one iterator in, one iterator out, no per-row task overhead, binary
    * column consumed and dropped before anything shuffles. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc: org.apache.spark.sql.Encoder[MediaFeatures] =
      org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val (nBytes, dim, feats) = decodeStub(r.getAs[Array[Byte]]("payload"))
          MediaFeatures(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            nBytes, dim, feats)
        }
      }
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * window as a frame — pure Column ops (no UDF), so Catalyst can pipeline
    * it; output is exploded (media_id, frame_idx, frame_bytes). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), greatest((length(col("payload")) / (frameBytes * stride)).cast("int") - 1, lit(0))),
          i => substring(col("payload"), (i * (frameBytes * stride) + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")

  /** Metadata-only pruning predicate: Catalyst drops `payload` from the
    * scan when only meta/kind are referenced downstream. */
  def smallImages(media: DataFrame, maxWidth: Int): DataFrame =
    media.filter(col("kind") === "image" && col("meta.width") <= maxWidth)
      .select("media_id", "meta.width", "meta.height")

  /** Audio-style OVERLAPPING windows (frame + hop, hop < frame ⇒ overlap)
    * over "audio" payloads — the STFT framing shape without the FFT (no
    * DSP libs in this container; a real pipeline maps each window through
    * a transform UDF afterwards). Pure Column ops like [[sampleFrames]]:
    * payloads shorter than one frame yield a single truncated window. */
  def audioWindows(media: DataFrame, frameBytes: Int, hopBytes: Int): DataFrame =
    media.filter(col("kind") === "audio")
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), greatest(
            ((length(col("payload")) - frameBytes) / hopBytes).cast("int"), lit(0))),
          i => substring(col("payload"), (i * hopBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "window_idx")
      .withColumnRenamed("col", "window_bytes")

  final case class ResizedMedia(media_id: Long, kind: String, payload: Array[Byte])

  /** Image "resize" STUB: nearest-neighbor byte decimation to ≤
    * `targetBytes` — stands in for decode→resize→encode (no codec libs in
    * this container; REPLACE the body to integrate real codecs). The
    * Spark shape is the production one: batched `mapPartitions`, binary in
    * / binary out, no shuffle touched by payload bytes. */
  def resizeStub(media: DataFrame, targetBytes: Int): Dataset[ResizedMedia] = {
    implicit val enc: org.apache.spark.sql.Encoder[ResizedMedia] =
      org.apache.spark.sql.Encoders.product[ResizedMedia]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val out =
            if (payload == null || payload.length <= targetBytes) payload
            else {
              val stride = payload.length.toDouble / targetBytes
              Array.tabulate(targetBytes)(i => payload((i * stride).toInt))
            }
          ResizedMedia(r.getAs[Long]("media_id"), r.getAs[String]("kind"), out)
        }
      }
  }
}
