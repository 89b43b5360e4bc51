package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](64)(10), Row(32, 32, null, null)),
      Row(2L, "image", Array.fill[Byte](256)(-1), Row(2000, 1000, null, null)),
      Row(3L, "audio", Array.tabulate[Byte](100)(i => i.toByte), Row(null, null, 16000, null)),
      Row(4L, "video", Array.tabulate[Byte](64)(i => i.toByte), Row(64, 48, null, 4)),
      Row(5L, "image", null, Row(8, 8, null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  // (media_id, kind, payload) frame for image APIs, which only read those
  private def imageFrame(rows: Seq[(Long, Array[Byte])]) = {
    val rdd = spark.sparkContext.parallelize(
      rows.map { case (id, p) => Row(id, "image", p, null) }, 2)
    spark.createDataFrame(rdd, Multimodal.mediaSchema)
  }

  test("real PNG decode: stats match the synthesis closed form") {
    // synthPng pixel value at linear index i is (id*31 + i) mod 256 —
    // recompute the expected sums by hand, independent of any decoder
    val cases = Seq((7L, 4, 2), (200L, 8, 6), (123456789L, 16, 10))
    val df = imageFrame(cases.map { case (id, w, h) =>
      id -> Multimodal.synthPng(id, w, h) })
    val got = Multimodal.imageStats(df).collect().map(s => s.media_id -> s).toMap
    cases.foreach { case (id, w, h) =>
      val vals = (0 until w * h * 3).map(i => ((id * 31 + i) % 256).toInt)
      val s = got(id)
      assert(s.ok && s.err == null)
      assert((s.width, s.height) == ((w, h)))
      assert(s.sum_r == vals.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v.toLong }.sum)
      assert(s.sum_g == vals.zipWithIndex.collect { case (v, i) if i % 3 == 1 => v.toLong }.sum)
      assert(s.sum_b == vals.zipWithIndex.collect { case (v, i) if i % 3 == 2 => v.toLong }.sum)
      assert(s.min_px == vals.min && s.max_px == vals.max)
    }
  }

  test("corrupt / truncated / empty payloads quarantine instead of failing") {
    val valid = Multimodal.synthPng(1L, 4, 4)
    val df = imageFrame(Seq(
      1L -> valid,
      2L -> "definitely not a png".getBytes("UTF-8"),
      3L -> valid.take(20), // valid signature, truncated body
      4L -> null,
      5L -> Array.empty[Byte]))
    val ok = Multimodal.imageStatsOk(df).collect().map(_.getAs[Long]("media_id"))
    assert(ok.toSet == Set(1L))
    val quarantined = Multimodal.imageQuarantine(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("err")).toMap
    assert(quarantined.keySet == Set(2L, 3L, 4L, 5L))
    assert(quarantined.values.forall(e => e != null && e.nonEmpty))
  }

  test("frame sampling explodes fixed-size windows (video only)") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2).collect()
    assert(frames.forall(_.getAs[Long]("media_id") == 4L))
    assert(frames.length == 2) // 64 bytes / (16*2) = 2 frames
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 16))
  }

  test("audio windows overlap by frame-hop and truncate the tail (audio only)") {
    // doc 3: 100 bytes, frame 40, hop 20 -> starts 0,20,40,60 = 4 windows;
    // last is 40 bytes (60+40 = 100 exactly)
    val w = Multimodal.audioWindows(media, frameBytes = 40, hopBytes = 20).collect()
    assert(w.forall(_.getAs[Long]("media_id") == 3L))
    assert(w.length == 4)
    val bytes = w.sortBy(_.getAs[Int]("window_idx"))
      .map(_.getAs[Array[Byte]]("window_bytes"))
    assert(bytes.forall(_.length == 40))
    // 50% overlap: second half of window 0 == first half of window 1
    assert(bytes(0).drop(20).toSeq == bytes(1).take(20).toSeq)
    // payload shorter than one frame -> single truncated window
    val short = Multimodal.audioWindows(
      media.limit(0).unionByName(media.filter(col("media_id") === 3L))
        .withColumn("payload", expr("substring(payload, 1, 10)")),
      frameBytes = 40, hopBytes = 20).collect()
    assert(short.length == 1)
    assert(short.head.getAs[Array[Byte]]("window_bytes").length == 10)
  }

  test("box-filter resize: exact floor-average pixels, re-encoded PNG decodes back") {
    // 4×2, id=10: output 2×1; output pixel (xo,0) channel c =
    // floor(mean of the 2×2 block) — recomputed by hand from the formula
    val id = 10L
    val df = imageFrame(Seq(id -> Multimodal.synthPng(id, 4, 2)))
    def src(x: Int, y: Int, c: Int) = ((id * 31 + (y * 4 + x) * 3 + c) % 256).toInt
    val out = Multimodal.resizeBox(df, factor = 2).collect().head
    assert(out.ok && out.out_w == 2 && out.out_h == 1)
    // decode the re-encoded payload and check every pixel exactly
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(img.getWidth == 2 && img.getHeight == 1)
    for (xo <- 0 until 2; c <- 0 until 3) {
      val expected = (src(2 * xo, 0, c) + src(2 * xo + 1, 0, c) +
        src(2 * xo, 1, c) + src(2 * xo + 1, 1, c)) / 4
      val rgb = img.getRGB(xo, 0)
      val gotC = c match {
        case 0 => (rgb >> 16) & 0xFF
        case 1 => (rgb >> 8) & 0xFF
        case 2 => rgb & 0xFF
      }
      assert(gotC == expected, s"pixel ($xo,0) channel $c")
    }
    // odd dims: 5×3 at factor 2 floors to 2×1 (edge row/col dropped by
    // the floor output dims; covered blocks are full 2×2)
    val odd = Multimodal.resizeBox(
      imageFrame(Seq(3L -> Multimodal.synthPng(3L, 5, 3))), factor = 2)
      .collect().head
    assert(odd.out_w == 2 && odd.out_h == 1)
    // corrupt payload quarantines with null output
    val bad = Multimodal.resizeBox(
      imageFrame(Seq(9L -> Array[Byte](1, 2, 3))), factor = 2).collect().head
    assert(!bad.ok && bad.payload == null && bad.err.nonEmpty)
  }

  test("real WAV decode: stats match the synthesis closed form, corrupt quarantines") {
    // synthWav sample i is ((id*37 + i*13) mod 65536) - 32768
    val cases = Seq((3L, 50, 8000), (999L, 277, 16000))
    def audioFrame(rows: Seq[(Long, Array[Byte])]) = {
      val rdd = spark.sparkContext.parallelize(
        rows.map { case (id, p) => Row(id, "audio", p, null) }, 2)
      spark.createDataFrame(rdd, Multimodal.mediaSchema)
    }
    val df = audioFrame(cases.map { case (id, n, sr) =>
      id -> Multimodal.synthWav(id, n, sr) } :+
      (7L -> "not a wav at all".getBytes("UTF-8")))
    val got = Multimodal.audioStats(df).collect().map(s => s.media_id -> s).toMap
    cases.foreach { case (id, n, sr) =>
      val amps = (0 until n).map(i => (((id * 37 + i * 13) % 65536) - 32768).toInt)
      val s = got(id)
      assert(s.ok && s.err == null)
      assert(s.sample_rate == sr && s.n_samples == n.toLong)
      assert(s.sum_amp == amps.map(_.toLong).sum)
      assert(s.min_amp == amps.min && s.max_amp == amps.max)
    }
    assert(!got(7L).ok && got(7L).err.nonEmpty)
  }

  test("metadata-only query prunes the payload column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/media"
    media.write.mode("overwrite").parquet(dir)
    val q = Multimodal.smallImages(spark.read.parquet(dir), maxWidth = 100)
    assert(q.collect().map(_.getAs[Long]("media_id")).toSet == Set(1L, 5L))
    val scan = q.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"), readSchema)
  }
}
