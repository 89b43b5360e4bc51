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

  test("batched feature extraction: schema, determinism, null payloads") {
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size == 5)
    assert(feats(1L).n_bytes == 64)
    assert(math.abs(feats(1L).features.sum - 1.0f) < 1e-5f)
    assert(feats(5L).n_bytes == 0)               // null payload → zero features
    assert(feats(5L).features.forall(_ == 0.0f))
    // determinism: same payload → same features
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(again(3L) == feats(3L).features.toSeq)
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

  test("resize stub decimates to the target size, passes small/null through") {
    val out = Multimodal.resizeStub(media, targetBytes = 32).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(2L).payload.length == 32)      // 256 -> 32
    assert(out(1L).payload.length == 32)      // 64 -> 32
    assert(out(5L).payload == null)           // null passes through
    // determinism
    val again = Multimodal.resizeStub(media, targetBytes = 32).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(again(2L).toSeq == out(2L).payload.toSeq)
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
