package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing — mandate surface. The codec is a deterministic
  * stub; the schema, ingest metadata, partition-local decode, and
  * frame-sampling plumbing are real and under test.
  */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.array()
  }

  private def wav(rate: Int, channels: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes).putInt(dataBytes).put(new Array[Byte](dataBytes))
    b.array()
  }

  private def raw = {
    import spark.implicits._
    Seq(
      (1L, "image", png(64, 32)),
      (2L, "image", png(128, 256)),
      (3L, "video", Array.fill[Byte](100)(7)),
      (4L, "audio", wav(rate = 16000, channels = 1, bits = 16, dataBytes = 16000))
    ).toDF("media_id", "kind", "content")
  }

  test("ingest sniffs real header metadata into typed columns") {
    import spark.implicits._
    val m = Multimodal.ingest(raw)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "mime", "width", "height",
        "sample_rate", "duration_ms"))
    val img = m.filter(col("media_id") === 1L)
      .select("mime", "width", "height").as[(String, Int, Int)].head()
    assert(img == ("image/png", 64, 32))
    // audio carries real header metadata in its typed columns
    // (16000 B of 16-bit mono at 16 kHz = 500 ms)
    val audio = m.filter(col("media_id") === 4L)
      .select("mime", "sample_rate", "duration_ms", "width")
      .as[(String, Int, Long, Int)].head()
    assert(audio == ("audio/wav", 16000, 500L, -1))
    // unknown codecs degrade to a safe default, never fail ingest
    val vid = m.filter(col("media_id") === 3L).select("width").as[Int].head()
    assert(vid == -1)
  }

  test("feature extraction is deterministic and partition-independent") {
    import spark.implicits._
    val media = Multimodal.ingest(raw).as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media.repartition(1), featureDim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f4 = Multimodal.extractFeatures(media.repartition(4), featureDim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f4)
    assert(f1(1L).size == 8 && f1(1L) != f1(2L))
    assert(f1.values.flatten.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("video frame sampling explodes n_frames with per-frame features") {
    import spark.implicits._
    val feats = Multimodal.pipeline(spark, raw)
    val vid = feats.filter(_.kind == "video").head()
    val frames = Multimodal.sampleFrames(feats, everyN = 2)
    val got = frames.select("media_id", "frame_idx")
      .as[(Long, Int)].collect().toSet
    val wantIdx = (0 until vid.n_frames by 2).map(i => (3L, i)).toSet
    assert(got == wantIdx)
    // per-frame features differ from the clip vector for rotated frames
    val f = frames.filter(col("frame_idx") =!= 0)
      .select("frame_features").as[Seq[Float]].head()
    assert(f.toSet == vid.features.toSet && f != vid.features.toSeq)
  }

  test("features feed the standard vector ops (cosine knn over media)") {
    import spark.implicits._
    val feats = Multimodal.pipeline(spark, raw).toDF()
    val pairs = feats.as("x").join(feats.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id"),
        graft.functions.Vectors.cosine(col("x.features"), col("y.features")).as("cos"))
    assert(pairs.count() == 6)
    assert(pairs.filter(col("cos").isNull).isEmpty)
  }
}
