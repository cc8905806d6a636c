package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Metadata

/** Multimodal column handling — the mandate's image/audio/video surface.
  *
  * Design: media are opaque `binary` columns + a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * transforms over `Dataset[MediaRow]` (mapPartitions: one decoder init
  * per partition, vectorized batch through the partition iterator — the
  * same batch shape a Pandas-UDF/Arrow path would have in PySpark).
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-features from the
  * real header metadata + content hash, so every schema, partition, and
  * pipeline contract is real and tested while the codec body remains a
  * drop-in replacement point — swap [[MediaDecoder.decode]] for a JNI/
  * javacv call and nothing else changes.
  */
object Multimodal {

  /** Typed media row: the storage schema for a multimodal table.
    * Dimension fields are -1 when unknown / not applicable to the kind
    * (images carry width/height, audio carries sample_rate/duration_ms —
    * both decoded from real headers by [[Metadata.sniff]]). */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Decoded feature row: fixed-width embedding per media item. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** The codec seam. Real implementation would JNI into an image/audio
    * library; the stub derives deterministic values from content bytes. */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow, featureDim: Int): MediaFeatures
  }

  /** Deterministic fake decoder: features = normalized xxhash-style PRNG
    * seeded by (media_id, content hash); frame count derived from length.
    * Everything downstream of the codec seam is real.
    */
  object decodeStub extends MediaDecoder {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def decode(row: MediaRow, featureDim: Int): MediaFeatures = {
      val contentHash = java.util.Arrays.hashCode(row.content).toLong
      val seed = mix(row.media_id * 31L + contentHash)
      val feats = Array.tabulate(featureDim) { i =>
        // uniform in [-1, 1), deterministic per (seed, i)
        (mix(seed + i).toDouble / Long.MaxValue.toDouble).toFloat
      }
      val frames = row.kind match {
        case "video" => 1 + (row.content.length % 16)
        case _       => 1
      }
      MediaFeatures(row.media_id, row.kind, row.width, row.height, frames, feats)
    }
  }

  /** Ingest: raw (id, kind, bytes) -> typed media table with sniffed
    * header metadata. Pure column expressions + the D1 sniff UDF. */
  def ingest(raw: DataFrame): DataFrame = {
    val meta = Metadata.sniffUdf(col("content"))
    raw
      .withColumn("m", meta)
      .select(
        col("media_id"), col("kind"), col("content"),
        coalesce(element_at(col("m"), "mime"),
          lit("application/octet-stream")).as("mime"),
        coalesce(element_at(col("m"), "width").cast("int"), lit(-1)).as("width"),
        coalesce(element_at(col("m"), "height").cast("int"), lit(-1)).as("height"),
        coalesce(element_at(col("m"), "sample_rate").cast("int"), lit(-1))
          .as("sample_rate"),
        coalesce(element_at(col("m"), "duration_ms").cast("long"), lit(-1L))
          .as("duration_ms"))
  }

  /** Feature extraction over a typed media Dataset: partition-local decode
    * (decoder initialized once per partition, not per row). */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = decodeStub,
      featureDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never construct them per row)
      rows.map(r => decoder.decode(r, featureDim))
    }
  }

  /** Frame sampling plumbing for video: explode n_frames into one row per
    * sampled frame index with a per-frame feature slice (stubbed via a
    * frame-seeded rehash of the clip features). */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int = 4): DataFrame = {
    import features.sparkSession.implicits._
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"),
        col("features"))
      .select(col("media_id"), col("frame_idx"),
        // per-frame variation: rotate the clip feature vector by frame_idx
        expr("concat(slice(features, frame_idx % size(features) + 1, " +
          "size(features) - frame_idx % size(features)), " +
          "slice(features, 1, frame_idx % size(features)))").as("frame_features"))
  }

  /** End-to-end pipeline: raw binaries -> typed table -> features. */
  def pipeline(spark: SparkSession, raw: DataFrame, featureDim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(ingest(raw).as[MediaRow], decodeStub, featureDim)
  }
}
