package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed per-partition in batches.
  *
  * The Spark-side machinery (schema, batch iteration, partitioning,
  * output shape) is real and tested; the actual media codec is STUBBED
  * behind `FakeCodec` — image/audio libraries are not available in this
  * container, so `decode` computes deterministic pseudo-features from the
  * bytes instead. Swapping in a real codec changes ONLY that object.
  */
object Multimodal {

  /** Canonical multimodal schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),      // image | audio | video
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** STUB codec — deterministic pseudo-decode of the payload bytes.
    * A real implementation would JPEG/PNG-decode and produce pixel
    * stats; this one derives the same *shape* of output purely from the
    * byte stream so the pipeline is testable end-to-end.
    */
  object FakeCodec {
    final case class Features(
        width: Int, height: Int, meanByte: Double, headHash: Long)

    def decode(bytes: Array[Byte]): Features = {
      val safe = if (bytes == null) Array.emptyByteArray else bytes
      val n = safe.length
      val mean = if (n == 0) 0.0 else safe.map(b => (b & 0xff).toDouble).sum / n
      // fake dimensions derived from content length — stable, not random
      Features(width = 64 + n % 577, height = 64 + n % 433,
        meanByte = mean,
        headHash = safe.take(16).foldLeft(1125899906842597L)(
          (h, b) => 31 * h + (b & 0xff)))
    }
  }

  /** STUB resize — a real codec would rescale pixels; the fake keeps the
    * content-derived stats and stamps the requested dimensions, so the
    * batch plumbing (schema change, per-partition execution) is real.
    */
  def resizeFeatures(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = FakeCodec.decode(bytes)
        (id, width, height, f.meanByte, f.headHash)
      })
      .toDF("media_id", "width", "height", "mean_byte", "head_hash")
  }

  /** STUB frame sampling — emits `nFrames` evenly spaced windows of the
    * payload as per-frame rows (media_id, frame_idx, frame fake-feature),
    * the shape video frame-extraction produces: one input row fans out
    * to n output rows inside the partition, no shuffle.
    */
  def sampleFrames(media: DataFrame, nFrames: Int,
      window: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val safe = if (bytes == null) Array.emptyByteArray else bytes
        val n = safe.length
        (0 until nFrames).map { i =>
          val off = if (nFrames == 1) 0
                    else math.max(0, (n - window)) * i / (nFrames - 1)
          val frame = safe.slice(off, math.min(n, off + window))
          val f = FakeCodec.decode(frame)
          (id, i, off, f.meanByte, f.headHash)
        }
      })
      .toDF("media_id", "frame_idx", "offset", "frame_mean", "frame_hash")
  }

  val featuresSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("head_hash", LongType)))

  /** Batched per-partition decode — the `mapInPandas`-shaped entry point
    * (iterator-of-batches in, iterator-of-batches out; in Scala the
    * idiomatic carrier is `mapPartitions` over Rows). One codec instance
    * per partition, no driver involvement, no shuffle: decode is
    * embarrassingly parallel and scales with input partitions.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => // one codec instance per partition
        batch.map { case (id, bytes) =>
          val f = FakeCodec.decode(bytes)
          (id, f.width, f.height, f.meanByte, f.headHash)
        }
      }
      .toDF("media_id", "width", "height", "mean_byte", "head_hash")
  }

  /** Expression-only feature extraction (no codec): byte length, content
    * fingerprint, fake sample-rate bucketing — the operations that stay
    * cheap enough to run inline in a scan at 100 TB.
    */
  def inlineFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.kind").as("kind"),
      octet_length(col("content")).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      (octet_length(col("content")) % 44100).as("fake_rate"))
}
