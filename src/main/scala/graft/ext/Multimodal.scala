package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed per-partition in batches.
  *
  * The Spark-side machinery (schema, batch iteration, partitioning,
  * output shape) is real and tested. The codec decodes PNG/JPEG/GIF/BMP
  * payloads with the JDK-native `javax.imageio` (no external media
  * libraries needed); bytes no installed reader recognizes — including
  * audio/video, for which the JDK ships no codec — fall back to a
  * deterministic pseudo-decode of the byte stream, so the pipeline
  * stays testable end-to-end on arbitrary payloads. Swapping in a
  * fuller codec (audio frames, video demux) changes ONLY that object.
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

  /** Media codec: real `javax.imageio` decode for image payloads, with
    * a deterministic pseudo-decode fallback for bytes no reader accepts
    * (corrupt images, or audio/video the JDK has no codec for). The
    * fallback derives the same *shape* of output purely from the byte
    * stream, so batch plumbing behaves identically on every payload.
    */
  object Codec {
    // In-memory decode only: never spill ImageIO scratch to local disk
    // on executors (also avoids temp-dir permission surprises).
    javax.imageio.ImageIO.setUseCache(false)

    /** @param decoded true = real image decode; false = byte-stream
      *   fallback (width/height are then content-length-derived stand-ins)
      */
    final case class Features(
        width: Int, height: Int, meanByte: Double, headHash: Long,
        decoded: Boolean)

    private def headHashOf(safe: Array[Byte]): Long =
      safe.take(16).foldLeft(1125899906842597L)(
        (h, b) => 31 * h + (b & 0xff))

    def decode(bytes: Array[Byte]): Features = {
      val safe = if (bytes == null) Array.emptyByteArray else bytes
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(safe))
        catch { case _: Exception => null } // undecodable → fallback
      if (img != null) {
        // mean luma over the pixel grid — (r+g+b)/3 per pixel
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        Features(img.getWidth, img.getHeight,
          sum / (img.getWidth.toLong * img.getHeight),
          headHashOf(safe), decoded = true)
      } else {
        val n = safe.length
        val mean =
          if (n == 0) 0.0 else safe.map(b => (b & 0xff).toDouble).sum / n
        // fallback dimensions derived from content length — stable
        Features(width = 64 + n % 577, height = 64 + n % 433,
          meanByte = mean, headHash = headHashOf(safe), decoded = false)
      }
    }
  }

  /** Resize-to-target features: decodes (real or fallback), keeps the
    * content stats and stamps the requested output dimensions — the
    * schema-changing per-partition batch shape of a resize stage. (A
    * pixel-resampling resize would swap `Codec.decode` for an
    * AffineTransform rescale; the Spark plumbing is identical.)
    */
  def resizeFeatures(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = Codec.decode(bytes)
        (id, width, height, f.meanByte, f.headHash)
      })
      .toDF("media_id", "width", "height", "mean_byte", "head_hash")
  }

  /** Frame sampling — emits `nFrames` evenly spaced windows of the
    * payload as per-frame rows (media_id, frame_idx, frame features),
    * the shape video frame-extraction produces: one input row fans out
    * to n output rows inside the partition, no shuffle. Byte windows of
    * a container stream aren't decodable images, so frames take the
    * codec's deterministic fallback path (the JDK ships no video demux).
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
          val f = Codec.decode(frame)
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
    StructField("head_hash", LongType),
    StructField("decoded", BooleanType)))

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
          val f = Codec.decode(bytes)
          (id, f.width, f.height, f.meanByte, f.headHash, f.decoded)
        }
      }
      .toDF("media_id", "width", "height", "mean_byte", "head_hash",
        "decoded")
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

  /** Audio codec: real WAV/AIFF/AU decode via the JDK-native
    * `javax.sound.sampled` (header + PCM stats), with the same
    * deterministic byte-derived fallback contract as [[Codec]] for
    * formats the JDK can't demux (mp3/ogg/video) — the plumbing treats
    * every payload identically either way.
    */
  object AudioCodec {
    final case class Features(
        sampleRate: Int, channels: Int, frames: Long, meanAbs: Double,
        decoded: Boolean)

    def decode(bytes: Array[Byte]): Features = {
      val safe = if (bytes == null) Array.emptyByteArray else bytes
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(safe))
        catch { case _: Exception => null } // not JDK-decodable audio
      if (in != null) {
        val fmt = in.getFormat
        val data = in.readAllBytes()
        // mean |sample| for 16-bit PCM (the WAV norm); byte mean else
        val meanAbs =
          if (fmt.getSampleSizeInBits == 16 && data.length >= 2) {
            val le = !fmt.isBigEndian
            var sum = 0.0; var i = 0
            while (i + 1 < data.length) {
              val lo = data(if (le) i else i + 1) & 0xff
              val hi = data(if (le) i + 1 else i)
              sum += math.abs((hi << 8) | lo); i += 2
            }
            sum / (data.length / 2)
          } else if (data.isEmpty) 0.0
          else data.map(b => (b & 0xff).toDouble).sum / data.length
        // getFrameLength is NOT_SPECIFIED (-1) for unknown-length
        // streams (legal AU headers); the PCM bytes are already fully
        // read, so derive the count from them instead
        val frames =
          if (in.getFrameLength >= 0) in.getFrameLength
          else if (fmt.getFrameSize > 0) data.length.toLong / fmt.getFrameSize
          else data.length.toLong
        Features(fmt.getSampleRate.toInt, fmt.getChannels,
          frames, meanAbs, decoded = true)
      } else {
        val n = safe.length
        Features(sampleRate = 8000 + n % 36000, channels = 1 + n % 2,
          frames = n / 4L,
          meanAbs =
            if (n == 0) 0.0 else safe.map(b => (b & 0xff).toDouble).sum / n,
          decoded = false)
      }
    }
  }

  /** Per-partition batched audio decode — same carrier shape as
    * [[decodeFeatures]]: embarrassingly parallel, no shuffle.
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = AudioCodec.decode(bytes)
        (id, f.sampleRate, f.channels, f.frames, f.meanAbs, f.decoded)
      })
      .toDF("media_id", "sample_rate", "channels", "frames", "mean_abs",
        "decoded")
  }
}
