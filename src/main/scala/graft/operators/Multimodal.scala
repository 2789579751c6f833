package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as partition-batched transforms.
  *
  * Image decode ([[decodeImages]], `javax.imageio`) and audio decode
  * ([[decodeAudio]], `javax.sound.sampled`) are REAL — both pure-JDK.
  * Only video decode is stubbed (`decodeStub`: the JDK has no video
  * codec and this container has no media libraries); the stub produces
  * a deterministic fake feature from the payload bytes so everything
  * around it — the asset schema, the binary column handling, the
  * per-partition batch shape (the Scala analogue of `mapInPandas`
  * batches), partitioning by asset id — stays real and tested.
  */
object Multimodal {

  /** Canonical asset row: a multimodal record with an opaque payload. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),           // image | audio | video
    StructField("payload", BinaryType),            // opaque encoded bytes
    StructField("media_format", StringType),       // e.g. jpeg, wav, mp4
    StructField("source", StringType)))

  /** Wrap any (id, string-content) frame into the asset shape — lets the
    * `documents` testdata stand in for a media corpus.
    */
  def fromText(df: DataFrame, id: String, content: String,
               modality: String = "image", format: String = "raw"): DataFrame =
    df.select(
      col(id).cast(LongType).as("asset_id"),
      lit(modality).as("modality"),
      col(content).cast(BinaryType).as("payload"),
      lit(format).as("media_format"),
      lit("testdata").as("source"))

  /** Cheap metadata pass — pure expressions, no decode needed. */
  def withMetadata(assets: DataFrame): DataFrame =
    assets
      .withColumn("n_bytes", octet_length(col("payload")).cast(LongType))
      .withColumn("digest", md5(col("payload")))

  final case class AssetFeature(asset_id: Long, modality: String,
                                n_bytes: Long, feature: Array[Float])

  /** Partition-batched decode + feature extraction. At scale each task
    * decodes its partition's assets in one batch (the `mapInPandas`
    * shape: Iterator[batch] => Iterator[batch]) so per-record library
    * setup is amortized.
    *
    * STUB: a real implementation would decode `payload` with an image /
    * audio codec here. This one derives a deterministic 8-dim feature
    * from the payload bytes so the plumbing (schema, batching,
    * determinism, downstream joins) is fully testable.
    */
  def decodeStub(assets: DataFrame, dim: Int = 8): Dataset[AssetFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one-time per-partition "codec init" would go here
        batch.map { case (id, modality, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          val feature = Array.tabulate(dim) { j =>
            if (bytes.isEmpty) 0f
            else {
              var acc = 0
              var i = j
              while (i < bytes.length) { acc = acc * 31 + (bytes(i) & 0xff); i += dim }
              (acc & 0xffff) / 65535.0f
            }
          }
          AssetFeature(id, modality, bytes.length.toLong, feature)
        }
      }
  }

  final case class DecodedImage(asset_id: Long, width: Int, height: Int,
                                format: String, n_bytes: Long,
                                luma: Array[Float])

  /** REAL image decode for the `image` modality — pure-JVM
    * `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the JDK, no
    * external codec needed). Two-phase, batch-shaped like [[decodeStub]]:
    *
    *  1. header probe via `ImageReader.getWidth/getHeight` — reads only
    *     the image header, not the pixel data, so corpus-wide metadata
    *     extraction never pays full decode cost;
    *  2. an 8×8 luma thumbnail feature via full decode + deterministic
    *     nearest-neighbor grid sampling of `getRGB` (no AWT Graphics, so
    *     it is headless-safe and bit-reproducible across JVMs).
    *
    * Undecodable payloads yield (-1, -1, null, n_bytes, empty) rather
    * than failing the task — at 100 TB some fraction of any corpus is
    * corrupt, and a poison record must not kill the job. Audio has its
    * own real decoder ([[decodeAudio]]); only video stays on
    * [[decodeStub]].
    */
  def decodeImages(assets: DataFrame, grid: Int = 8): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              try {
                r.setInput(iis)
                val (w, h) = (r.getWidth(0), r.getHeight(0))
                val img = r.read(0)
                val luma = Array.tabulate(grid * grid) { i =>
                  val (gy, gx) = (i / grid, i % grid)
                  val px = img.getRGB(gx * w / grid, gy * h / grid)
                  val (rr, gg, bb) =
                    ((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
                  (0.299f * rr + 0.587f * gg + 0.114f * bb) / 255.0f
                }
                DecodedImage(id, w, h, r.getFormatName.toLowerCase,
                  bytes.length.toLong, luma)
              } finally r.dispose()
            } else DecodedImage(id, -1, -1, null, bytes.length.toLong,
              Array.emptyFloatArray)
          } catch {
            case _: Exception =>
              DecodedImage(id, -1, -1, null, bytes.length.toLong,
                Array.emptyFloatArray)
          }
        }
      }
  }

  final case class DecodedAudio(asset_id: Long, sample_rate: Double,
                                channels: Int, frames: Long,
                                duration_ns: Long, n_bytes: Long,
                                rms: Array[Float])

  /** REAL audio decode for the `audio` modality — pure-JVM
    * `javax.sound.sampled` (the WAV/AIFF/AU PCM codecs ship with the
    * JDK, no external library). Same two-phase shape as [[decodeImages]]:
    *
    *  1. header probe via `AudioSystem.getAudioFileFormat` — sample
    *     rate, channels, and frame count come from the RIFF header, so
    *     metadata extraction never touches the sample data (duration_ns
    *     = frames / frame_rate, the reference's nanosecond convention);
    *  2. a `grid`-segment RMS-loudness feature via full PCM decode —
    *     fixed-order double accumulation over 8/16-bit samples, so the
    *     value is bit-reproducible across JVMs and partitionings.
    *
    * Undecodable payloads (wrong container, compressed encodings the JDK
    * lacks, truncated bytes) yield (-1, …, empty) rather than failing
    * the task — the same poison-record contract as [[decodeImages]].
    * Only VIDEO remains on [[decodeStub]] (the JDK genuinely has no
    * video codec).
    */
  def decodeAudio(assets: DataFrame, grid: Int = 8): Dataset[DecodedAudio] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              val frames = ais.getFrameLength
              val durationNs =
                if (fmt.getFrameRate > 0 && frames >= 0)
                  math.round(frames * (1e9 / fmt.getFrameRate))
                else -1L
              val pcm = ais.readAllBytes()
              DecodedAudio(id, fmt.getSampleRate.toDouble, fmt.getChannels,
                frames, durationNs, bytes.length.toLong,
                rmsGrid(pcm, fmt, grid))
            } finally ais.close()
          } catch {
            case _: Exception =>
              DecodedAudio(id, -1.0, -1, -1L, -1L, bytes.length.toLong,
                Array.emptyFloatArray)
          }
        }
      }
  }

  /** Per-segment RMS loudness over raw PCM bytes: the frame range is
    * split into `grid` equal segments; each segment's value is
    * sqrt(mean(sample²)) over every channel sample in [-1, 1].
    * Supports the PCM widths the JDK WAV reader emits (16-bit signed
    * either endianness, 8-bit signed/unsigned); other widths contribute
    * silence rather than throwing — feature degradation, not job death.
    */
  private def rmsGrid(pcm: Array[Byte],
                      fmt: javax.sound.sampled.AudioFormat,
                      grid: Int): Array[Float] = {
    val bytesPerSample = fmt.getSampleSizeInBits / 8
    val frameSize = fmt.getFrameSize
    val nFrames = if (frameSize > 0) pcm.length / frameSize else 0
    if (nFrames == 0 || bytesPerSample == 0) return Array.emptyFloatArray
    val unsigned8 =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    Array.tabulate(grid) { g =>
      val lo = g.toLong * nFrames / grid
      val hi = (g + 1).toLong * nFrames / grid
      if (hi <= lo) 0f
      else {
        var acc = 0.0
        var n = 0L
        var f = lo
        while (f < hi) {
          var c = 0
          while (c < fmt.getChannels) {
            val off = (f * frameSize + c.toLong * bytesPerSample).toInt
            val s = fmt.getSampleSizeInBits match {
              case 16 =>
                val v =
                  if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
                  else (pcm(off + 1) << 8) | (pcm(off) & 0xff)
                v / 32768.0
              case 8 =>
                if (unsigned8) ((pcm(off) & 0xff) - 128) / 128.0
                else pcm(off) / 128.0
              case _ => 0.0
            }
            acc += s * s
            n += 1
            c += 1
          }
          f += 1
        }
        math.sqrt(acc / n).toFloat
      }
    }
  }

  /** Encode PCM float samples ([-1,1], interleaved channels) as a WAV
    * byte payload (test-fixture helper, the audio twin of [[pngBytes]]).
    */
  def wavBytes(samples: Array[Float], sampleRate: Float = 16000f,
               channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, math.round(samples(i) * 32767f)))
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      samples.length.toLong / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Encode a BufferedImage to PNG bytes (test-fixture helper — lets
    * specs synthesize real image payloads without bundling binaries).
    */
  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Resize stub: deterministic byte-budget "re-encode" of each payload
    * (every k-th byte up to `targetBytes`) with before/after metadata —
    * the column shapes and partition behavior of a real thumbnailer,
    * without the codec.
    */
  def resizeStub(assets: DataFrame, targetBytes: Int): Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          val out =
            if (bytes.length <= targetBytes) bytes
            else {
              val stride = math.max(1, bytes.length / targetBytes)
              bytes.indices.collect { case i if i % stride == 0 => bytes(i) }
                .take(targetBytes).toArray
            }
          ResizedAsset(id, bytes.length.toLong, out.length.toLong, out)
        }
      }
  }

  final case class ResizedAsset(asset_id: Long, orig_bytes: Long,
                                resized_bytes: Long, payload: Array[Byte])

  /** Frame-sampling stub for video payloads: emits `n` (offset, slice)
    * pseudo-frames per asset — the explode/partition shape of real frame
    * extraction without the codec.
    */
  def frameSampleStub(assets: DataFrame, n: Int): DataFrame =
    assets
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * octet_length(col("payload")) / n).cast(LongType))
      .select("asset_id", "modality", "frame_idx", "frame_offset")
}
