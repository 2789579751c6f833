package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as partition-batched transforms.
  *
  * Image decode ([[decodeImages]], `javax.imageio`), audio decode
  * ([[decodeAudio]], `javax.sound.sampled`) and video metadata
  * ([[probeVideos]], hand-rolled MP4/ISO-BMFF + Matroska/EBML
  * container header parsing — [[VideoProbe]]) are all REAL and
  * pure-JVM. The only stubs left are generic-feature/frame-PIXEL
  * extraction ([[decodeStub]], [[frameSampleStub]], [[resizeStub]]):
  * those need an actual video codec, which neither the JDK nor this
  * container has — the declared descope is the codec, not the
  * container (SURVEY §2.1). The stubs produce deterministic fakes so
  * everything around them — the asset schema, binary column handling,
  * the per-partition batch shape (the Scala analogue of `mapInPandas`
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
    * own real decoder ([[decodeAudio]]), video its own real header
    * probe ([[probeVideos]]).
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
    * Video metadata has its own real probe ([[probeVideos]]); only
    * frame-pixel extraction stays stubbed (no JVM video codec exists).
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

  // -------------------------------------- perceptual-hash image dedup

  /** 64-bit average-hash (aHash) per decodable image — the classic
    * perceptual fingerprint over [[decodeImages]]'s luma thumbnail:
    * bit i set iff luma cell i exceeds the thumbnail's mean. Both the
    * mean and the bit sum are position-ordered left folds over the
    * 64-cell array (the dot-product float discipline), so the hash is
    * deterministic on any partitioning. Undecodable payloads are
    * excluded (no pixels, no hash) — the corrupt-safe contract.
    *
    * @return (asset_id, ahash: long)
    */
  def imageAHash(assets: DataFrame, grid: Int = 8): DataFrame = {
    require(grid * grid <= 64, s"grid ($grid) must satisfy grid² <= 64")
    val cells = grid * grid
    decodeImages(assets, grid).toDF()
      .filter(col("width") > 0)
      .withColumn("__mean",
        aggregate(col("luma"), lit(0.0d), (a, x) => a + x) / cells)
      .select(col("asset_id"),
        aggregate(
          zip_with(col("luma"),
            sequence(lit(0), lit(cells - 1)),
            (v, i) => when(v > col("__mean"),
                call_function("shiftleft", lit(1L), i))
              .otherwise(lit(0L))),
          lit(0L), (a, x) => a.bitwiseOR(x)).as("ahash"))
  }

  /** Image near-duplicate pairs — the banded Hamming join over the
    * aHash, delegated to the hash-agnostic pair stage
    * [[Dedup.hammingPairs]]: `maxHamming + 1` DERIVED bands, so the
    * pigeonhole full-recall guarantee holds at EVERY legal
    * `maxHamming` (the round-10 version hard-coded four 16-bit bands,
    * whose guarantee only covers distance ≤ 3 — a pair whose 4-6
    * differing bits straddled all four bands was silently missed at
    * the default maxHamming = 6; derived bands close that recall
    * hole). Candidates are an equi-join on (band, key) — never
    * all-pairs; the exact `bit_count(xor)` verifies. A
    * re-encoded/resized copy of an image lands within a few bits of
    * the original where a byte-level fingerprint ([[Dedup.exact]])
    * sees two unrelated blobs.
    *
    * The decode→hash step is spec-gated (no DuckDB image decode); the
    * relational pair stage itself is oracle-gated through q191, which
    * runs [[Dedup.hammingPairs]] over SQL-expressible fingerprints.
    *
    * @return (asset_a, asset_b, hamming), asset_a < asset_b
    */
  def imageNearDupPairs(assets: DataFrame, grid: Int = 8,
                        maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(imageAHash(assets, grid), col("asset_id"),
        col("ahash"), bits = 64, maxHamming = maxHamming)
      .select(col("id_a").as("asset_a"), col("id_b").as("asset_b"),
        col("hamming").cast(LongType).as("hamming"))

  // ---------------------------------- perceptual-hash audio dedup

  final case class AudioFingerprint(asset_id: Long, afp: Long)

  /** 64-bit perceptual audio fingerprint — the audio twin of
    * [[imageAHash]], closing the perceptual near-dup family across
    * both decodable modalities: the clip is mixed to mono, split into
    * 8 equal TIME segments, and each segment's energy is measured in
    * 9 fixed FREQUENCY bands (Goertzel filterbank sums — one
    * second-order recurrence per band, no FFT dependency) at
    * geometrically-spaced centers 250·2^(b/3) Hz (250–1587 Hz, under
    * the Nyquist limit of even telephone-rate audio so a resampled
    * copy keeps every band). Bit (t, b) is set iff segment t's energy
    * in band b exceeds band b+1 — 8×8 adjacent-band comparisons, the
    * Chromaprint-style sign structure: comparisons are invariant
    * under gain scaling and robust under resampling/re-encoding,
    * where the raw energies are not.
    *
    * Determinism: band centers are fixed in Hz (analysis adapts to
    * each clip's own sample rate via the Goertzel coefficient), and
    * every accumulation is a fixed-order per-clip loop — the value is
    * bit-reproducible across JVMs and partitionings (spec-pinned).
    * Undecodable or empty payloads are excluded (no samples, no
    * fingerprint) — the corrupt-safe contract of [[decodeImages]].
    *
    * @return (asset_id, afp: long)
    */
  def audioFingerprint(assets: DataFrame): Dataset[AudioFingerprint] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              val mono = monoSamples(ais.readAllBytes(), fmt)
              if (mono.length == 0 || fmt.getSampleRate <= 0) None
              else Some(AudioFingerprint(id,
                bandCompareBits(mono, fmt.getSampleRate.toDouble)))
            } finally ais.close()
          } catch { case _: Exception => None }
        }
      }
  }

  /** Audio near-duplicate pairs — [[Dedup.hammingPairs]] over the
    * fingerprint, exactly [[imageNearDupPairs]]'s shape: derived
    * `maxHamming + 1` bands (pigeonhole full recall), equi-join
    * candidates, exact bit_count verify. A re-encoded or resampled
    * copy of a clip lands within a few bits of its original where
    * [[Dedup.exact]] sees unrelated blobs. The decode→fingerprint
    * step is spec-gated (no DuckDB audio decode); the relational pair
    * stage is oracle-gated through q191.
    *
    * @return (asset_a, asset_b, hamming), asset_a < asset_b
    */
  def audioNearDupPairs(assets: DataFrame, maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(audioFingerprint(assets).toDF(), col("asset_id"),
        col("afp"), bits = 64, maxHamming = maxHamming)
      .select(col("id_a").as("asset_a"), col("id_b").as("asset_b"),
        col("hamming").cast(LongType).as("hamming"))

  /** Mono [-1,1] samples from raw PCM bytes (channel-averaged per
    * frame) — the PCM widths the JDK WAV reader emits; unsupported
    * widths yield an empty array (degrade, don't throw).
    */
  private def monoSamples(pcm: Array[Byte],
                          fmt: javax.sound.sampled.AudioFormat): Array[Double] = {
    val bytesPerSample = fmt.getSampleSizeInBits / 8
    val frameSize = fmt.getFrameSize
    val nFrames = if (frameSize > 0) pcm.length / frameSize else 0
    if (nFrames == 0 || bytesPerSample == 0 ||
        (fmt.getSampleSizeInBits != 16 && fmt.getSampleSizeInBits != 8))
      return Array.emptyDoubleArray
    val unsigned8 =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    Array.tabulate(nFrames) { f =>
      var acc = 0.0
      var c = 0
      while (c < fmt.getChannels) {
        val off = (f.toLong * frameSize + c.toLong * bytesPerSample).toInt
        acc += (fmt.getSampleSizeInBits match {
          case 16 =>
            val v =
              if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
              else (pcm(off + 1) << 8) | (pcm(off) & 0xff)
            v / 32768.0
          case _ =>
            if (unsigned8) ((pcm(off) & 0xff) - 128) / 128.0
            else pcm(off) / 128.0
        })
        c += 1
      }
      acc / fmt.getChannels
    }
  }

  private val FpSegments = 8
  private val FpBands = 9 // 8 adjacent comparisons per segment

  /** Goertzel power of `x[lo, hi)` at absolute frequency `hz`. */
  private def goertzel(x: Array[Double], lo: Int, hi: Int,
                       hz: Double, sampleRate: Double): Double = {
    val coeff = 2.0 * math.cos(2.0 * math.Pi * hz / sampleRate)
    var s1 = 0.0; var s2 = 0.0
    var i = lo
    while (i < hi) {
      val s0 = x(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  private def bandCompareBits(mono: Array[Double],
                              sampleRate: Double): Long = {
    var bits = 0L
    var t = 0
    while (t < FpSegments) {
      val lo = (t.toLong * mono.length / FpSegments).toInt
      val hi = ((t + 1).toLong * mono.length / FpSegments).toInt
      val e = Array.tabulate(FpBands)(b =>
        goertzel(mono, lo, hi, 250.0 * math.pow(2.0, b / 3.0), sampleRate))
      var b = 0
      while (b < FpBands - 1) {
        if (e(b) > e(b + 1)) bits |= 1L << (t * (FpBands - 1) + b)
        b += 1
      }
      t += 1
    }
    bits
  }

  final case class ProbedImage(asset_id: Long, format: String,
                               width: Int, height: Int, bit_depth: Int,
                               n_bytes: Long)

  /** Header-walk image metadata ([[ImageProbe]]) — the image twin of
    * [[probeVideos]]: format, dimensions, and native bit depth for
    * PNG/JPEG/GIF/BMP from the header structure alone, NO decoder.
    * This is the 100 TB metadata pass (aspect filters, size
    * histograms, decode-cost budgeting, corrupt-rate monitors): cost
    * is header bytes per asset, independent of asset size — and it
    * reads formats [[decodeImages]]' ImageIO path may lack codecs
    * for. Poison-record contract as everywhere in this module:
    * unparseable payloads yield (null, -1, -1, -1, n_bytes).
    * Spec law: for ImageIO-decodable fixtures the probed dimensions
    * equal [[decodeImages]]' decoded dimensions.
    */
  def probeImages(assets: DataFrame): Dataset[ProbedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          ImageProbe.probe(bytes) match {
            case Some((fmt, w, h, depth)) =>
              ProbedImage(id, fmt, w, h, depth, bytes.length.toLong)
            case None =>
              ProbedImage(id, null, -1, -1, -1, bytes.length.toLong)
          }
        }
      }
  }

  final case class ProbedVideo(asset_id: Long, container: String,
                               width: Int, height: Int,
                               duration_ns: Long, n_bytes: Long)

  /** REAL video metadata for the `video` modality (round 5 — closes the
    * last declared stub): container HEADER parsing for the two families
    * that carry virtually all video at corpus scale — MP4/ISO-BMFF
    * (`ftyp`/`moov`/`mvhd`/`tkhd` boxes) and Matroska/WebM (EBML
    * `Info`/`Tracks` elements). Dimensions, duration and container
    * brand live in the header structure, NOT the codec payload, so
    * they are readable without any codec — the JDK has none, and frame
    * DECODE therefore remains out of scope by design (recorded in
    * SURVEY §2.1), exactly as a 100 TB metadata pass would want anyway:
    * probe cost is independent of asset size.
    *
    * Same poison-record contract as [[decodeImages]]: unparseable or
    * truncated payloads yield (null, -1, -1, -1, n_bytes), never a
    * task failure.
    */
  def probeVideos(assets: DataFrame): Dataset[ProbedVideo] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val bytes = Option(payload).getOrElse(Array.emptyByteArray)
          VideoProbe.probe(bytes) match {
            case Some((container, w, h, durNs)) =>
              ProbedVideo(id, container, w, h, durNs, bytes.length.toLong)
            case None =>
              ProbedVideo(id, null, -1, -1, -1L, bytes.length.toLong)
          }
        }
      }
  }

  /** Minimal valid MP4 container bytes (test-fixture helper, the video
    * twin of [[pngBytes]]): ftyp + moov{mvhd, trak{tkhd}} with the
    * given dimensions and duration. No media data — exactly the
    * header structure [[VideoProbe]] reads, byte-laid to the ISO-BMFF
    * field offsets.
    */
  def mp4Bytes(width: Int, height: Int, durationMs: Long,
               brand: String = "isom"): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
    val timescale = 1000L // ticks = ms
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++ u32(durationMs) ++
        Array.fill[Byte](80)(0))
    val tkhdBody =
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(durationMs) ++
        Array.fill[Byte](52)(0) ++
        u32(width.toLong << 16) ++ u32(height.toLong << 16)
    val moov = box("moov", mvhd ++ box("trak", box("tkhd", tkhdBody)))
    box("ftyp", brand.getBytes("ISO-8859-1") ++ u32(0)) ++ moov
  }

  /** Minimal valid Matroska container bytes (test-fixture helper):
    * EBML header + Segment{Info{TimestampScale, Duration},
    * Tracks{TrackEntry{Video{PixelWidth, PixelHeight}}}}.
    */
  def mkvBytes(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    def id(v: Long): Array[Byte] = {
      // element ids are written with their marker bits as stored
      val n = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
      (1 to n.toInt).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray
    }
    def sz(v: Int): Array[Byte] = { require(v < 127); Array((0x80 | v).toByte) }
    def uint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >> (8 * n)) != 0) n += 1
      (1 to n).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray
    }
    def el(eid: Long, body: Array[Byte]): Array[Byte] =
      id(eid) ++ sz(body.length) ++ body
    val durBits = java.lang.Float.floatToIntBits(durationMs.toFloat)
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uint(1000000L)) ++ // ns per tick (ticks = ms)
        el(0x4489L, Array(
          ((durBits >> 24) & 0xff).toByte, ((durBits >> 16) & 0xff).toByte,
          ((durBits >> 8) & 0xff).toByte, (durBits & 0xff).toByte)))
    val tracks = el(0x1654AE6BL,
      el(0xAEL, el(0xE0L,
        el(0xB0L, uint(width.toLong)) ++ el(0xBAL, uint(height.toLong)))))
    el(0x1A45DFA3L, Array.emptyByteArray) ++ el(0x18538067L, info ++ tracks)
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
