package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.tables.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val assets = Multimodal.fromText(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("asset wrapping + metadata: binary payloads with typed columns") {
    val meta = Multimodal.withMetadata(assets)
    assert(meta.schema("payload").dataType.typeName === "binary")
    val row = meta.filter(col("asset_id") === 0L).head()
    assert(row.getAs[Long]("n_bytes") > 0)
    assert(row.getAs[String]("digest").length === 32)
  }

  test("decodeStub: deterministic partition-batched features") {
    val f1 = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.decodeStub(assets.repartition(7)).collect().sortBy(_.asset_id)
    assert(f1.length === f2.length)
    // determinism must survive arbitrary repartitioning
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.asset_id === b.asset_id)
      assert(a.feature.toSeq === b.feature.toSeq)
      assert(a.feature.length === 8)
      assert(a.feature.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("decodeImages: real PNG decode via javax.imageio") {
    import java.awt.image.BufferedImage
    // synthesize two real PNGs (gradient + solid) and one corrupt payload
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      Multimodal.pngBytes(img)
    }
    val gradient = png(32, 20, (x, y) => (x * 8 << 16) | (y * 12 << 8) | 0x40)
    val solid = png(16, 16, (_, _) => 0xffffff)
    val rows = Seq(
      (1L, "image", gradient, "png", "fixture"),
      (2L, "image", solid, "png", "fixture"),
      (3L, "image", Array[Byte](1, 2, 3), "raw", "fixture"))
    import spark.implicits._
    val assetsDf = rows.toDF("asset_id", "modality", "payload", "media_format", "source")

    val decoded = Multimodal.decodeImages(assetsDf).collect().sortBy(_.asset_id)
    assert(decoded.map(d => (d.asset_id, d.width, d.height, d.format)).toSeq ===
      Seq((1L, 32, 20, "png"), (2L, 16, 16, "png"), (3L, -1, -1, null)))
    // luma feature: real pixels — solid white decodes to all-ones
    val white = decoded(1).luma
    assert(white.length === 64 && white.forall(v => math.abs(v - 1.0f) < 1e-3))
    assert(decoded(2).luma.isEmpty)
    // deterministic under repartitioning (header+pixels, not task order)
    val again = Multimodal.decodeImages(assetsDf.repartition(5)).collect().sortBy(_.asset_id)
    decoded.zip(again).foreach { case (a, b) =>
      assert(a.luma.toSeq === b.luma.toSeq && a.width === b.width)
    }
  }

  test("decodeAudio: real WAV decode via javax.sound.sampled") {
    // synthesize real WAV payloads: a full-scale 440 Hz tone, a
    // quiet-then-loud two-half signal, digital silence, and one corrupt
    // payload — 1 s at 16 kHz mono, 16-bit signed little-endian PCM
    val sr = 16000
    val tone = Array.tabulate(sr)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / sr)).toFloat)
    val twoHalf = Array.tabulate(sr)(i => if (i < sr / 2) 0.1f else 0.8f)
    val silence = Array.fill(sr)(0f)
    val rows = Seq(
      (1L, "audio", Multimodal.wavBytes(tone), "wav", "fixture"),
      (2L, "audio", Multimodal.wavBytes(twoHalf), "wav", "fixture"),
      (3L, "audio", Multimodal.wavBytes(silence), "wav", "fixture"),
      (4L, "audio", Array[Byte](9, 9, 9), "raw", "fixture"))
    import spark.implicits._
    val assetsDf = rows.toDF("asset_id", "modality", "payload", "media_format", "source")

    val decoded = Multimodal.decodeAudio(assetsDf, grid = 8).collect().sortBy(_.asset_id)
    // header metadata: rate/channels/frames from the RIFF header,
    // duration in the reference's nanosecond convention
    assert(decoded.map(d => (d.asset_id, d.sample_rate, d.channels, d.frames)).toSeq ===
      Seq((1L, 16000.0, 1, 16000L), (2L, 16000.0, 1, 16000L),
        (3L, 16000.0, 1, 16000L), (4L, -1.0, -1, -1L)))
    assert(decoded.take(3).forall(_.duration_ns === 1000000000L))
    // RMS grid: sine at amplitude .5 → rms ≈ .5/√2 in every segment
    val sine = decoded(0).rms
    assert(sine.length === 8 && sine.forall(v => math.abs(v - 0.3536f) < 0.01f))
    // quiet first half, loud second half — the grid localizes loudness
    val halves = decoded(1).rms
    assert(halves.take(4).forall(v => math.abs(v - 0.1f) < 0.01f))
    assert(halves.drop(4).forall(v => math.abs(v - 0.8f) < 0.01f))
    assert(decoded(2).rms.forall(_ === 0f))
    assert(decoded(3).rms.isEmpty)
    // deterministic under repartitioning
    val again = Multimodal.decodeAudio(assetsDf.repartition(5), grid = 8)
      .collect().sortBy(_.asset_id)
    decoded.zip(again).foreach { case (a, b) =>
      assert(a.rms.toSeq === b.rms.toSeq && a.duration_ns === b.duration_ns)
    }
  }

  test("resizeStub enforces the byte budget deterministically") {
    val resized = Multimodal.resizeStub(assets, targetBytes = 64)
      .collect().sortBy(_.asset_id)
    assert(resized.forall(r => r.resized_bytes <= 64))
    assert(resized.forall(r => r.resized_bytes <= r.orig_bytes))
    val again = Multimodal.resizeStub(assets.repartition(5), targetBytes = 64)
      .collect().sortBy(_.asset_id)
    resized.zip(again).foreach { case (a, b) =>
      assert(a.payload.toSeq === b.payload.toSeq)
    }
  }

  test("frameSampleStub explodes n pseudo-frames per asset") {
    val frames = Multimodal.frameSampleStub(assets.limit(3), n = 4)
    assert(frames.count() === 12)
    assert(frames.groupBy("asset_id").count().collect().forall(_.getLong(1) == 4L))
  }

  test("probeVideos: real MP4 + Matroska header parsing, corrupt-safe") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mp4 = Multimodal.mp4Bytes(width = 320, height = 240,
      durationMs = 1500L, brand = "isom")
    val mkv = Multimodal.mkvBytes(width = 1920, height = 1080,
      durationMs = 2750L)
    val truncatedMp4 = mp4.take(20) // box length runs past the buffer
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val assets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, mp4), Row(1L, mkv), Row(2L, truncatedMp4),
        Row(3L, garbage), Row(4L, null)),
      schema)
    val r = Multimodal.probeVideos(assets).collect()
      .map(x => x.asset_id -> x).toMap
    assert(r(0L).container === "isom")
    assert(r(0L).width === 320 && r(0L).height === 240)
    assert(r(0L).duration_ns === 1500000000L)
    assert(r(1L).container === "matroska")
    assert(r(1L).width === 1920 && r(1L).height === 1080)
    assert(r(1L).duration_ns === 2750000000L)
    // poison-record contract: unparseable rows degrade, never throw
    Seq(2L, 3L, 4L).foreach { id =>
      assert(r(id).container === null)
      assert(r(id).width === -1 && r(id).duration_ns === -1L)
    }
    assert(r(4L).n_bytes === 0L)
    // determinism across partitionings (the mapPartitions batch shape)
    val again = Multimodal.probeVideos(assets.repartition(4)).collect()
      .map(x => x.asset_id -> x).toMap
    assert(again === r)
  }

  test("probeImages: PNG/JPEG/GIF/BMP header walks agree with real encoders, corrupt-safe") {
    import java.awt.image.BufferedImage
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def img(w: Int, h: Int): BufferedImage = {
      val i = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, (x * 11 + y * 7) & 0xffffff)
      i
    }
    def enc(i: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(i, fmt, bos), s"JDK must encode $fmt")
      bos.toByteArray
    }
    val png = Multimodal.pngBytes(img(32, 20))
    val jpg = enc(img(48, 12), "jpg")
    val gif = enc(img(17, 9), "gif")
    val bmp = enc(img(21, 5), "bmp")
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val assets = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, png), Row(1L, jpg), Row(2L, gif), Row(3L, bmp),
        Row(4L, png.take(10)), Row(5L, garbage), Row(6L, null)),
      schema)
    val r = Multimodal.probeImages(assets).collect()
      .map(x => x.asset_id -> x).toMap
    assert((r(0L).format, r(0L).width, r(0L).height) === ("png", 32, 20))
    assert(r(0L).bit_depth === 8)
    assert((r(1L).format, r(1L).width, r(1L).height) === ("jpeg", 48, 12))
    assert(r(1L).bit_depth === 8)
    assert((r(2L).format, r(2L).width, r(2L).height) === ("gif", 17, 9))
    assert((r(3L).format, r(3L).width, r(3L).height) === ("bmp", 21, 5))
    // poison-record contract
    Seq(4L, 5L, 6L).foreach { id =>
      assert(r(id).format === null && r(id).width === -1)
    }
    assert(r(6L).n_bytes === 0L)
    // probe ≡ decode on the decodable fixtures (dimension cross-check)
    val dec = Multimodal.decodeImages(assets.withColumn("media_format", lit("x"))
        .withColumn("modality", lit("image")).withColumn("source", lit("f")))
      .collect().map(x => x.asset_id -> x).toMap
    Seq(0L, 1L, 2L, 3L).foreach { id =>
      assert(r(id).width === dec(id).width && r(id).height === dec(id).height,
        s"probe/decode dimension mismatch for asset $id")
    }
    // determinism across partitionings
    val again = Multimodal.probeImages(assets.repartition(3)).collect()
      .map(x => x.asset_id -> x).toMap
    assert(again === r)
  }

  test("ImageProbe property: header walks agree with ImageIO across random dimensions and formats") {
    import java.awt.image.BufferedImage
    val rnd = new java.util.Random(7)
    (1 to 30).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val fmt = Seq("png", "jpg", "gif", "bmp")(rnd.nextInt(4))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      val probed = graft.operators.ImageProbe.probe(bos.toByteArray)
      val wantFmt = if (fmt == "jpg") "jpeg" else fmt
      assert(probed.map(p => (p._1, p._2, p._3)) === Some((wantFmt, w, h)),
        s"probe mismatch for $fmt ${w}x$h")
    }
  }

  test("ImageProbe BMP: DIB header-size discriminates layouts (core header parses, unknown sizes degrade to None)") {
    // hand-built headers: JDK's ImageIO only writes BITMAPINFOHEADER,
    // so the legacy/degenerate layouts need byte-level fixtures
    def bmpFile(dibSize: Int, dib: Array[Byte]): Array[Byte] = {
      val fileHdr = Array[Byte]('B', 'M') ++
        Array.fill[Byte](8)(0) ++ Array[Byte](54, 0, 0, 0)
      fileHdr ++ le32b(dibSize) ++ dib ++ Array.fill[Byte](16)(0)
    }
    def le32b(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16b(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)
    // BITMAPCOREHEADER (size 12): u16 width/height at 18/20, bitCount at 24
    val core = bmpFile(12, le16b(123) ++ le16b(45) ++ le16b(1) ++ le16b(24))
    assert(graft.operators.ImageProbe.probe(core) === Some(("bmp", 123, 45, 24)),
      "BITMAPCOREHEADER must parse via the 16-bit layout")
    // the same pixel dims written at INFO offsets under a core-header
    // size field would previously misread width as 45<<16|123 garbage
    // BITMAPINFOHEADER (size 40): i32 width/height at 18/22, bitCount at 28
    val info = bmpFile(40,
      le32b(123) ++ le32b(-45) ++ le16b(1) ++ le16b(24) ++ le32b(0))
    assert(graft.operators.ImageProbe.probe(info) === Some(("bmp", 123, 45, 24)),
      "BITMAPINFOHEADER with top-down (negative) height must parse")
    // unknown DIB size (16 = truncated OS/2 2.x): degrade to None, not garbage
    val weird = bmpFile(16, le32b(123) ++ le32b(45) ++ le16b(1) ++ le16b(24))
    assert(graft.operators.ImageProbe.probe(weird) === None,
      "unknown DIB header size must return None")
  }

  test("imageNearDupPairs: perceptual near-dups found, byte-dup machinery blind to them") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      Multimodal.pngBytes(img)
    }
    // base gradient; a RESIZED re-encode of it (different bytes, same
    // picture); an unrelated checkerboard; a corrupt payload
    def grad(scale: Int)(x: Int, y: Int): Int =
      ((x * 8 / scale) << 16) | ((y * 8 / scale) << 8) | 0x40
    val base = png(32, 32, grad(1))
    val resized = png(64, 64, grad(2))
    val checker = png(32, 32, (x, y) =>
      if ((x / 4 + y / 4) % 2 == 0) 0xffffff else 0x000000)
    val assets = Seq(
      (0L, "image", base, "png", "fx"),
      (1L, "image", resized, "png", "fx"),
      (2L, "image", checker, "png", "fx"),
      (3L, "image", Array[Byte](1, 2, 3), "png", "fx"))
      .toDF("asset_id", "modality", "payload", "format", "source")
    val pairs = Multimodal.imageNearDupPairs(assets, maxHamming = 6)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("asset_a") === 0L)
    assert(pairs.head.getAs[Long]("asset_b") === 1L)
    assert(pairs.head.getAs[Long]("hamming") <= 6L)
    // the byte-level fingerprint sees the same two images as UNRELATED
    // blobs - the gap perceptual hashing exists to close
    val byteDup = graft.operators.Dedup.exact(
      assets.filter(col("asset_id") < 2), col("payload"), col("asset_id"))
    assert(byteDup.count() === 2)
    // determinism across partitionings
    val again = Multimodal.imageNearDupPairs(assets.repartition(3),
      maxHamming = 6).collect()
    assert(again.toSeq === pairs.toSeq)
  }

  test("audioNearDupPairs: resampled/rescaled re-encodes pair with the original") {
    import spark.implicits._
    // an 8-segment "melody" — one tone per fingerprint time segment —
    // synthesized at different sample rates / gains: same CONTENT,
    // different bytes. Frequencies sit on the filterbank's band
    // centers so each segment's band-energy ordering is sharp.
    def clip(freqs: Seq[Double], sr: Float, gain: Float): Array[Byte] = {
      val perSeg = (sr * 0.1f).toInt
      val samples = Array.tabulate(freqs.length * perSeg) { i =>
        val f = freqs(i / perSeg)
        (gain * 0.8f * math.sin(2.0 * math.Pi * f * i / sr)).toFloat
      }
      Multimodal.wavBytes(samples, sampleRate = sr)
    }
    val melodyA = Seq(250.0, 500.0, 1000.0, 397.0, 630.0, 250.0, 794.0, 500.0)
    val melodyB = Seq(1587.0, 250.0, 630.0, 1260.0, 315.0, 1000.0, 397.0, 1587.0)
    val assets = Seq(
      (0L, "audio", clip(melodyA, 16000f, 1.0f), "wav", "fx"),
      (1L, "audio", clip(melodyA, 8000f, 1.0f), "wav", "fx"),  // resampled
      (2L, "audio", clip(melodyA, 16000f, 0.5f), "wav", "fx"), // gain-scaled
      (3L, "audio", clip(melodyB, 16000f, 1.0f), "wav", "fx"), // unrelated
      (4L, "audio", Array[Byte](9, 9, 9), "wav", "fx"))        // corrupt
      .toDF("asset_id", "modality", "payload", "format", "source")
    val pairs = Multimodal.audioNearDupPairs(assets, maxHamming = 6)
      .collect().map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")))
      .toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"the three re-encodes of melody A must pair, nothing else: $pairs")
    // the byte-level fingerprint sees all four decodable clips as
    // UNRELATED blobs — the gap the perceptual fingerprint closes
    assert(graft.operators.Dedup.exact(assets.filter(col("asset_id") < 3),
      col("payload"), col("asset_id")).count() === 3)
    // fingerprint determinism across partitionings
    val fp = Multimodal.audioFingerprint(assets).collect()
      .map(f => f.asset_id -> f.afp).toMap
    assert(fp.keySet === Set(0L, 1L, 2L, 3L), "corrupt payload must drop out")
    val fpAgain = Multimodal.audioFingerprint(assets.repartition(4)).collect()
      .map(f => f.asset_id -> f.afp).toMap
    assert(fpAgain === fp)
    // the gain-scaled copy's comparisons are EXACTLY the original's
    assert(fp(0L) === fp(2L))
  }
}
