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
}
