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
