package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Seq(
    (1L, Array[Byte](0x12, 0x34, 0x00, 0x40, 0x07, 0x7f)),
    (2L, Array[Byte](0x00, 0x01, 0x02, 0x03, 0x04))
  ).toDF("id", "blob")

  test("toAssets derives header metadata without decoding") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "image")
    val r = assets.filter($"asset_id" === 1).select("meta.*").head()
    assert(r.getAs[Int]("byte_len") == 6)
    assert(r.getAs[Int]("width") == 0x1234 % 1920)
    assert(r.getAs[Int]("height") == 0x0040 % 1080)
    assert(r.getAs[Int]("channels") == 0x07 % 4 + 1)
  }

  test("extractFeatures streams batches through the decode stub") {
    val assets = Multimodal.toAssets(raw, "id", "blob", "image")
    val feats = Multimodal.extractFeatures(spark, assets)
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 8)
    assert(feats(1L) == Multimodal.decodeStub(Array[Byte](0x12, 0x34, 0x00, 0x40, 0x07, 0x7f)).toSeq)
  }
}
