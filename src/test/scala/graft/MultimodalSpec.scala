package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** The image path must be REAL end-to-end: synthesized PNG bytes, decoded
  * by javax.imageio, dimensions from actual pixel data — and the same must
  * hold distributively through the mapPartitions plumbing. */
class MultimodalSpec extends SparkSpec {

  test("encodePng round-trips through the real decoder") {
    for ((w, h) <- Seq((8, 8), (63, 40), (17, 31))) {
      val bytes = Multimodal.encodePng(seed = w * 1000L + h, w, h)
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P', "not a PNG")
      assert(Multimodal.decode(bytes) == (w, h))
    }
  }

  test("extractFeatures decodes image rows to their synthesized dimensions") {
    val docs = engine.Tables(spark, sf, "documents")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, docs))
      .toDF().filter(col("kind") === "image")
      .select("id", "width", "height").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8 + (id % 56).toInt, s"width mismatch for id=$id")
      assert(r.getInt(2) == 8 + (id % 40).toInt, s"height mismatch for id=$id")
    }
  }
}
