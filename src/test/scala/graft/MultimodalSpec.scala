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

  test("document text is pure ASCII on every graded fixture (oracle contract)") {
    // The multimodal_decode / multimodal_audio_energy / multimodal_pipeline
    // oracles recompute payload hash / n_bytes / head_byte from text
    // CODEPOINTS (DuckDB unicode()/length()) while the Spark side folds
    // UTF-8 BYTES of the payload. Those are only equal while every
    // character is ASCII (1 byte == 1 codepoint, same value). This was a
    // comment-only assumption until r11 (r10 ADVICE); enforce it on every
    // fixture scale the driver grades or benches against, so a non-ASCII
    // fixture regeneration fails HERE with a named query list instead of
    // as an opaque oracle hash mismatch.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
        if new java.io.File(s"$dir/documents.parquet").exists) {
      val bad = engine.Tables(spark, dir, "documents")
        .filter(octet_length(col("text")) =!= length(col("text")) ||
          col("text").rlike("[^\\x00-\\x7F]"))
        .limit(1).collect()
      assert(bad.isEmpty,
        s"$dir/documents has non-ASCII text (doc_id=${bad.headOption.map(_.get(0))}): " +
          "the multimodal byte-vs-codepoint oracles are no longer valid")
    }
  }
}
