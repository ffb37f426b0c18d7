package graft

import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._

/** Pins for the round-10 asks: multimodal decode-frame reuse, the
  * oracle-promotion of the former golden-only queries, and the
  * sim_ndcg empty-relevance guard.
  */
class Round12Spec extends SparkSpec {

  test("multimodal_phash: decode products are persisted — optimized plan " +
    "reads InMemoryRelation, not a re-decode per consumer branch") {
    // The r9 regression: phashFrame (PNG encode + ImageIO decode) was
    // consumed by both band-join sides plus the image-count aggregate with
    // nothing persisted, so the decode re-ran per branch (1.2 s → 3.1 s).
    // The fix is a persist; this pin asserts the optimized plan actually
    // routes through the cache so a refactor can't silently drop it.
    val df = SparkEntry.queries("multimodal_phash")(spark, sf)
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r
    }
    assert(cached.nonEmpty,
      "multimodal_phash plan has no InMemoryRelation — the phash/candidate " +
        "frames lost their persist and the image decode re-runs per branch")
    // and the result itself is still sane (golden hash pins exact values)
    val row = df.head
    assert(row.getAs[Long]("n_images") > 0)
    assert(row.getAs[Long]("n_near_dups") <= row.getAs[Long]("n_candidates"))
  }

  test("multimodal_pipeline / multimodal_decode / scan_csv_corrupt are " +
    "oracle-backed (r9 ask #4: rows-only pool shrunk)") {
    val oracled = SparkEntry.oracleSql.keySet
    Seq("multimodal_pipeline", "multimodal_decode", "scan_csv_corrupt")
      .foreach(q => assert(oracled.contains(q), s"$q lost its DuckDB oracle"))
  }

  test("multimodal_decode: image rows NULL the PNG-byte-dependent cells, " +
    "stub rows carry the payloadHash-derived cells") {
    val out = SparkEntry.queries("multimodal_decode")(spark, sf)
    val img = out.filter(col("kind") === "image")
    val rest = out.filter(col("kind") =!= "image")
    assert(img.filter(col("checksum").isNotNull || col("n_bytes").isNotNull)
      .isEmpty, "image rows must NULL checksum/n_bytes (not SQL-derivable)")
    assert(rest.filter(col("checksum").isNull || col("n_bytes").isNull)
      .isEmpty, "stub rows must carry checksum/n_bytes")
    // real decode: image dims equal the synthesis formula
    assert(img.filter(col("width") =!= (col("id") % 56 + 8).cast("int") ||
      col("height") =!= (col("id") % 40 + 8).cast("int")).isEmpty)
  }

  test("sim_ndcg idcg guard: n_rel = 0 yields 0, not an ANSI crash from " +
    "Spark's descending sequence(1, 0)") {
    // The exact expression shape sim_ndcg uses for idcg9 — Spark's
    // sequence(1, least(n_rel, 10)) yields DESCENDING [1, 0] when
    // n_rel = 0, so w9(0) divides by log2(1) = 0 and the unguarded ANSI
    // cast of Infinity to long throws. The query guards with
    // when(n_rel > 0, ...); this pins the guard's behavior on the edge the
    // graded fixtures cannot reach (every label there has many vectors).
    import spark.implicits._
    def w9(i: org.apache.spark.sql.Column) =
      floor(lit(1000000000L) / log2((i + 1).cast("double")) + lit(0.5))
        .cast("long")
    val out = Seq(0L, 1L, 3L).toDF("n_rel")
      .withColumn("idcg9",
        when(col("n_rel") > 0,
          aggregate(transform(sequence(lit(1L), least(col("n_rel"), lit(10L))),
            i => w9(i)), lit(0L), (a, b) => a + b))
          .otherwise(lit(0L)))
      .orderBy("n_rel").collect()
    assert(out(0).getLong(1) == 0L)
    assert(out(1).getLong(1) == 1000000000L) // 1/log2(2) = 1
    assert(out(2).getLong(1) > out(1).getLong(1))
  }
}
