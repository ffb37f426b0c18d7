package graft

import org.apache.spark.sql.functions._

/** Pins the bounded-collect contract (r8 verdict item 4): every driver-side
  * `.collect()` in the library routes through ops.BoundedCollect.rows,
  * which asserts the plan carries an Aggregate/Limit/literal bound — so a
  * refactor that silently turns a catalog-bounded collect corpus-bounded
  * now throws at the call site instead of shipping a driver OOM at scale.
  */
class BoundedCollectSpec extends SparkSpec {

  test("guard rejects a raw corpus scan and accepts bounded shapes") {
    val ev = engine.Tables(spark, sf, "events")
    val thrown = intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(ev.select("event_id"), "spec: unbounded")
    }
    assert(thrown.getMessage.contains("unbounded") ||
      thrown.getMessage.contains("no Aggregate/Limit"))
    // a filter alone does not bound anything
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.filter(col("event_type") === "purchase"), "spec: filtered")
    }
    // aggregate, limit, and unpartitioned top-k ARE bounds
    assert(ops.BoundedCollect.rows(
      ev.groupBy("event_type").agg(count(lit(1))), "spec: agg").nonEmpty)
    assert(ops.BoundedCollect.rows(ev.limit(3), "spec: limit").length == 3)
    val topk = ev.select(col("event_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .filter(col("rn") <= 5)
    assert(ops.BoundedCollect.rows(topk, "spec: wgl").length == 5)
  }

  test("every guarded operator still collects (the live sites stay bounded)") {
    // one query per guarded site family: HITS edge list, MMR pool,
    // markov transition counts, BPE argmax + merge table, PCA moments
    for (name <- Seq("graph_hits", "sim_mmr_diversify",
        "events_markov_steady", "llm_bpe_tokenize")) {
      assert(SparkEntry.queries(name)(spark, sf).collect().nonEmpty, name)
    }
  }
}
