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

  test("corpus-keyed aggregates and bare LocalLimits are NOT bounds (r10 gaps)") {
    val ev = engine.Tables(spark, sf, "events")
    // gap 1: an Aggregate grouped on a corpus-cardinality key produces one
    // row per event/user/doc — its output scales with the corpus
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.groupBy("event_id").agg(count(lit(1))), "spec: corpus-key agg")
    }
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.groupBy("user_id", "event_type").agg(count(lit(1))),
        "spec: corpus-key compound agg")
    }
    val docs = engine.Tables(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        docs.groupBy("doc_id").agg(count(lit(1))), "spec: doc_id agg")
    }
    // a catalog-keyed aggregate STACKED ON a corpus-keyed one still bounds
    assert(ops.BoundedCollect.rows(
      ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1))), "spec: re-agg").nonEmpty)
    // gap 2: a bare logical LocalLimit (no GlobalLimit partner) bounds each
    // partition at k, so the collected total is k x partitions. Spark's
    // .limit() always pairs them, so build the bare form directly.
    import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, GlobalLimit}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bare = LocalLimit(Literal(5), ev.queryExecution.optimizedPlan)
    assert(!ops.BoundedCollect.bounded(bare), "bare LocalLimit must not bound")
    assert(ops.BoundedCollect.bounded(GlobalLimit(Literal(5), bare)),
      "GlobalLimit(LocalLimit(...)) must bound")
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
