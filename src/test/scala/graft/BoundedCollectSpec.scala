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

  test("alias laundering is denied, derived groupings are allowed (r12)") {
    val ev = engine.Tables(spark, sf, "events")
    // renaming the corpus key must NOT launder it past the denylist — the
    // walker resolves the grouping attribute through the plan's alias
    // lineage to its origin leaf column (r11 verdict ask #7)
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.withColumnRenamed("event_id", "k").groupBy("k")
          .agg(count(lit(1))), "spec: laundered rename")
    }
    val docs = engine.Tables(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        docs.selectExpr("doc_id AS k", "text").groupBy("k")
          .agg(count(lit(1))), "spec: laundered selectExpr")
    }
    // a DERIVED grouping expression is accepted even when it references a
    // corpus key: user_id % 2 has 2 output rows (r11 ADVICE — the pre-r12
    // reference-based rule false-positived here)
    assert(ops.BoundedCollect.rows(
      ev.groupBy(col("user_id") % 2).agg(count(lit(1))),
      "spec: derived grouping").length <= 2)
    // ...and a corpus-keyed aggregate at the TOP is denied even when an
    // unrelated bound node sits elsewhere in the tree (the r11 ADVICE
    // vacuous-exists gap): join a per-event frame against a bounded
    // 1-row aggregate, then group by the corpus key
    val total = ev.agg(count(lit(1)).as("n_total"))
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.crossJoin(total).groupBy("event_id")
          .agg(count(lit(1)), first("n_total")),
        "spec: corpus-key agg over inner bound")
    }
  }

  test("a cached rn<=k unpartitioned-window frame is accepted (r12)") {
    // boundedPhys must mirror the logical WindowGroupLimit case: once the
    // frame is persisted, the guard sees InMemoryRelation and walks the
    // PHYSICAL cached plan, where the bound is WindowGroupLimitExec
    val ev = engine.Tables(spark, sf, "events")
    val pool = ev.select(col("event_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")))
      .filter(col("rn") <= 5)
      .persist()
    try {
      pool.count() // materialize so the cached physical plan exists
      assert(ops.BoundedCollect.rows(pool, "spec: cached wgl").length == 5)
    } finally pool.unpersist()
  }

  test("compound shapes recurse per branch: bounded x corpus join denied, " +
    "bounded x bounded accepted (r12 gap closed)") {
    val ev = engine.Tables(spark, sf, "events")
    val boundedAgg = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    // a bound on ONE branch no longer vacuously passes an unbounded
    // sibling: inner join of the 5-row agg against the raw corpus scan
    // is corpus-sized output — DENY
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.select("event_id", "event_type").join(boundedAgg, "event_type"),
        "spec: bounded x corpus inner join")
    }
    // union with an unbounded branch: DENY
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        boundedAgg.select(col("n"))
          .unionByName(ev.select(col("event_id").as("n"))),
        "spec: bounded union corpus")
    }
    // bounded x bounded join and bounded union: ACCEPT
    val two = boundedAgg.select(col("event_type"), col("n"))
      .join(ev.groupBy("event_type").agg(avg("value").as("v")), "event_type")
    assert(ops.BoundedCollect.rows(two, "spec: bounded x bounded").nonEmpty)
    assert(ops.BoundedCollect.rows(
      boundedAgg.select("n").unionByName(boundedAgg.select("n")),
      "spec: bounded union bounded").nonEmpty)
    // semi-join bounds by its LEFT side alone
    assert(ops.BoundedCollect.rows(
      boundedAgg.join(ev.select(col("event_type")), Seq("event_type"),
        "left_semi"),
      "spec: semi join bounded left").nonEmpty)
    // explode can smuggle a corpus back out of a 1-row frame: DENY
    intercept[IllegalArgumentException] {
      ops.BoundedCollect.rows(
        ev.agg(collect_list("event_id").as("ids"))
          .select(explode(col("ids")).as("event_id")),
        "spec: explode of collected corpus")
    }
  }

  test(".persist() must not flip the verdict: a cached bounded x corpus " +
    "join is still denied (physical walker mirrors the logical one)") {
    val ev = engine.Tables(spark, sf, "events")
    val boundedAgg = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val cached = ev.select("event_id", "event_type")
      .join(boundedAgg, "event_type").persist()
    try {
      cached.count() // materialize → the guard sees InMemoryRelation
      intercept[IllegalArgumentException] {
        ops.BoundedCollect.rows(cached, "spec: cached bounded x corpus join")
      }
      // and a cached genuinely-bounded frame still passes
      val okCached = boundedAgg.persist()
      try {
        okCached.count()
        assert(ops.BoundedCollect.rows(okCached,
          "spec: cached bounded agg").nonEmpty)
      } finally okCached.unpersist()
    } finally cached.unpersist()
  }

  test("object-pipeline execs don't pass the physical walker (r12 advice): " +
    "a cached bounded frame piped through mapPartitions is denied") {
    // mapPartitions' output multiplier is data-sized — a bound ABOVE it in
    // the cached plan (the limit) must not launder it past the guard, even
    // though the logical walker never sees the object nodes (they hide
    // inside InMemoryRelation's cachedPlan). Before the r13 hardening the
    // unary catch-all deferred to the child and accepted this shape.
    import spark.implicits._
    val ev = engine.Tables(spark, sf, "events")
    val grown = ev.limit(3).select(col("event_id"))
      .as[Long].mapPartitions(it => it.flatMap(x => Iterator(x, x))).toDF()
      .persist()
    try {
      grown.count()
      intercept[IllegalArgumentException] {
        ops.BoundedCollect.rows(grown, "spec: cached limit->mapPartitions")
      }
      // the 1:1 typed map bridge (MapElementsExec) still defers to its
      // child: bounded below stays bounded
      val ok = ev.limit(3).select(col("event_id"))
        .as[Long].map(_ + 1L).toDF().persist()
      try {
        ok.count()
        assert(ops.BoundedCollect.rows(ok,
          "spec: cached limit->mapElements").length == 3)
      } finally ok.unpersist()
    } finally grown.unpersist()
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
