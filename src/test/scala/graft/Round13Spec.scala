package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: engine facts the round's new queries depend on. */
class Round13Spec extends SparkSpec {

  test("VARIANT is not groupable in Spark 4.1 — agg_variant_group's " +
    "canonicalize-then-group step exists for a reason") {
    // When this intercept stops throwing, Spark made variant orderable —
    // revisit agg_variant_group and group on the variant directly.
    val df = spark.range(4).selectExpr(
      "parse_json(concat('{\"k\":', CAST(id % 2 AS STRING), '}')) AS v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("v")).count().collect()
    }
    assert(e.getMessage.contains("GROUP_EXPRESSION_TYPE_IS_NOT_ORDERABLE"),
      s"unexpected analysis error: ${e.getMessage.take(200)}")
  }

  test("theta set-op rows survive an absent audience (r13 review fix)") {
    // miniature of agg_theta_setops' shape: the conditional global
    // aggregates keep the intersection/difference readouts alive (at 0 /
    // the full side) when one audience has zero rows — the prior
    // filter + crossJoin form dropped the rows entirely
    val ab = spark.range(5)
      .selectExpr("id AS user_id", "'click' AS event_type")
      .agg(
        expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)")
          .as("a"),
        expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)")
          .as("b"))
    val r = ab.select(
      expr("CAST(theta_sketch_estimate(theta_intersection(a, b)) AS BIGINT)"),
      expr("CAST(theta_sketch_estimate(theta_difference(a, b)) AS BIGINT)"))
      .head()
    assert(r.getLong(0) == 0L, s"intersection with empty side: ${r.getLong(0)}")
    assert(r.getLong(1) == 5L, s"difference with empty side: ${r.getLong(1)}")
  }

  test("to_json(variant) is canonical: keys sorted, numbers normalized") {
    // the property that makes the canonical string a correct GROUP key:
    // semantically-equal variants from differently-formatted sources
    // render identically
    val r = spark.sql(
      """SELECT to_json(parse_json('{"b": 1, "a": 2.50}')) AS x,
        |       to_json(parse_json('{"a":2.5,"b":1}')) AS y""".stripMargin)
      .head()
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == """{"a":2.5,"b":1}""")
  }

  test("matryoshka device: identity truncation (slice to full width) " +
    "reproduces the full-dim top-k exactly") {
    // pins that emb_matryoshka_recall measures TRUNCATION, not an
    // artifact of the slice path: slicing to all 64 dims must yield the
    // identical ranking, i.e. recall@10 = 1.0 for every probe
    import graft.ops.Sim
    val emb = engine.Tables(spark, sf, "embeddings")
    val emb64 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 64).as("embedding"))
    val a = Sim.cosineTopK(emb.filter(col("vec_id") < 5), emb, k = 10)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sim.cosineTopK(emb64.filter(col("vec_id") < 5), emb64, k = 10)
      .select("probe_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"identity slice changed the ranking: ${(a diff b).take(3)}")
    assert(a.size == 50)
  }

  test("to_char/to_number round-trip is the identity on in-range money") {
    // the fn_number_format contract: format → parse loses nothing,
    // including at the grouping and padding edges
    val vals = Seq(0.01, 0.5, 9.99, 123.45, 1234.5, 999999.99, 1234567.89,
      9999999.99)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("x")
      .selectExpr("x",
        "CAST(to_number(to_char(x, '9,999,999.99'), '9,999,999.99') AS DOUBLE) AS rt")
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"round-trip broke: ${r.getDouble(0)} -> ${r.getDouble(1)}")
    }
  }

  test("IDENTIFIER() indirection resolves to the identical optimized plan") {
    // the sql_identifier scale claim: nothing dynamic survives analysis —
    // the variable-bound identifier plans exactly like the inline name
    engine.Tables(spark, sf, "orders").createOrReplaceTempView("orders")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_spec_tab STRING")
    spark.sql("SET VAR graft_spec_tab = 'orders'")
    val via = spark.sql(
      "SELECT o_orderstatus, COUNT(*) AS n FROM IDENTIFIER(graft_spec_tab) " +
        "GROUP BY o_orderstatus")
    val direct = spark.sql(
      "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus")
    assert(via.queryExecution.optimizedPlan.canonicalized ==
      direct.queryExecution.optimizedPlan.canonicalized,
      "IDENTIFIER plan differs from the direct plan")
  }

  test("observe() metrics equal the same aggregates computed declaratively") {
    // etl_observe_metrics' correctness seam: the accumulator-backed
    // metric map must agree with a second, plan-level aggregation
    val obs = org.apache.spark.sql.Observation()
    engine.Tables(spark, sf, "orders")
      .observe(obs, count(lit(1)).as("n"),
        sum(engine.Det.cents(col("o_totalprice")).cast("long")).as("cents"))
      .write.format("noop").mode("overwrite").save()
    val direct = engine.Tables(spark, sf, "orders")
      .agg(count(lit(1)), sum(engine.Det.cents(col("o_totalprice")).cast("long")))
      .head()
    assert(obs.get("n") == direct.getLong(0))
    assert(obs.get("cents") == direct.getLong(1))
  }

  test("variant_explode emits fields in sorted-key order regardless of " +
    "construction order") {
    // the udtf_variant_explode determinism claim: pos is a property of
    // the variant ENCODING (sorted keys), not of the JSON author
    val r = spark.sql(
      """SELECT pos, key FROM VALUES (1) t(x),
        |LATERAL variant_explode(parse_json('{"zz": 1, "aa": 2, "mm": 3}'))
        |ORDER BY pos""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(r == Seq((0, "aa"), (1, "mm"), (2, "zz")),
      s"field order not sorted-key: $r")
  }
}
