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
}
