package graft

import graft.builder.Pipeline

/** The config entry point must interpret to the same plan the fluent
  * builder produces, and reject malformed configs loudly. */
class PipelineJsonSpec extends SparkSpec {

  test("JSON config runs identically to the fluent builder") {
    val fromConfig = Pipeline.fromJson(
      """{ "source": "orders",
        |  "steps": [
        |    {"op": "filter", "condition": "o_orderstatus = 'F'"},
        |    {"op": "join", "pipeline": {"source": "customer"},
        |     "condition": "o_custkey = c_custkey"},
        |    {"op": "agg", "groupBy": ["c_mktsegment"], "aggs": ["count(*) AS n"]},
        |    {"op": "sort", "keys": ["c_mktsegment"]} ] }""".stripMargin)
      .run(spark, sf).collect().toSeq
    val fluent = Pipeline.source("orders")
      .filter("o_orderstatus = 'F'")
      .join(Pipeline.source("customer"), "o_custkey = c_custkey")
      .agg(Seq("c_mktsegment"), "count(*) AS n")
      .sort("c_mktsegment")
      .run(spark, sf).collect().toSeq
    assert(fromConfig.nonEmpty && fromConfig == fluent)
  }

  test("YAML config interprets to the same result as JSON") {
    val yaml =
      """source: orders
        |steps:
        |  - op: filter
        |    condition: o_orderstatus = 'F'
        |  - op: agg
        |    groupBy: [o_orderpriority]
        |    aggs: ["count(*) AS n"]
        |  - op: sort
        |    keys: [o_orderpriority]
        |""".stripMargin
    val json =
      """{"source": "orders", "steps": [
        |  {"op": "filter", "condition": "o_orderstatus = 'F'"},
        |  {"op": "agg", "groupBy": ["o_orderpriority"], "aggs": ["count(*) AS n"]},
        |  {"op": "sort", "keys": ["o_orderpriority"]}]}""".stripMargin
    val a = Pipeline.fromYaml(yaml).run(spark, sf).collect().toSeq
    val b = Pipeline.fromJson(json).run(spark, sf).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("unknown op and missing fields fail loudly") {
    intercept[IllegalArgumentException] {
      Pipeline.fromJson("""{"source": "orders", "steps": [{"op": "explode"}]}""")
    }
    intercept[IllegalArgumentException] {
      Pipeline.fromJson("""{"steps": []}""")
    }
    intercept[IllegalArgumentException] {
      Pipeline.fromJson("""{"source": "orders", "steps": [{"op": "filter"}]}""")
    }
  }
}
