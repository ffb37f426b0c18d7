package graft

import graft.builder.Pipeline
import graft.functions.DotProduct
import org.apache.spark.sql.functions._

class ExtensibilitySpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot: codegen result equals hand computation; null-safe") {
    DotProduct.register(spark)
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.0, 0.0), Array(1.0, 1.0))
    ).toDF("id", "a", "b")
    val out = df.selectExpr("id", "graft_dot(a, b) AS d")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 1 * 4 + 2 * 5 + 3 * 6.0)
    assert(out(2L) == 0.0)
    val withNull = df.selectExpr("id", "graft_dot(a, CAST(NULL AS ARRAY<DOUBLE>)) AS d")
      .select("d").collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("graft_dot appears inside WholeStageCodegen") {
    DotProduct.register(spark)
    // must come from a real scan — a local relation constant-folds the plan
    val df = engine.Tables(spark, sf, "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .selectExpr("graft_dot(e, e) AS d")
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val planLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft_dot")).get
    assert(planLine.trim.startsWith("*("), s"not codegen'd: $planLine")
    assert(df.count() > 0)
  }

  test("partitioned sink readback prunes to one partition directory") {
    val out = "/tmp/graft_io/prune_check"
    engine.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val df = spark.read.parquet(out).filter($"l_returnflag" === "R")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition filter in: $scan")
    assert(df.count() > 0)
  }

  test("pipeline builder: step list equals hand-written DataFrame result") {
    val viaBuilder = Pipeline.source("nation")
      .filter("n_regionkey = 0")
      .selectExpr("n_nationkey", "n_name")
      .sort("n_nationkey")
      .run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val direct = engine.Tables(spark, sf, "nation")
      .filter($"n_regionkey" === 0)
      .select($"n_nationkey", $"n_name")
      .orderBy("n_nationkey")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(viaBuilder == direct && viaBuilder.nonEmpty)
  }
}
