package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE's runtime re-plan is the built-in answer to skew at cluster scale
  * (SkewJoin.salted is the manual fallback when stats are not enough).
  * This pins that a genuinely skewed shuffle join is actually split by
  * AQE — the plan after execution must carry skew-handled join markers. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime") {
    val dir = "/tmp/graft_io/aqe_skew"
    import spark.implicits._
    // 90% of left rows share one key; right side is uniform
    spark.range(0, 200000)
      .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
      .write.mode("overwrite").parquet(s"$dir/left")
    spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      .write.mode("overwrite").parquet(s"$dir/right")

    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the test's ~MB skew qualifies
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = spark.read.parquet(s"$dir/left")
        .join(spark.read.parquet(s"$dir/right"), "k")
      // execute THIS queryExecution instance — count() would spawn a fresh
      // one and leave the inspected adaptive plan unexecuted
      val n = joined.queryExecution.toRdd.count()
      assert(n == 200000L)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
