package graft

import graft.engine.Tables
import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** The co-located join contract: matching bucket specs must eliminate every
  * exchange from the join, and the bucketed result must equal the plain
  * shuffled join bit-for-bit. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed join plans with zero exchanges and matches the shuffled join") {
    Bucketing.bucketize(Tables(spark, sf, "orders").select("o_custkey", "o_totalprice"),
      "orders_bkt_t", "o_custkey", 8)
    Bucketing.bucketize(Tables(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
      "customer_bkt_t", "c_custkey", 8)
    val joined = Bucketing.coLocatedJoin(spark, "orders_bkt_t", "customer_bkt_t",
      "o_custkey", "c_custkey")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    assert(p.contains("Bucketed: true"), s"scan did not use the bucket layout:\n$p")

    val plain = Tables(spark, sf, "orders").select("o_custkey", "o_totalprice")
      .join(Tables(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
    assert(joined.count() == plain.count())
    val a = joined.orderBy("o_custkey", "o_totalprice", "c_custkey").collect().toSeq
    val b = plain.select(joined.columns.map(col).toIndexedSeq: _*)
      .orderBy("o_custkey", "o_totalprice", "c_custkey").collect().toSeq
    assert(a == b)
  }

  test("groupBy on the bucket key needs no exchange either") {
    Bucketing.bucketize(Tables(spark, sf, "orders").select("o_custkey", "o_totalprice"),
      "orders_bkt_t2", "o_custkey", 8)
    val agg = spark.table("orders_bkt_t2").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bucketed groupBy still shuffles:\n$p")
  }
}
