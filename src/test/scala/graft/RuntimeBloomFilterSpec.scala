package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter): on a
  * shuffle join whose build side carries a selective predicate, the
  * optimizer plants a bloom-filter aggregate on the build side and a
  * might_contain probe on the OTHER side's scan, so most non-matching
  * fact rows die before the shuffle — at 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~1% that can
  * possibly join. Production thresholds gate it to big scans
  * (applicationSideScanSizeThreshold = 10 GB), which the graded fixtures
  * never reach — so the feature is pinned here with the thresholds
  * floored rather than as a graded query (a graded builder cannot scope
  * session confs around its own lazy execution). */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("shuffle join with a selective build side injects a bloom probe " +
    "and keeps the result identical") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def q() = {
        val li = spark.read.parquet(s"$sf/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val p = spark.read.parquet(s"$sf/part.parquet")
          .filter(col("p_size") === 1) // selective: ~2% of part
          .select("p_partkey", "p_name")
        li.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("p_name").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      }
      val withFilter = q()
      val plan = withFilter.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"no bloom-filter probe injected:\n$plan")
      val got = withFilter.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = q()
      assert(!plain.queryExecution.executedPlan.toString
        .toLowerCase.contains("might_contain"))
      val want = plain.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, "bloom-filter pruning changed the join result")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
