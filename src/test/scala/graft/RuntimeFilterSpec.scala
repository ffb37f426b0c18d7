package graft

import org.apache.spark.sql.functions._

/** Runtime-filter (bloom) injection — the 100 TB shuffle-join reducer.
  *
  * When a selective dimension filter sits on one side of a shuffle join,
  * Catalyst's InjectRuntimeFilter builds a bloom filter over the creation
  * side's join keys and pushes `might_contain` into the fact side's scan,
  * discarding non-joining rows BEFORE the shuffle. At cluster scale this
  * turns "shuffle 100 TB then drop 99%" into "drop 99% at the scan". The
  * default thresholds (app side > 10 GB) are cluster-sized, so this spec
  * lowers them to pin the mechanism; production configs keep the defaults.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter on a shuffle join injects a bloom runtime filter") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg"), s"no bloom filter built:\n$opt")
      assert(opt.contains("might_contain"), s"bloom filter not applied to fact scan:\n$opt")
      // and the filtered join still returns the right rows
      val direct = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == direct)
    }
  }

  test("bloom filter does not inject when the dim side has no selective predicate") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(!opt.contains("might_contain"),
        s"bloom filter injected without a selective creation side:\n$opt")
    }
  }
}
