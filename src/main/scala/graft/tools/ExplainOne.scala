package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one registered query.
  * Usage: sbt "runMain graft.tools.ExplainOne <queryName> [sfDir]" */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_NO_BROADCAST"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println("=== formatted (initial) ===")
    df.explain("formatted")
    df.collect()
    println("=== final adaptive ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
