package graft

/** Dev-only: print the physical plan of one query (arg 1) at sf0.001. */
object DevPlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.DotProduct.register(spark)
    functions.NfcNormalize.register(spark)
    println(SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
