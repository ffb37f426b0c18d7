package graft

/** Dev-only: dump `.explain("formatted")` for the named queries to
  * <outDir>/<query>_<tag>.txt — the plans/r15 evidence files the
  * optimization rounds commit for each touched query.
  *
  * Usage: runMain graft.DevPlans <sfDir> <outDir> <tag> <k1,k2,...>
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, keysCsv) = args.take(4)
    val keys = keysCsv.split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.DotProduct.register(spark)
    functions.NfcNormalize.register(spark)
    functions.LshBands.register(spark)
    functions.JaroWinkler.register(spark)
    plans.Rules.ensureInjected(spark)
    new java.io.File(outDir).mkdirs()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if keys.contains(name)) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plans] wrote ${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
