package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only profiler: for every declared query, run it once (warm) at the
  * given SF dir and record jobs / stages / tasks / summed task time plus
  * the Exchange count of the executed plan. Output: one TSV line per query
  * to the given file. This is the measurement harness for the optimization
  * rounds (guide §1: measure first) — it never runs in the graded path.
  *
  * Usage: runMain graft.DevProfile <sfDir> <out.tsv> [onlyCsv]
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.DotProduct.register(spark)
    functions.NfcNormalize.register(spark)
    functions.LshBands.register(spark)
    functions.JaroWinkler.register(spark)
    plans.Rules.ensureInjected(spark)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => }

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null)
          taskTimeMs.addAndGet(e.taskMetrics.executorRunTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val sb = new StringBuilder
    sb.append("query\twall_s\tplan_s\tjobs\tstages\ttasks\ttask_time_s\texchanges\n")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    for ((name, fn) <- names) {
      // warm pass: planning + codegen cache fill, mirrors bench min-of-2
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      Thread.sleep(150) // let queued listener events drain (dev tool)
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      val t0 = System.nanoTime()
      val res =
        try {
          val df = fn(spark, sfDir)
          // force analysis + optimization + physical planning (NOT the AQE
          // re-planning, which happens during execution) to split the wall
          df.queryExecution.executedPlan
          val tPlan = (System.nanoTime() - t0) / 1e9
          df.count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150)
          val nExch = {
            val p = df.queryExecution.executedPlan.toString
            "Exchange".r.findAllIn(p).size
          }
          f"$name\t$wall%.3f\t$tPlan%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskTimeMs.get / 1000.0}%.2f\t$nExch"
        } catch {
          case e: Throwable => s"$name\tFAIL\t${e.getClass.getSimpleName}"
        }
      sb.append(res).append("\n")
      println(res)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
