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
    time("pmi cold")(SparkEntry.queries("text_pmi_cooccur")(spark, dir).count())
    time("pmi warm")(SparkEntry.queries("text_pmi_cooccur")(spark, dir).count())
    val dtok = ops.TextOps.docTermCounts(spark, dir)
    time("dtok count")(dtok.count())
    val dfreq = dtok.groupBy("term").agg(count(lit(1)).cast("long").as("c"))
    time("top30")(dfreq.orderBy(col("c").desc, col("term")).limit(30).collect().length)
    val top = dfreq.orderBy(col("c").desc, col("term")).limit(30)
    val dt = dtok.join(broadcast(top.select(col("term"))), Seq("term"), "semi")
    time("dt count")(dt.count())
    val pair = dt.groupBy("doc_id")
      .agg(array_sort(collect_list(col("term"))).as("arr"))
      .select(explode(expr(
        "flatten(transform(arr, (x, i) -> " +
          "transform(slice(arr, i + 2, size(arr)), y -> struct(x AS ta, y AS tb))))"))
        .as("p"))
      .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
      .agg(count(lit(1)).cast("long").as("cab"))
    time("pair count")(pair.count())
    time("nd")(engine.Tables(spark, dir, "documents")
      .agg(countDistinct("doc_id")).collect().length)
    spark.stop()
  }
}
