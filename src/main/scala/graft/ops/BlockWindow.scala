package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed running aggregations over keys with FEW distinct values —
  * the two-phase block prefix sum (SURVEY §2.9 scale hygiene).
  *
  * `SUM(v) OVER (PARTITION BY key ORDER BY ord)` hands Spark exactly one
  * window task per key: with 8 shards or a handful of languages that is
  * ~12.5 TB per task at the 100 TB target — the window is correct but
  * serial. The classic fix is the same one GPU scan kernels use: compute
  * prefix sums within blocks, then a (tiny) prefix sum OVER blocks, then
  * add each block's offset back. Here a "block" is a range partition of
  * (key, ord): range partitioning guarantees every row of a key in block
  * i orders before every row of that key in block i+1, so
  *
  *   global_prefix(row) = offset(key, block) + within_block_prefix(row)
  *
  * holds exactly. Parallelism is nBlocks (defaults to the session's
  * shuffle parallelism) regardless of how few keys exist, per-task state
  * is one partition's rows, and the offsets frame is nBlocks × nKeys rows
  * — broadcast-join small by construction.
  *
  * Result values are independent of WHERE the block boundaries fall (the
  * math telescopes), so the output is deterministic even though the range
  * partitioner samples; the persist below is still load-bearing: both the
  * within-block branch and the totals branch must read the SAME block
  * assignment, and a recompute could legally re-sample different bounds.
  */
object BlockWindow {

  /** `df` plus column `out` = running sum of `value` over rows of equal
    * `keys`, ordered by `order` (rows preceding + current). `order` must
    * be a total order within each key (ties would make "running" ill-
    * defined in any formulation). Long-typed output. */
  def runningSum(df: DataFrame, keys: Seq[String], order: Seq[String],
                 value: org.apache.spark.sql.Column, out: String,
                 nBlocks: Int = 0): DataFrame = {
    val blocks =
      if (nBlocks > 0) nBlocks
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val spread = df
      .repartitionByRange(blocks, (keys ++ order).map(col): _*)
      .withColumn("__block", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val withinW = Window
      .partitionBy((keys :+ "__block").map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = spread.withColumn("__within", sum(value).over(withinW))
    // per-(key, block) totals → running offset over earlier blocks only
    val offW = Window.partitionBy(keys.map(col): _*).orderBy(col("__block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = spread
      .groupBy((keys :+ "__block").map(col): _*)
      .agg(sum(value).as("__total"))
      .withColumn("__offset", coalesce(sum(col("__total")).over(offW), lit(0L)))
      .select((keys :+ "__block").map(col) :+ col("__offset"): _*)
    within
      .join(broadcast(offsets), keys :+ "__block")
      .withColumn(out, (col("__offset") + col("__within")).cast("long"))
      .drop("__block", "__within", "__offset")
  }

  /** `df` plus column `out` = rank of each row among rows of equal `keys`
    * ordered by `order` — `row_number()` as a running count of 1s, so it
    * parallelizes identically. Int-typed to match Spark's `row_number`. */
  def rowNumber(df: DataFrame, keys: Seq[String], order: Seq[String],
                out: String, nBlocks: Int = 0): DataFrame =
    runningSum(df, keys, order, lit(1L), out, nBlocks)
      .withColumn(out, col(out).cast("int"))
}
