package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the graded parquet tables.
  *
  * Scale note (100 TB design): loaders are plain `spark.read.parquet`, so
  * Catalyst keeps predicate pushdown / column pruning / partition pruning
  * through the scan. At cluster scale the same call reads a partitioned
  * directory tree; nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Memo of resolved base relations: `spark.read.parquet` builds a fresh
    * InMemoryFileIndex every call — a file listing plus a parquet footer
    * read — and a 186-query run re-pays that per query per table. The
    * graded fixtures are immutable for the life of a session, so the
    * resolved DataFrame (an immutable logical plan; every query chains new
    * operators on top, pushdown/pruning unaffected) is shared. Keyed by
    * session so a stopped context's relations are never handed to a new
    * one. Bounded: #tables × #dirs per session. */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  // keys strongly reference their session, so a JVM cycling many sessions
  // would otherwise pin every stopped session's state forever
  private val memoCap = 64

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Eviction targets DEAD sessions first (their relations can never be
    // handed out again), falling back to a full clear only if 64+ live
    // entries exist. Check-then-act races with concurrent callers are
    // tolerated BY DESIGN rather than locked away: the worst interleaving
    // evicts an entry mid-insert or briefly overshoots the cap, costing
    // one redundant file re-listing — never a wrong result, since entries
    // are pure functions of their key.
    if (memo.size >= memoCap) {
      memo.keys.filter(_._1.sparkContext.isStopped).foreach(memo.remove)
      if (memo.size >= memoCap) memo.clear()
    }
    memo.getOrElseUpdate((spark, dir, name),
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Fan a compute-dense input out to full core parallelism. Small single-
    * file scans arrive as ONE partition (one row-group), which serializes
    * everything downstream of the scan — measured 19 s → 2 s on the shingle
    * join. The row-preserving shuffle is cheap relative to the compute it
    * parallelizes, and at cluster scale it doubles as a rebalance against
    * skewed file splits. */
  def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** `events.ts` has shipped as two physical types across fixture
    * generations: parquet `timestamp[ns]` (which Spark 4.1 refuses to read
    * by default — PARQUET_TYPE_ILLEGAL — so we read it as epoch-nano longs
    * and floor to µs with INTEGER division; `/` would route a ~1.7e18 long
    * through a 53-bit double mantissa and corrupt the low digits) and
    * parquet `timestamp[us]` (which Spark reads as TIMESTAMP_NTZ). Both
    * normalize to a session-TZ TIMESTAMP: the session TZ is pinned UTC, so
    * the NTZ→LTZ cast keeps the wall clock and yields µs values identical
    * to what DuckDB sees reading the same file (SURVEY §5.4 P3).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
