package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketized range join: must equal the naive theta join exactly (bounds
  * inclusive, pre-epoch values, spans of many buckets) and must not plan a
  * nested-loop join. */
class RangeJoinSpec extends SparkSpec {

  private def write(name: String)(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    val p = s"/tmp/graft_io/rangejoin/$name"
    rows.toSeq.toDF("id", "lo", "hi").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("matches the naive theta join, including bounds and negatives") {
    import spark.implicits._
    val ptsPath = "/tmp/graft_io/rangejoin/pts"
    // points straddling zero, exact bucket edges, exact interval bounds
    (-25L to 25L).map(i => (i, i * 7)).toDF("pid", "pt")
      .write.mode("overwrite").parquet(ptsPath)
    val pts = spark.read.parquet(ptsPath)
    val iv = write("iv")(
      (1L, -100L, -10L),   // fully negative
      (2L, -5L, 5L),       // straddles zero
      (3L, 0L, 0L),        // degenerate single point
      (4L, 14L, 14L),      // on a point exactly
      (5L, -175L, 175L),   // spans every bucket
      (6L, 200L, 300L))    // matches nothing
    for (b <- Seq(1L, 3L, 10L, 1000L)) {
      val fast = RangeJoin.pointInInterval(pts, col("pt"), iv, col("lo"), col("hi"), b)
        .select("pid", "id").orderBy("pid", "id").collect().toSeq
      val naive = pts.join(iv, col("lo") <= col("pt") && col("pt") <= col("hi"))
        .select("pid", "id").orderBy("pid", "id").collect().toSeq
      assert(fast == naive, s"bucketWidth=$b")
    }
  }

  test("property: 300 random points x 100 random intervals equal the naive join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ptsPath = "/tmp/graft_io/rangejoin/prop_pts"
    val ivPath = "/tmp/graft_io/rangejoin/prop_iv"
    (1 to 300).map(i => (i.toLong, rnd.between(-1000L, 1000L)))
      .toDF("pid", "pt").write.mode("overwrite").parquet(ptsPath)
    (1 to 100).map { i =>
      val lo = rnd.between(-1000L, 1000L)
      // ~10% inverted intervals (must match nothing)
      val hi = if (i % 10 == 0) lo - rnd.between(1L, 50L) else lo + rnd.between(0L, 200L)
      (i.toLong, lo, hi)
    }.toDF("id", "lo", "hi").write.mode("overwrite").parquet(ivPath)
    val pts = spark.read.parquet(ptsPath)
    val iv = spark.read.parquet(ivPath)
    val naive = pts.join(iv, col("lo") <= col("pt") && col("pt") <= col("hi"))
      .select("pid", "id").orderBy("pid", "id").collect().toSeq
    assert(naive.nonEmpty)
    for (b <- Seq(1L, 7L, 64L, 1000L)) {
      val fast = RangeJoin.pointInInterval(pts, col("pt"), iv, col("lo"), col("hi"), b)
        .select("pid", "id").orderBy("pid", "id").collect().toSeq
      assert(fast == naive, s"bucketWidth=$b")
    }
  }

  test("plans a shuffled equi-join on the bucket id, not a nested loop") {
    import spark.implicits._
    val pts = spark.read.parquet("/tmp/graft_io/rangejoin/pts")
    val iv = spark.read.parquet("/tmp/graft_io/rangejoin/iv")
    val p = RangeJoin.pointInInterval(pts, col("pt"), iv, col("lo"), col("hi"), 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join fell back to a pair blowup:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }
}
