package graft

import graft.engine.Tables
import graft.ops.AsofJoin
import graft.plans.AsofNative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native tier-(c) as-of exec must agree with the tier-(a) library op
  * row-for-row, and must plan as exactly one shuffle per side with no
  * window machinery. */
class AsofNativeSpec extends SparkSpec {

  private def sortedRows(df: DataFrame) =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*).collect().toSeq

  test("native as-of equals the library op on the graded tables") {
    val events = Tables(spark, sf, "events").select("event_id", "user_id", "ts")
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val lib = AsofJoin(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    val native = AsofNative.join(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    assert(native.columns.toSeq == lib.columns.toSeq)
    assert(sortedRows(native) == sortedRows(lib))
  }

  test("native as-of handles null ts, equal-ts ties, and unmatched keys") {
    import spark.implicits._
    val lPath = "/tmp/graft_io/asof/l"; val rPath = "/tmp/graft_io/asof/r"
    // left: (id, key, ts) — includes null ts, null key, keys with no
    // right rows
    Seq((1L, Some(10L), Some(100L)), (2L, Some(10L), Some(50L)),
        (3L, Some(10L), None), (4L, Some(20L), Some(5L)),
        (5L, Some(30L), Some(7L)), (6L, Some(10L), Some(200L)),
        (7L, None, Some(100L)))
      .toDF("id", "k", "ts").write.mode("overwrite").parquet(lPath)
    // right: (key, ts, tb, v) — equal-ts tie at (10,100), null ts row,
    // null key row (must match NOTHING — SQL equi-join), key 99 unmatched
    Seq((Some(10L), Some(100L), 1L, "a"), (Some(10L), Some(100L), 2L, "b"),
        (Some(10L), Some(40L), 3L, "c"), (Some(10L), None, 4L, "d"),
        (Some(20L), Some(6L), 5L, "e"), (Some(99L), Some(1L), 6L, "f"),
        (None, Some(50L), 7L, "g"))
      .toDF("k", "rts", "tb", "v").write.mode("overwrite").parquet(rPath)
    val l = spark.read.parquet(lPath)
    val r = spark.read.parquet(rPath)
    val native = AsofNative.join(l, r, "k", "k", "ts", "rts", Seq("tb", "v"), "tb")
      .select("id", "tb", "v").orderBy("id").collect().toSeq.map(x =>
        (x.get(0), Option(x.get(1)), Option(x.get(2))))
    assert(native == Seq(
      (1L, Some(2L), Some("b")),   // equal-ts tie → greatest tiebreak
      (2L, Some(3L), Some("c")),   // 40 <= 50
      (3L, None, None),            // null left ts → no match
      (4L, None, None),            // right ts 6 > 5 → no match
      (5L, None, None),            // key 30 absent on the right
      (6L, Some(2L), Some("b")),   // still the ts=100 winner at ts=200
      (7L, None, None)))           // null left key → no match, even with a
                                   // null-key right row present
    // same data through the library op — bit-identical
    val lib = AsofJoin(l, r, "k", "k", "ts", "rts", Seq("tb", "v"), "tb")
      .select("id", "tb", "v").orderBy("id").collect().toSeq.map(x =>
        (x.get(0), Option(x.get(1)), Option(x.get(2))))
    assert(native == lib)
  }

  test("native as-of plans one exchange per side and no Window") {
    val events = Tables(spark, sf, "events").select("event_id", "user_id", "ts")
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val native = AsofNative.join(events, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"more than one shuffle per side:\n$p")
    assert(!p.contains("Window"), s"native exec must not fall back to window machinery:\n$p")
  }
}
