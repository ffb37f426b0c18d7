package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join — the scale path for PURE interval predicates.
  *
  * A join whose only condition is `lo <= pt AND pt <= hi` has no equi key,
  * so Spark must plan BroadcastNestedLoopJoin: O(|points|·|intervals|)
  * comparisons and a broadcast of a whole side — a non-starter at 100 TB.
  * (With an equi key alongside the range — join_interval,
  * join_theta_range — the shuffle join on that key already bounds the
  * blowup; this operator is for when there is none.)
  *
  * The standard fix: quantize the range dimension into width-B buckets.
  * Each interval is replicated to every bucket it overlaps
  * (`sequence(floor(lo/B), floor(hi/B))`), each point belongs to exactly
  * ONE bucket (`floor(pt/B)`), and the join becomes a plain shuffled
  * equi-join on the bucket id followed by the exact range filter. No
  * duplicate pairs by construction (a point only meets an interval in the
  * point's own bucket), so no dedup pass. Cost: |intervals| × avg-span/B
  * replicated rows instead of a cross product; pick B near the median
  * interval span. Skewed buckets fall out to AQE like any other shuffle.
  */
object RangeJoin {

  /** Inner-join `points` to every row of `intervals` whose [lo, hi]
    * contains its `pt` (inclusive both ends). All columns of both inputs
    * survive; `pt`/`lo`/`hi` must be long-valued (epoch micros etc.) and
    * `bucketWidth` > 0. */
  def pointInInterval(points: DataFrame, pt: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = lit(bucketWidth)
    // empty intervals (lo > hi) match nothing — drop them BEFORE explode,
    // both for join semantics and because sequence() would otherwise emit a
    // descending bucket range. Caller contract: bucketWidth must be sized so
    // max interval span / bucketWidth stays well under 2^31 (sequence()'s
    // array limit) — pick B near the median span.
    val iv = intervals.where(lo <= hi).withColumn("__bkt",
      explode(sequence(floorDiv(lo, b), floorDiv(hi, b))))
    val pts = points.withColumn("__bkt", floorDiv(pt, b))
    pts.join(iv, Seq("__bkt")).where(lo <= pt && pt <= hi).drop("__bkt")
  }

  /** Exact long floor-division: x - pmod(x,y) is an exact multiple of y,
    * so integral `div` (truncating) equals floor — no double mantissa in
    * the path (a ~1e15 epoch-micros value must never ride a double). */
  private def floorDiv(x: Column, y: Column): Column =
    call_function("div", x - pmod(x, y), y)
}
