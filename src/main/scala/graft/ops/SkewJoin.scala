package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / 100 TB toolkit).
  *
  * A hot key floods one reducer in a plain shuffle join. Salting splits
  * each left key into `buckets` sub-keys deterministically (hash of a
  * unique column mod buckets) and replicates the right side once per
  * bucket, so the hot key's rows spread over `buckets` reducers. Results
  * are bit-identical to the unsalted join — only the partitioning changes.
  * AQE's skew-join handles moderate skew automatically; explicit salting
  * is the deterministic fallback for pathological keys and for engines/
  * modes where AQE splitting doesn't apply (e.g. streaming joins).
  */
object SkewJoin {
  /** @param saltSource columns that together vary within a hot key (ideally
    *                    a unique row id); salt = pmod(xxhash64(cols), buckets) */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     saltSource: Seq[String], buckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    // The salted join must BE a shuffle join (r15 measure): on a
    // bench-sized right side the planner picked BroadcastHashJoin over the
    // exploded salt — a buckets×|right| single-threaded driver build
    // (1.2M rows here, most of the query's 1.5 s) guarding a join with no
    // shuffle left to de-skew. Salting exists precisely for the case
    // where the right side is NOT broadcastable; the SHUFFLE_MERGE hint
    // (plan-carried — no conf window needed for a lazily-consumed frame)
    // makes the operator demonstrate its own mechanism at every scale.
    l.join(r.hint("shuffle_merge"),
        l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
