package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Runtime guard for the driver-side `.collect()` contract: every collect
  * in this library must read a frame whose size is bounded by a catalog /
  * request / iteration count, never by the corpus. Until r9 the bound was
  * comment-enforced only (each site carried a written boundedness
  * argument); one refactor could silently turn a catalog-bounded collect
  * corpus-bounded. Routing the sites through [[rows]] turns the comment
  * into a plan assertion — the same Aggregate/Limit/LocalRelation walker
  * PlanShapeSpec uses to ban unpartitioned corpus windows, applied to the
  * collect's optimized plan at call time.
  *
  * The walker is an `exists` over the subtree, so an Aggregate on one join
  * branch vacuously passes an unbounded other branch — acceptable for the
  * same reason as the window ban: no current collect has that shape, and
  * the guard's job is catching the obvious regression (a collect whose
  * plan lost its aggregate/limit entirely), not adversarial plans.
  *
  * The two r9-advice gaps are CLOSED as of r11: (1) an Aggregate whose
  * grouping keys reference a corpus-cardinality column (the static
  * [[corpusKeys]] denylist: doc_id, vec_id, event_id, user_id,
  * l_orderkey — the row-identity columns of the driver's unbounded
  * tables) no longer counts as a bound, because its output scales with
  * the corpus, not a catalog; (2) a bare LocalLimit no longer counts —
  * it bounds each PARTITION at k, so the collected total is
  * k × partitions, which grows with the cluster. Only GlobalLimit (and
  * its TakeOrdered physical form) bounds the driver-side total. The
  * denylist is name-based and best-effort (an alias can launder a corpus
  * key past it), so keep the written boundedness argument at each call
  * site for the cases the walker can't see. */
object BoundedCollect {

  /** `df.collect()`, but only if the optimized plan is provably bounded
    * below (Aggregate / Limit / literal frame / cached bounded plan).
    * `context` names the call site in the failure message. */
  def rows(df: DataFrame, context: String): Array[Row] = {
    val plan = df.queryExecution.optimizedPlan
    require(bounded(plan),
      s"$context: driver-side collect over a plan with no Aggregate/Limit/" +
        s"literal bound — this collect would scale with the corpus. Add the " +
        s"bounding operator (or collect something else):\n$plan")
    df.collect()
  }

  /** Row-identity columns of the driver tables whose cardinality IS the
    * corpus (TESTDATA.md): a group-by on any of these produces one row
    * per document/vector/event/user/order, so it bounds nothing. */
  private val corpusKeys =
    Set("doc_id", "vec_id", "event_id", "user_id", "l_orderkey")

  private def boundedPhys(p: SparkPlan): Boolean = p.exists {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      !a.groupingExpressions.exists(_.references.exists(r =>
        corpusKeys(r.name.toLowerCase)))
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.RangeExec => true
    case a: AdaptiveSparkPlanExec => boundedPhys(a.inputPlan)
    case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      boundedPhys(s.relation.cachedPlan)
    case _ => false
  }

  private[graft] def bounded(p: LogicalPlan): Boolean = p.exists {
    case a: Aggregate =>
      !a.groupingExpressions.exists(_.references.exists(r =>
        corpusKeys(r.name.toLowerCase)))
    case _: GlobalLimit => true
    case _: LocalRelation => true
    case _: OneRowRelation => true
    case _: Range => true
    // rn <= k filters over an UNPARTITIONED row_number window optimize to
    // WindowGroupLimit (global bound = k) — the mmrDiversify candidate
    // pool shape; a partitioned group limit is k×keys, NOT corpus-bounded,
    // so only the empty-partition form counts
    case wgl: WindowGroupLimit if wgl.partitionSpec.isEmpty => true
    case imr: InMemoryRelation => boundedPhys(imr.cachedPlan)
    case _ => false
  }
}
