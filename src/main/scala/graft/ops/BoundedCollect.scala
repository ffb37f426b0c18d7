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
  * Two further known gaps in the same spirit (r9 advice — documented, not
  * closed, because closing them needs semantic knowledge the plan doesn't
  * carry): (1) ANY Aggregate counts as a bound, including one grouped on a
  * corpus-cardinality key (doc_id, user_id) whose output scales with the
  * corpus — the walker cannot distinguish catalog keys from corpus keys;
  * (2) a bare LocalLimit without its GlobalLimit partner bounds each
  * PARTITION at k, so the collected total is k × partitions, which grows
  * with the cluster, not the data. Every current call site collects a
  * scalar/handful-row aggregate or a GlobalLimit-ed frame; treat the
  * error message's "provably bounded" as "bounded modulo these gaps" when
  * adding a new site, and keep the written boundedness argument at the
  * call site for the cases the walker can't see. */
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

  private def boundedPhys(p: SparkPlan): Boolean = p.exists {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.RangeExec => true
    case a: AdaptiveSparkPlanExec => boundedPhys(a.inputPlan)
    case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      boundedPhys(s.relation.cachedPlan)
    case _ => false
  }

  private[graft] def bounded(p: LogicalPlan): Boolean = p.exists {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
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
