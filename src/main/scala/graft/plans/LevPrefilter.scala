package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: accelerate Levenshtein threshold predicates.
  *
  *   levenshtein(a, b) <= d
  *     ⇒  abs(length(a) - length(b)) <= d          -- free lower bound
  *        AND levenshtein(a, b, d) >= 0            -- banded DP
  *
  * Two independent wins, both sound:
  *
  *  1. `lev(a,b) >= |len(a)-len(b)|` always, so the integer length guard
  *     rejects most non-candidates before any DP runs (And short-circuits).
  *  2. Spark's three-argument Levenshtein runs the banded O(d·min(m,n))
  *     algorithm and returns -1 when the distance exceeds the threshold —
  *     so `lev(a,b) <= d  ⟺  lev(a,b,d) >= 0`, and the unbanded
  *     O(m·n) table is never filled for far-apart pairs.
  *
  * Null semantics are preserved: the guard is null exactly when the
  * original predicate is null (same inputs), and `And(null, null)` = null,
  * `And(false, _)` = false only when both inputs are non-null.
  *
  * Fixpoint-safe by construction: the rewrite produces a THREE-argument
  * Levenshtein, which the two-argument match no longer sees. Applies only
  * for literal integer d >= 1 (d <= 0 thresholds are degenerate).
  */
object LevPrefilter extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(lev @ Levenshtein(a, b, None), d @ Literal(dv, IntegerType))
        // operand duplication (guard + banded DP each evaluate a and b) is
        // only sound for deterministic expressions
        if dv != null && dv.asInstanceOf[Int] >= 1 &&
          a.deterministic && b.deterministic =>
      val guard = LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), d)
      And(guard, GreaterThanOrEqual(Levenshtein(a, b, Some(d)), Literal(0)))
  }
}
