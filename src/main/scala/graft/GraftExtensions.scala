package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProduct

/** The spark-submit-time integration point: activate everything graft
  * injects into Catalyst with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (In harness-owned sessions the same registrations happen lazily via
  * DotProduct.register; this class is the clean-deployment path.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.DotRewrite)
    ext.injectOptimizerRule(_ => graft.plans.LevPrefilter)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
