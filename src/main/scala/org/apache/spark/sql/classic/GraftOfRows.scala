package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to the `private[sql]` `Dataset.ofRows` — the supported
  * way for an extension library to materialize a DataFrame over a custom
  * LogicalPlan (Spark exposes injection seams for rules/strategies via
  * SparkSessionExtensions but no public plan→DataFrame constructor). Kept
  * to one forwarding call so graft code outside this file never touches
  * Spark internals' namespace. */
object GraftOfRows {
  def apply(spark: org.apache.spark.sql.SparkSession,
            plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
