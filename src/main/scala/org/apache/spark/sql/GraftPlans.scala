package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` plan→DataFrame constructor, for the
  * CDC signed-aggregation rewrite ([[graft.sql.StreamingCdc]]) which
  * surgically edits an analyzed plan and needs it back as a Dataset. Same
  * pattern as the reference planner's direct RelNode construction — the
  * one place graft builds a plan Catalyst didn't author end-to-end. */
object GraftPlans {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column over a hand-built Catalyst expression (for graft's custom
    * expressions that have no `functions._` spelling). */
  def column(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
