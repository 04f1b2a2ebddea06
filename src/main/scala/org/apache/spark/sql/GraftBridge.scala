package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), needed to expose
  * custom Catalyst expressions (graft.functions.*) as user-facing
  * Columns on Spark 4's ColumnNode-backed API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Decompose a (possibly sort-decorated) Column into its key column
    * plus direction and null placement: `col("x").desc` →
    * (col("x"), asc = false, nullsFirst = false). Spark 4's
    * ColumnNode-backed API converts sort decorations lazily
    * (ColumnNodeExpression), so the decomposition must happen on the
    * NODE — stripping on the converted Expression matches nothing and
    * the SortOrder would leak into value position (unevaluable). */
  def sortSpec(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: internal.SortOrder =>
      (Column(so.child),
        so.sortDirection == internal.SortOrder.Ascending,
        so.nullOrdering == internal.SortOrder.NullsFirst)
    case _ => (c, true, true)
  }

  /** A DataFrame over an arbitrary logical plan — the plan-audit hook
    * (WindowAuditSpec) that lets a test COUNT the rows and distinct
    * partition keys feeding a specific Window node. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
