package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Wrap a raw Catalyst Expression as a Column without going through the
  * session function registry: graft's Column-API helpers (TextOps,
  * Similarity) construct their native expressions directly, so they resolve
  * in ANY SparkSession — the GraftExtensions injection is only needed for
  * SQL-text access (`SELECT graft_hash32(...)`).
  *
  * Lives in this package solely to reach the `private[sql]`
  * classic.ExpressionUtils.column seam; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (the programmatic entry for
    * graft's whole-operator plans, e.g. plans.TopKPerKey). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly convert a Column to its catalyst Expression via the session's
    * ColumnNode converter — unlike [[expression]]'s lazy wrapper, the
    * result is a plain serializable expression tree (what custom plan
    * nodes must embed). */
  def resolvedExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** The analyzed logical plan of a DataFrame (custom-plan child seam). */
  def logicalPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
