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
}
