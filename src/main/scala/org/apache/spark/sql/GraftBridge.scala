package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's codegen kernels.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so library code that builds
  * Catalyst expressions directly (StaticInvoke kernels in
  * `graft.functions.Kernels`) needs this one-file shim in the sql package —
  * the standard pattern for Spark extension libraries that pre-date a public
  * Expression constructor API. Nothing else in the engine reaches into
  * Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
