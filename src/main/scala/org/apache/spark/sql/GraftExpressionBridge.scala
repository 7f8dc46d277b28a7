package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between user-facing [[Column]]s and Catalyst [[Expression]]s.
  * Spark 4's classic API gates both directions behind `private[sql]`
  * (`classic.ExpressionUtils`); graft's custom native expressions
  * (e.g. `graft.functions.LshBucketExpr`) need them to participate in
  * the DataFrame API. Standard extension-library technique: a tiny
  * same-package shim, no behavior of its own.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
