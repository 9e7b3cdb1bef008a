package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`).
  *
  * Graft's native Catalyst expressions ([[graft.plans.SeqRatio]],
  * [[graft.plans.BitsetIntersectCount]], [[graft.plans.VecDotProduct]])
  * need to appear in DataFrame plans. Registering them as session SQL
  * functions works but mutates the session's function registry as a
  * plan-building side effect — silently clobbering any user-registered
  * function of the same name and making query semantics depend on
  * global registry state. This bridge lets the query code construct
  * the `Column` from the expression directly instead, with zero
  * session mutation; the `register` helpers on each expression object
  * remain only for the explicit SQL-string surface (and its tests).
  */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
