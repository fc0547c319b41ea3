package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface for the graft extension
  * expressions: Column ⇄ Expression conversion is package-private in
  * Spark 4's classic API (`org.apache.spark.sql.classic.ExpressionUtils`),
  * so this one-file shim re-exports exactly the two conversions and
  * nothing else. Standard pattern for out-of-tree Catalyst extensions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
