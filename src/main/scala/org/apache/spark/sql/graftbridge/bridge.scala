package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: converting between Column and
  * Catalyst Expression is package-private in Spark 4's classic module, and
  * custom native expressions (graft.functions.CosineSim) need both
  * directions. This is the entire private-API surface the library touches.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
