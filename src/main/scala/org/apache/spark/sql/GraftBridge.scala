package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> Expression conversions, which are
  * `private[sql]` in Spark 4.x. Lives in the Spark SQL package solely to
  * re-export the two conversions our Catalyst expressions need; no Spark
  * internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
