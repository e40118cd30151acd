package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` surface the engine legitimately needs:
  * wrapping custom Catalyst Expressions as public `Column`s. This is the
  * standard pattern used by public Spark ecosystem libraries (Sedona, Delta)
  * on Spark 4's ColumnNode API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
