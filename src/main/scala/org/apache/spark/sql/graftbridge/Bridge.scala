/*
 * Lives under org.apache.spark.sql solely to reach the private[sql]
 * Expression <-> Column conversion (org.apache.spark.sql.classic.ExpressionUtils),
 * the supported pattern for third-party Catalyst expressions on Spark 4.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
