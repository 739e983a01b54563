package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 gates `ExpressionUtils` as
  * private[sql], so this one-file shim lives inside the
  * org.apache.spark.sql namespace — the standard pattern for
  * libraries that ship custom Catalyst expressions without a full
  * SparkSessionExtensions registration.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
