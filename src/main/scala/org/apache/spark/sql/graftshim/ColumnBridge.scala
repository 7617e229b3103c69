package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`; a shim package inside org.apache.spark.sql is the
  * standard pattern public extension libraries use to register native
  * expressions (this file is the repo's ONLY reach into Spark's package
  * privacy, kept to these two one-liners).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
