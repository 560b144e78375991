package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the converters private[sql];
  * this is the conventional extension-library escape hatch (same pattern as
  * Delta/Iceberg/Sedona): a single object inside the sql package exposing
  * exactly the two conversions custom-expression libraries need.
  */
object GraftSqlBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
