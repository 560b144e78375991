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

  /** V2 connector predicates -> V1 source filters (unconvertible predicates
    * are dropped — the conservative direction for stats-based pruning).
    * Needed by the lakehouse scan's runtime group filtering; the converter
    * is `private[sql]` like the Column bridges above.
    */
  def toV1Filters(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(predicates)

  /** Catalyst predicate -> V1 source filter (None = untranslatable, which
    * for stats-based pruning means "never prune"). `protected[sql]` like
    * the converters above; used by the lakehouse read index.
    */
  def translateFilter(e: Expression): Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
}
