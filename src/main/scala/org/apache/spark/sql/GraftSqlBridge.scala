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

  /** A DataFrame over an unregistered DSv2 [[connector.catalog.Table]]
    * handle with read options — how a library face (the change-data-feed)
    * reads its own table implementation without a catalog round-trip.
    * `Dataset.ofRows` and the classic session type are `private[sql]`.
    */
  def readTable(spark: SparkSession,
                table: org.apache.spark.sql.connector.catalog.Table,
                options: Map[String, String]): DataFrame = {
    val relation = org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
      .create(table, None, None,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          scala.jdk.CollectionConverters.MapHasAsJava(options).asJava))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], relation)
  }
}
