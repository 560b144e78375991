package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Forwards the delegated [[ParquetScanBuilder]]'s full pushdown surface
  * (catalyst filters, column pruning, aggregate pushdown, variant
  * extraction) and wraps only the BUILT scan — the seam the lakehouse
  * connector uses to attach a streaming face to the native parquet scan.
  * Lives in the sql package because `SupportsPushDownCatalystFilters` is
  * `private[sql]`, the same reason [[GraftSqlBridge]] exists. The one
  * surface not forwarded is nested-schema pruning's FileScanBuilder type
  * check (a struct-column read prunes to the top-level column instead of
  * the nested field — a planning nicety, not a correctness concern).
  */
class GraftDelegatingScanBuilder(inner: ParquetScanBuilder, wrap: Scan => Scan)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = inner.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def pushAggregation(aggregation: Aggregation): Boolean =
    inner.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(extractions: Array[VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(extractions)

  override def build(): Scan = wrap(inner.build())
}
