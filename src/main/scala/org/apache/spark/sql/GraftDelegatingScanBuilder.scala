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
  * connector uses to attach a streaming face and merge-on-read handling to
  * the native parquet scan. Lives in the sql package because
  * `SupportsPushDownCatalystFilters` is `private[sql]`, the same reason
  * [[GraftSqlBridge]] exists. The one surface not forwarded is
  * nested-schema pruning's FileScanBuilder type check (a struct-column read
  * prunes to the top-level column instead of the nested field — a planning
  * nicety, not a correctness concern).
  *
  * Two merge-on-read hooks:
  *  - `metadataColNames` (the connector's lineage columns) are stripped
  *    from the pruned schema before the parquet builder sees them — the
  *    files don't contain them; the wrap receives the FULL required schema
  *    (metadata columns included) and serves them from the scan wrapper.
  *  - `refuseAggregates`: a snapshot carrying deletion vectors must not
  *    answer aggregates from parquet footers (deleted rows would count),
  *    so the pushdown is declined and Spark aggregates scan output.
  */
class GraftDelegatingScanBuilder(inner: ParquetScanBuilder,
                                 wrap: (Scan, Option[StructType]) => Scan,
                                 metadataColNames: Seq[String] = Nil,
                                 refuseAggregates: Boolean = false,
                                 nameMap: Map[String, String] = Map.empty)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  /** The last required schema Spark pruned to, INCLUDING any requested
    * metadata columns (None = pruning never ran: full data schema).
    * LOGICAL names — the wrap sees the caller's world; only the inner
    * parquet builder sees physical names (`nameMap`, column mapping).
    */
  private var requiredFull: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    if (nameMap.isEmpty) return inner.pushFilters(filters)
    // push PHYSICAL-named copies; hand back the ORIGINAL expression for
    // each residual (Spark re-evaluates residuals against logical output)
    val pairs = filters.map { f =>
      (graft.connector.ColumnMapping.translate(f, nameMap), f)
    }
    val inverse = nameMap.map(_.swap)
    inner.pushFilters(pairs.map(_._1)).map { r =>
      pairs.find(_._1 eq r).map(_._2)
        .getOrElse(graft.connector.ColumnMapping.translate(r, inverse))
    }
  }
  override def pushedFilters: Array[Predicate] = inner.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit = {
    requiredFull = Some(requiredSchema)
    val stripped =
      if (metadataColNames.isEmpty) requiredSchema
      else StructType(requiredSchema.fields.filterNot(f => metadataColNames.contains(f.name)))
    // physical names for the parquet builder; field ORDER is preserved, so
    // rows stay positionally aligned with the logical required schema
    inner.pruneColumns(graft.connector.ColumnMapping.rename(stripped, nameMap))
  }
  override def pushAggregation(aggregation: Aggregation): Boolean =
    !refuseAggregates && inner.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    !refuseAggregates && inner.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(extractions: Array[VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(extractions)

  override def build(): Scan = wrap(inner.build(), requiredFull)
}
