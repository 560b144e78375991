package graft.connector

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The copy-on-write scan of a [[GraftRowLevelOperation]], carrying both
  * layers of dir-granular group pruning:
  *
  *  - static (already applied by the builder): pushed command-condition
  *    filters vs committed [[DirStats]] fixed `initialKept`;
  *  - runtime ([[SupportsRuntimeV2Filtering]]): for conditions a static
  *    filter can't see — a MERGE's ON keys, a DELETE's IN-subquery — Spark's
  *    `RowLevelOperationRuntimeGroupFiltering` plans a matching-rows
  *    subquery over the table, collects the distinct values of this scan's
  *    `filterAttributes`, and hands them back through `filter(...)` before
  *    planning input partitions. Those values are tested against each
  *    still-kept dir's stats, so a key-equality MERGE whose source touches
  *    one dir rewrites one dir.
  *
  * Spark builds one multi-column IN-subquery over ALL advertised filter
  * attributes, so advertising the whole schema would make the subquery's
  * distinct-tuple cardinality approach the matched row count (and a
  * multi-column IN doesn't convert to a V1 filter this scan could use).
  * `chooseFilterAttribute` therefore advertises exactly ONE column — the
  * one whose committed per-dir [min,max] ranges are most mutually disjoint
  * (prunes best), weighted by stats coverage — and advertises nothing when
  * no column has usable stats, which skips the matching-rows subquery
  * entirely instead of paying for an unusable one.
  *
  * The commit must replace exactly the dirs the executed scan read, so
  * every refinement of the kept set flows through `onKept` back to the
  * operation, and the delegated parquet batch is (re)built lazily from the
  * CURRENT kept set — `BatchScanExec` calls `toBatch.planInputPartitions`
  * again after runtime filtering, and must see the pruned dirs.
  *
  * Pruning here is advisory only: a kept-but-unmatched dir is copied
  * through unchanged, and every pruned dir survives untouched, so a missed
  * prune costs IO, never rows.
  */
private[connector] class GraftCowScan(schema: StructType,
                                      delegate: Seq[String] => ParquetTable,
                                      initialKept: Seq[DirEntry],
                                      onKept: (GraftCowScan, Seq[String]) => Unit,
                                      hadoopConf: org.apache.hadoop.conf.Configuration,
                                      nameMap: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var kept: Seq[DirEntry] = initialKept
  onKept(this, kept.map(_.dir))

  override def readSchema(): StructType = schema

  override def description(): String =
    s"graft-lake cow scan (${kept.size}/${initialKept.size} dirs)"

  // ---- runtime group filtering --------------------------------------------

  override def filterAttributes(): Array[NamedReference] =
    // static pruning already reduced the rewrite to <=1 dir: the
    // matching-rows subquery (a filtered scan of the whole table) costs
    // about as much as rewriting that one dir could save, so don't
    // advertise — Spark then skips the subquery entirely
    if (initialKept.size <= 1) Array.empty
    else GraftCowScan.chooseFilterAttribute(schema, initialKept, nameMap)
      .map(Expressions.column).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    // runtime predicates arrive with LOGICAL names; stats key physical
    val v1 = GraftSqlBridge.toV1Filters(predicates)
      .map(ColumnMapping.translateV1(_, nameMap))
    if (v1.nonEmpty) {
      kept = kept.filter(e => DirStats.mayMatch(e.stats, v1.toSeq))
      onKept(this, kept.map(_.dir))
    }
  }

  // ---- batch: delegate to a parquet scan over the CURRENT kept dirs -------
  // A kept dir carrying a deletion vector must have its deleted rows
  // APPLIED here — the copy-on-write output replaces the dir (vector and
  // all), so copying a deleted row through would resurrect it. The scan
  // pushes no filters (the group contract), so the hybrid wrapper only
  // re-routes the deleted-from files.

  private var built: (Seq[String], Batch) = _

  private def inner: Batch = synchronized {
    val dirs = kept.map(_.dir)
    if (built == null || built._1 != dirs) {
      val ps = delegate(dirs)
        .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      val dvs = GraftDvRead.dvByDir(kept, hadoopConf)
      built = (dirs, if (dvs.isEmpty) ps.toBatch else new GraftHybridScan(ps, dvs))
    }
    built._2
  }

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = inner.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory = inner.createReaderFactory()
}

private[connector] object GraftCowScan {

  /** The single column runtime group filtering keys on: among columns with
    * typed stats, maximize (fraction of adjacent [min,max] ranges that are
    * disjoint across dirs) x (fraction of dirs carrying stats); ties go to
    * schema order. None when no column has usable stats anywhere.
    */
  def chooseFilterAttribute(schema: StructType,
                            entries: Seq[DirEntry],
                            nameMap: Map[String, String] = Map.empty): Option[String] = {
    if (entries.isEmpty) return None
    // advertise the LOGICAL name; score against the PHYSICAL stats key
    val scored = schema.fieldNames.toSeq.flatMap { name =>
      val physName = nameMap.getOrElse(name, name)
      val cs = entries.flatMap(_.stats.flatMap(_.cols.get(physName)))
        .filter(_.typ != "null")
      val tag = cs.headOption.map(_.typ).getOrElse("")
      val typed = cs.filter(_.typ == tag)   // ignore a mixed-domain oddity
      if (typed.isEmpty) None
      else {
        val sorted = typed.sortWith((a, b) => DirStats.cmpIn(tag, a.min, b.min) < 0)
        val disjoint = sorted.sliding(2).count {
          case Seq(x, y) => DirStats.cmpIn(tag, x.max, y.min) < 0
          case _ => false
        }
        val disjointFrac =
          if (typed.size <= 1) 1.0 else disjoint.toDouble / (typed.size - 1)
        val coverage = typed.size.toDouble / entries.size
        Some(name -> disjointFrac * coverage)
      }
    }
    if (scored.isEmpty) None else Some(scored.maxBy(_._2)._1)
  }
}
