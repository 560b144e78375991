package graft.connector

import java.util
import java.util.ConcurrentModificationException

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** One table of the [[GraftCatalog]] mini-lakehouse: snapshot-versioned
  * immutable parquet data dirs behind a [[TableLog]] manifest, with real SQL
  * `MERGE INTO` / `UPDATE` / `DELETE` via the DataSource V2 row-level
  * operation API ([[SupportsRowLevelOperations]], group-based copy-on-write).
  *
  * Reads and writes delegate to Spark's own parquet DSv2 implementation
  * ([[ParquetTable]]) pointed at the snapshot's data dirs — so scans get
  * vectorized reading, filter pushdown, and column pruning unchanged, and
  * writes produce parquet from the executors through the standard
  * `FileCommitProtocol`; this catalog adds only the transaction layer.
  *
  * Snapshot isolation: a loaded table pins the latest manifest version at
  * first read; every path a manifest references is immutable, so concurrent
  * commits never disturb a running scan. Row-level operations pin the
  * snapshot they read and CAS-commit against it — a concurrent APPEND
  * survives a rewrite (its dirs are not replaced), while two concurrent
  * rewrites conflict and the loser throws, matching lakehouse MERGE
  * semantics (write serialization via optimistic concurrency).
  */
class GraftTable(tableName: String, log: TableLog,
                 pinnedVersion: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def name(): String = tableName

  /** Schema/properties of THIS handle's version: a time-travel pin reads
    * the snapshot under the meta it was committed with (schema evolution
    * is versioned through the manifest meta header).
    */
  private val (tableSchema, tableProps): (StructType, Map[String, String]) =
    pinnedVersion.map(log.metaAt).getOrElse((log.schema, log.properties))

  override def schema(): StructType = tableSchema

  /** Identity PARTITIONED BY columns, reported back as the transforms
    * CREATE accepted (DESCRIBE, writeTo().partitionedBy round trips,
    * static `INSERT ... PARTITION (p = v)` resolution). Physically they
    * are the leading write-cluster keys + stats-pruned like every column —
    * see [[GraftCatalog.createTable]].
    */
  override def partitioning(): Array[Transform] =
    GraftTable.partitionColumns(tableProps)
      .map(c => org.apache.spark.sql.connector.expressions.Expressions.identity(c))
      .toArray

  override def properties(): util.Map[String, String] = tableProps.asJava

  /** Row-lineage metadata columns (`__graft_file`, `__graft_pos`): the
    * file and parquet row index a row came from — selectable on any read
    * (`SELECT __graft_file, ...`), and the row id merge-on-read DELETE
    * keys its deletion vectors on. Hidden unless referenced, like all
    * DSv2 metadata columns.
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftDvRead.FileCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "qualified path of the parquet file this row lives in"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftDvRead.PosCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String = "parquet global row index of this row within its file"
      })

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.MICRO_BATCH_READ)

  /** The version this Table handle reads — resolved eagerly when the
    * catalog loads the table (query analysis time), so every scan the query
    * plans (including self-joins) sees one consistent snapshot even if a
    * commit lands between analysis and execution.
    */
  private val snapshotEntries: Seq[DirEntry] =
    pinnedVersion.map(log.entriesAt).getOrElse(log.currentEntries())

  private def snapshotDirs: Seq[String] = snapshotEntries.map(_.dir)

  /** Column mapping of THIS handle's schema (empty maps = unmapped table,
    * every path below identical to the pre-mapping code).
    */
  private val nameMap: Map[String, String] = ColumnMapping.nameMap(tableSchema)
  private val inverseMap: Map[String, String] = nameMap.map(_.swap)

  private def delegate(paths: Seq[String]): ParquetTable =
    ParquetTable(tableName, SparkSession.active, CaseInsensitiveStringMap.empty(),
      paths, Some(ColumnMapping.toPhysical(log.schema)), classOf[ParquetFileFormat])

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // same delegated parquet table, but reads plan through a file index
    // that prunes whole dirs by manifest stats ([[GraftFileIndex]]) before
    // the parquet scan's own row-group pruning sees the survivors.
    // Everything the delegated parquet machinery sees — schema, file
    // index, pushed filters, pruned columns — speaks PHYSICAL names
    // (column mapping); everything Spark sees back speaks logical.
    val entries = snapshotEntries
    val hasDvs = entries.exists(_.dv.isDefined)
    val physSchema = ColumnMapping.toPhysical(tableSchema)
    val readTable = new ParquetTable(tableName, SparkSession.active,
      CaseInsensitiveStringMap.empty(), entries.map(_.dir), Some(physSchema),
      classOf[ParquetFileFormat]) {
      override lazy val fileIndex: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =
        new GraftFileIndex(sparkSession, entries, physSchema)
    }
    val inner = readTable.newScanBuilder(options)
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder]
    // full pushdown forwarded; the built scan gains the manifest-tailing
    // micro-batch face ([[GraftMicroBatchStream]]). A time-travel-pinned
    // handle refuses to stream: the changefeed tails the LIVE manifest, so
    // a pinned stream would silently emit versions past its pin.
    // Merge-on-read: a query selecting the lineage columns re-reads every
    // file through the row-index path; a snapshot carrying deletion
    // vectors re-reads only the deleted-from files (hybrid), and refuses
    // aggregate pushdown (footer counts include deleted rows).
    new org.apache.spark.sql.GraftDelegatingScanBuilder(inner,
      (scan, requiredFull) => {
        val ps = scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
        val metaRequested =
          requiredFull.exists(_.fieldNames.exists(GraftDvRead.isMetaCol))
        // the logical face of the raw parquet scan, translated ONCE: the
        // wrapper scans below already report logical names themselves, so
        // re-applying the inverse map to their output would double-translate
        // (a chained rename makes one field's logical name another's
        // physical name — the map is not idempotent)
        val psLogical =
          if (nameMap.isEmpty) None
          else Some(ColumnMapping.rename(ps.readSchema(), inverseMap))
        val (base: Scan, outerOverride: Option[StructType]) =
          if (metaRequested) {
            val dvs = GraftDvRead.dvByDir(entries, log.hadoopConf)
            (new GraftDvScan(ps, requiredFull.get, dvs, nameMap), None)
          } else if (hasDvs) {
            val dvs = GraftDvRead.dvByDir(entries, log.hadoopConf)
            (new GraftHybridScan(ps, dvs, readSchemaOverride = psLogical), None)
          } else (ps, psLogical)
        new GraftStreamableScan(base, log, delegate,
          streamable = pinnedVersion.isEmpty,
          readSchemaOverride = outerOverride)
      },
      metadataColNames = GraftDvRead.MetaColNames,
      refuseAggregates = hasDvs,
      nameMap = nameMap)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty, s"cannot write to $tableName pinned at VERSION AS OF ${pinnedVersion.get}")
    new GraftWriteBuilder(log, ColumnMapping.physicalWriteInfo(info, log.schema), delegate)
  }

  /** Metadata-only DELETE (Delta's optimization): when the committed stats
    * prove every snapshot dir is either ALL-match or NONE-match for the
    * delete condition, `OptimizeMetadataOnlyDeleteFromTable` replaces the
    * whole copy-on-write rewrite with [[deleteWhere]] — a pure manifest
    * commit dropping the all-match dirs, zero data read or written. Any
    * dir the stats cannot classify exactly makes [[canDeleteWhere]] answer
    * false and Spark falls back to the row-level rewrite, so this is
    * strictly an optimization, never a semantics change.
    */
  override def canDeleteWhere(filters0: Array[sources.Filter]): Boolean = {
    // stats are keyed by PHYSICAL column names (footers)
    val filters = filters0.map(ColumnMapping.translateV1(_, nameMap))
    pinnedVersion.isEmpty && snapshotEntries.forall { e =>
      DirStats.mustMatchAll(e.stats, filters.toSeq) ||
        !DirStats.mayMatch(e.stats, filters.toSeq)
    }
  }

  override def deleteWhere(filters0: Array[sources.Filter]): Unit = {
    val filters = filters0.map(ColumnMapping.translateV1(_, nameMap))
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(
          s"metadata delete on ${log.tableDir} failed after $attempts attempts")
      val expected = log.latestVersion
      val current = expected.map(log.entriesAt).getOrElse(Nil)
      // classify CURRENT entries each attempt: dropping a dir whose own
      // stats prove every row matches is correct under any interleaving,
      // and an unclassifiable dir from a concurrent commit simply survives
      // (serializable as: this DELETE ordered before that commit)
      val next = current.filterNot(e => DirStats.mustMatchAll(e.stats, filters.toSeq))
      done = next == current || log.tryCommitEntriesMeta(expected, next,
        newMeta = None, op = Some("DELETE"))
    }
  }

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty, s"cannot modify $tableName pinned at VERSION AS OF ${pinnedVersion.get}")
    // rewrite the snapshot this handle resolved at analysis time — the same
    // one any self-referencing scan of the command reads. A command whose
    // per-command mode property is merge-on-read writes deletion vectors
    // (+ a staged insert dir) instead of rewriting dirs; everything else
    // keeps the group-based copy-on-write rewrite, which applies any
    // existing vectors in its scan.
    val modeProp = info.command match {
      case RowLevelOperation.Command.DELETE => GraftTable.DeleteModeProp
      case RowLevelOperation.Command.UPDATE => GraftTable.UpdateModeProp
      case RowLevelOperation.Command.MERGE => GraftTable.MergeModeProp
    }
    val mode = tableProps.get(modeProp)
    val mor = mode.contains("merge-on-read")
    // `materialize` = copy-on-write storage WITH exact change lineage: the
    // command runs on the delta-based (merge-on-read) machinery — the only
    // plan shape that sees per-row (file, position) identity — and the
    // commit applies the vectors by rewriting the touched dirs, so the
    // committed snapshot is vector-free like a cow rewrite while the
    // change feed gets exact retraction/post-image positions instead of
    // net-effect churn (Delta's materialized change files, re-expressed
    // as position vectors over the REMOVED dirs).
    val materialize = mode.contains("materialize")
    () =>
      if (mor || materialize)
        new GraftMorOperation(log, delegate, snapshotEntries, info.command,
          nameMap, materialize = materialize)
      else new GraftRowLevelOperation(log, info.command, delegate, snapshotEntries, nameMap)
  }
}

object GraftTable {
  /** Per-command table properties selecting how a row-level command
    * materializes: `copy-on-write` (default — group rewrite) or
    * `merge-on-read` (deletion vectors + staged inserts).
    */
  val DeleteModeProp = "graft.delete.mode"
  val UpdateModeProp = "graft.update.mode"
  val MergeModeProp = "graft.merge.mode"

  /** Row budget for one merge-on-read row-level command's matched
    * positions (DELETE/UPDATE/MERGE): matched (file, position) pairs
    * funnel through commit messages to the driver at ~9 B/row, so the
    * envelope is driver memory, not data size. Past the budget the
    * command FAILS LOUDLY (task-side as soon as one task exceeds it,
    * driver-side on the merged total) pointing at copy-on-write — which
    * rewrites dirs distributedly and has no such funnel — instead of
    * quietly ballooning the driver. Default 20M rows ≈ 180 MB of
    * positions.
    */
  val MorMaxDeleteRowsProp = "graft.mor.maxDeleteRows"
  val MorMaxDeleteRowsDefault = 20000000L

  /** Comma-separated columns appends sort WITHIN partitions before
    * writing (tight parquet row-group stats from the first write).
    */
  val WriteClusterByProp = "graft.write.clusterBy"

  /** Comma-separated identity PARTITIONED BY columns (set by CREATE TABLE,
    * immutable afterwards). They lead the write-cluster ordering and prune
    * through [[DirStats]] like any column; no hive-style value dirs exist.
    */
  val PartitionByProp = "graft.partitionBy"

  /** Declared partition columns of a property map (Nil when unpartitioned). */
  def partitionColumns(props: Map[String, String]): Seq[String] =
    props.get(PartitionByProp)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** Gate on mor MERGE's exact update-pair attribution (default true);
    * false = net-effect change rows. See GraftDvBatchWrite.
    */
  val CdcExactPairingProp = "graft.cdc.exactPairing"

  /** Legal values of the per-command mode properties. */
  val Modes: Set[String] = Set("copy-on-write", "merge-on-read", "materialize")

  /** Fail-loudly validation of graft.* table properties at CREATE / ALTER
    * SET: the mode routing matches on exact strings, so a typo
    * ('materialise', 'mor') would otherwise SILENTLY mean copy-on-write,
    * and a non-boolean exactPairing would explode at write time with a
    * bare NumberFormat-style message.
    */
  def validateProps(props: Map[String, String], table: String): Unit = {
    Seq(DeleteModeProp, UpdateModeProp, MergeModeProp).foreach { k =>
      props.get(k).foreach(v => require(Modes.contains(v),
        s"$table: $k must be one of ${Modes.toSeq.sorted.mkString(", ")}; got '$v'"))
    }
    props.get(CdcExactPairingProp).foreach(v =>
      require(v == "true" || v == "false",
        s"$table: $CdcExactPairingProp must be true or false; got '$v'"))
    props.get(ColumnMapping.ModeProp).foreach(v => require(v == "id",
      s"$table: ${ColumnMapping.ModeProp} supports only 'id' (set " +
        s"automatically by RENAME/DROP COLUMN); got '$v'"))
  }
}

/** Plain-write builder: `INSERT INTO` appends a new data dir; `INSERT
  * OVERWRITE` / `TRUNCATE` ([[SupportsTruncate]]) replaces the dir list.
  *
  * `graft.write.clusterBy` (comma-separated columns): appends request a
  * WITHIN-PARTITION sort on those columns ([[RequiresDistributionAndOrdering]]
  * with an unspecified distribution — no shuffle), so every written file's
  * parquet row groups carry tight min/max on the cluster keys from the
  * FIRST write, not only after an OPTIMIZE with `cluster_by`. Row-group
  * pruning then works on fresh appends; dir-granular stats pruning is
  * unaffected (one dir per write either way).
  */
private[connector] class GraftWriteBuilder(log: TableLog, info: LogicalWriteInfo,
                                           delegate: Seq[String] => ParquetTable)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var replace = false
  private var overwriteFilters: Option[Seq[org.apache.spark.sql.sources.Filter]] = None
  override def truncate(): WriteBuilder = { replace = true; this }

  /** Filter-scoped `INSERT OVERWRITE` (static `PARTITION (p = v)` specs and
    * `REPLACE WHERE`-shaped writes): committed dir-granularly — every live
    * dir must be PROVABLY all-in (stats show every row matches, dropped) or
    * all-out (stats show no row can match, kept); a dir the stats cannot
    * decide fails the command loudly at commit with the rewrite recipe,
    * never overwriting more or less than asked. On a table whose writes are
    * aligned with its `PARTITIONED BY` columns (identity partitioning leads
    * the write-cluster sort, so per-dir min == max on partition columns),
    * every dir is decidable and partition overwrite just works — the
    * metadata-only-delete proof ([[DirStats.mustMatchAll]]) run in reverse.
    */
  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    if (filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue)) replace = true
    else overwriteFilters = Some(filters.toSeq)
    this
  }

  override def build(): Write = {
    val staging = log.newDataDir()
    val inner = delegate(Seq(staging)).newWriteBuilder(info).build()
    val mode: CommitMode =
      if (replace) Replace
      else overwriteFilters.map(OverwriteByFilter(_)).getOrElse(Append)
    val clusterBy = log.properties.get(GraftTable.WriteClusterByProp)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    // identity partition columns lead the ordering: a partitioned table's
    // appends segregate partition values into contiguous row groups even
    // with no explicit clusterBy, so partition-predicate scans prune at
    // both granularities (manifest dir stats, then parquet row groups)
    val partitionBy = GraftTable.partitionColumns(log.properties)
    val orderCols = partitionBy ++
      clusterBy.filterNot(c => partitionBy.exists(_.equalsIgnoreCase(c)))
    if (orderCols.isEmpty) new GraftWrite(inner, log, staging, mode)
    else {
      val missing = orderCols.filterNot(c =>
        log.schema.fieldNames.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"${GraftTable.WriteClusterByProp} references unknown columns: " +
          missing.mkString(", "))
      new GraftWrite(inner, log, staging, mode)
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          orderCols.map(c => org.apache.spark.sql.connector.expressions.Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions.column(c),
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray
      }
    }
  }
}

private[connector] sealed trait CommitMode
private[connector] case object Append extends CommitMode
private[connector] case object Replace extends CommitMode
/** Filter-scoped overwrite: drop exactly the dirs whose rows all satisfy
  * `filters` (stats-proven), keep the dirs no row can satisfy, fail loudly
  * on any dir the stats cannot decide (see
  * [[GraftWriteBuilder.overwrite]]). Filters carry LOGICAL names; the
  * commit translates to physical before consulting stats.
  */
private[connector] final case class OverwriteByFilter(
    filters: Seq[org.apache.spark.sql.sources.Filter]) extends CommitMode
/** Replace exactly the dirs the row-level scan READ (copy-on-write). The
  * set is resolved through a thunk at commit time because group pruning
  * fixes it only when the rewrite's scan is built during optimization.
  * `dvOf` is each pinned dir's deletion vector AT SCAN TIME — the rewrite
  * applied that vector, so a dir whose vector changed underneath (a
  * concurrent merge-on-read delete) must conflict, not be replaced.
  */
private[connector] final case class ReplacePinned(pinned: () => Seq[String],
                                                  dvOf: String => Option[String],
                                                  op: String) extends CommitMode

/** Group-based copy-on-write row-level operation behind `MERGE INTO` /
  * `UPDATE` / `DELETE`, with dir-granular group pruning.
  *
  * The rewrite pushes the command's condition into this scan as a GROUP
  * filter (`GroupBasedRowLevelOperationScanPlanning` → `PushDownUtils`) —
  * the contract being that the connector may use it to choose which GROUPS
  * to rewrite, but must return every row of each group it keeps. Two
  * consequences shape this class:
  *
  *  - The replacement unit is one manifest data dir: pushed filters are
  *    tested against each pinned dir's committed [[DirStats]], dirs that
  *    provably contain no matching row are neither read nor replaced, and
  *    the commit CAS-swaps exactly the dirs the scan read. An UPDATE whose
  *    condition touches one dir of a thousand rewrites one dir.
  *
  *  - NO filter may reach the delegated parquet scan or be claimed as
  *    handled: a ParquetScan honoring the pushed filter would prune row
  *    groups (dropping their unmatched rows from the copy-on-write output),
  *    and claiming filters handled would let Spark elide its own row-level
  *    condition. `pushFilters` therefore returns everything as residual and
  *    `pushedFilters` stays empty — stats pruning is invisible to the
  *    planner and strictly conservative, so correctness never depends on it.
  *
  * The commit must replace exactly the dir set the EXECUTED scan read, so
  * the builder refuses a second build with a different pruning outcome
  * (one rewrite plans one group scan in Spark 4.1; anything else is an
  * unknown plan shape where a silent mismatch could lose or duplicate rows).
  */
private[connector] class GraftRowLevelOperation(log: TableLog,
                                                cmd: RowLevelOperation.Command,
                                                delegate: Seq[String] => ParquetTable,
                                                pinned: Seq[DirEntry],
                                                nameMap: Map[String, String] = Map.empty)
    extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd

  /** Dirs the rewrite's scan reads = dirs the commit replaces. Until the
    * scan is built (or if pruning never ran) this is the full snapshot,
    * which is always safe: an unpruned rewrite reads and rewrites
    * everything. Every refinement — static at scan build, runtime via
    * [[GraftCowScan]]'s group filtering — reports through [[onKept]]; a
    * second scan instance disagreeing with the recorded set fails loudly
    * (one rewrite plans one group scan in Spark 4.1; anything else is an
    * unknown plan shape where a silent mismatch could lose or duplicate
    * rows).
    */
  @volatile private var readDirsV: Option[Seq[String]] = None
  @volatile private var scanOwner: GraftCowScan = _
  private def readDirs(): Seq[String] = readDirsV.getOrElse(pinned.map(_.dir))

  private def onKept(scan: GraftCowScan, dirs: Seq[String]): Unit = synchronized {
    if (scanOwner == null || (scanOwner eq scan)) {
      scanOwner = scan; readDirsV = Some(dirs)
    } else if (readDirsV.contains(dirs)) {
      scanOwner = scan   // identical rebuild: adopt the new instance
    } else throw new IllegalStateException(
      s"row-level rewrite of ${log.tableDir} built two scans with different " +
        s"group pruning (${readDirsV.map(_.size)} vs ${dirs.size} dirs); " +
        "refusing — the commit could not know which set the executed plan read")
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters {
      private var groupFilters: Array[sources.Filter] = Array.empty

      override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
        groupFilters = filters
        filters   // all residual: we prune groups, we do not filter rows
      }

      override def pushedFilters(): Array[sources.Filter] = Array.empty

      override def build(): Scan = {
        // stats probe by physical names; the scan's output stays logical
        val phys = groupFilters.toSeq.map(ColumnMapping.translateV1(_, nameMap))
        val kept = pinned.filter(e => DirStats.mayMatch(e.stats, phys))
        new GraftCowScan(log.schema, delegate, kept, onKept, log.hadoopConf, nameMap)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val staging = log.newDataDir()
        val physInfo = ColumnMapping.physicalWriteInfo(info, log.schema)
        val inner = delegate(Seq(staging)).newWriteBuilder(physInfo).build()
        new GraftWrite(inner, log, staging,
          ReplacePinned(() => readDirs(),
            dir => pinned.find(_.dir == dir).flatMap(_.dv), cmd.toString),
          projectTo = Some(info.schema()))
      }
    }
}

/** Wraps the delegated parquet [[Write]]: executors write parquet into the
  * never-yet-visible `staging` dir through the inner write's committer, and
  * the wrapper's `commit` publishes the new manifest — the inner commit
  * finalizes files, the [[TableLog]] CAS makes them visible.
  *
  * `projectTo` (row-level writes only): Spark's group-based rewrites emit
  * `__row_operation :: dataColumns` and apply the narrowing projection in
  * `ReplaceDataExec` ONLY for connectors declaring metadata attributes —
  * a connector without them receives the raw rows, so the wrapper projects
  * the trailing data columns onto the declared write schema itself (see
  * [[ProjectingDataWriterFactory]]).
  */
private[connector] class GraftWrite(inner: Write, log: TableLog, staging: String,
                                    mode: CommitMode,
                                    projectTo: Option[StructType] = None) extends Write {
  override def description(): String = s"graft-lake $mode -> $staging"
  override def toBatch: BatchWrite =
    new GraftBatchWrite(inner.toBatch, log, staging, mode, projectTo)
}

private[connector] class GraftBatchWrite(inner: BatchWrite, log: TableLog,
                                         staging: String, mode: CommitMode,
                                         projectTo: Option[StructType] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val factory = inner.createBatchWriterFactory(info)
    projectTo.map(new ProjectingDataWriterFactory(factory, _)).getOrElse(factory)
  }

  override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    inner.commit(messages)   // finalize staged parquet files
    // one footer pass over the freshly-finalized staging dir records its
    // column stats in the manifest (Delta's add-file stats, computed without
    // re-reading data); a failed read just commits the dir statless
    val stagingEntry = DirEntry(staging, DirStats.collect(staging, log.hadoopConf))
    // a provably-empty output commits no dir in ANY mode (a zero-task write
    // may never even create its staging dir; appending it would put a
    // phantom path in the manifest)
    val stagedEmpty = stagingEntry.stats.exists(_.rows == 0)
    var done = false
    var attempts = 0
    while (!done) {
      // a CAS miss means someone committed first and the re-read converges;
      // endless false from the SAME state means the filesystem is rejecting
      // renames — surface that instead of spinning forever
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(
          s"commit to ${log.tableDir} failed after $attempts attempts — " +
            "manifest rename keeps failing (filesystem problem, not contention)")
      val expected = log.latestVersion
      val current = expected.map(log.entriesAt).getOrElse(Nil)
      val next = mode match {
        case Append => if (stagedEmpty) current else current :+ stagingEntry
        case Replace => if (stagedEmpty) Nil else Seq(stagingEntry)
        case OverwriteByFilter(filters) =>
          // stats key PHYSICAL names; the overwrite condition arrives logical
          val phys = filters.map(
            ColumnMapping.translateV1(_, ColumnMapping.nameMap(log.schema)))
          val undecidable = current.filter(e =>
            DirStats.mayMatch(e.stats, phys) && !DirStats.mustMatchAll(e.stats, phys))
          if (undecidable.nonEmpty)
            throw new UnsupportedOperationException(
              s"filter-scoped INSERT OVERWRITE on ${log.tableDir}: " +
                s"${undecidable.size} of ${current.size} data dirs are not " +
                s"PROVABLY inside or outside the overwrite condition " +
                s"(${filters.mkString(" AND ")}), and a dir-granular commit " +
                "cannot split a dir. Either (a) align writes with the " +
                "condition columns — CREATE TABLE ... PARTITIONED BY them, " +
                "so every dir's stats decide — or (b) rewrite explicitly: " +
                "INSERT OVERWRITE the whole table with the kept rows " +
                "(SELECT ... WHERE NOT(<condition>)) unioned with the new " +
                "data, or (c) DELETE WHERE <condition> then INSERT INTO. " +
                "Refusing rather than overwriting more or less than asked.")
          val kept = current.filterNot(e => DirStats.mustMatchAll(e.stats, phys))
          if (stagedEmpty) kept else kept :+ stagingEntry
        case ReplacePinned(pinnedFn, dvOf, _) =>
          // a dir we read that is no longer listed was replaced by a
          // concurrent rewrite — our copy-on-write output is based on stale
          // rows and must not win; a dir whose deletion vector changed was
          // concurrently merge-on-read deleted from, and replacing it would
          // silently resurrect those rows
          val pinned = pinnedFn()
          val missing = pinned.filterNot(p => current.exists(_.dir == p))
          if (missing.nonEmpty)
            throw new ConcurrentModificationException(
              s"concurrent rewrite of ${log.tableDir}: pinned dirs replaced: ${missing.mkString(", ")}")
          val dvChanged = pinned.filter(p =>
            current.find(_.dir == p).exists(_.dv != dvOf(p)))
          if (dvChanged.nonEmpty)
            throw new ConcurrentModificationException(
              s"concurrent merge-on-read delete on ${log.tableDir}: deletion " +
                s"vectors changed under pinned dirs: ${dvChanged.mkString(", ")}")
          val kept = current.filterNot(e => pinned.contains(e.dir))
          // a DELETE that empties its groups removes them outright, and a
          // fully-pruned no-op rewrite leaves the manifest's dir list unchanged
          if (stagedEmpty) kept else kept :+ stagingEntry
      }
      // stamp the commit's operation (DESCRIBE HISTORY's operation column;
      // the CDF keys only on the "(merge-on-read)"-suffixed markers)
      val op = mode match {
        case Append => "WRITE"
        case Replace => "OVERWRITE"
        case _: OverwriteByFilter => "OVERWRITE"
        case rp: ReplacePinned => rp.op
      }
      done = log.tryCommitEntriesMeta(expected, next, newMeta = None, op = Some(op))
      // CAS miss: someone committed expected+1 first — re-read and retry
      // (Append/Replace always converge; ReplacePinned re-checks conflicts)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    inner.abort(messages)
    // the staging dir was never referenced by any manifest; best-effort
    // cleanup with the table's OWN hadoop conf (a default Configuration
    // would miss filesystem credentials/settings), never masking the
    // original failure — vacuum() reclaims anything left behind
    try {
      val p = new org.apache.hadoop.fs.Path(staging)
      p.getFileSystem(log.hadoopConf).delete(p, true)
    } catch { case scala.util.control.NonFatal(_) => }
  }
}

/** Executor-side adapter for the group-based row-level write path: the
  * incoming rows are `__row_operation :: dataColumns` (verified against the
  * Spark 4.1 `RewriteUpdateTable` / `RewriteDeleteFromTable` /
  * `RewriteMergeIntoTable` union plans), so each row is viewed through a
  * reusable [[ProjectingInternalRow]] that drops the leading operation
  * column before it reaches the parquet writer. Rows already matching the
  * write schema pass through untouched; any other arity fails loudly rather
  * than silently mis-mapping columns.
  */
private[connector] class ProjectingDataWriterFactory(inner: DataWriterFactory,
                                                     writeSchema: StructType)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val innerWriter = inner.createWriter(partitionId, taskId)
    val n = writeSchema.length
    val view = org.apache.spark.sql.catalyst.ProjectingInternalRow(writeSchema, (1 to n).toList)
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == n) innerWriter.write(row)
        else if (row.numFields == n + 1) { view.project(row); innerWriter.write(view) }
        else throw new IllegalStateException(
          s"row-level write row has ${row.numFields} fields, expected $n or ${n + 1}")
      override def commit(): WriterCommitMessage = innerWriter.commit()
      override def abort(): Unit = innerWriter.abort()
      override def close(): Unit = innerWriter.close()
      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        innerWriter.currentMetricsValues()
    }
  }
}
