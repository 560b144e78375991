package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read scan machinery for the mini-lakehouse: applies committed
  * [[DeletionVector]]s at read time and serves the row-lineage metadata
  * columns (`__graft_file`, `__graft_pos`) that merge-on-read DELETE uses
  * as its row ids — Delta's DV read path / Iceberg's `_file`+`_pos`,
  * rebuilt on Spark's public surfaces.
  *
  * Row positions come from Spark's own parquet row-index machinery: the
  * delegated [[ParquetScan]] is rebuilt with
  * `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` appended to its
  * read schema, which both the vectorized and parquet-mr readers recognize
  * and fill with the GLOBAL row index of each row in its file, derived
  * from footer row-group offsets — correct under file splits AND under
  * row-group pruning, so the pushed data filters stay pushed (a point
  * DELETE on a vectored table still skips row groups).
  *
  * What is traded away, and only for the files that carry deletions (plus
  * every file of a scan that selects the lineage columns): columnar
  * hand-off to the query (rows are filtered one by one against the
  * vector's skipper) and aggregate pushdown (footer row counts include
  * deleted rows — [[org.apache.spark.sql.GraftDelegatingScanBuilder]]
  * refuses the pushdown when the snapshot has vectors). Compaction purges
  * vectors and restores the clean path.
  */
private[connector] object GraftDvRead {

  /** Lineage metadata column names (the merge-on-read row id). */
  val FileCol = "__graft_file"
  val PosCol = "__graft_pos"
  val MetaColNames: Seq[String] = Seq(FileCol, PosCol)

  def isMetaCol(name: String): Boolean = MetaColNames.contains(name)

  private def rowIndexField: StructField =
    StructField(ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType,
      nullable = true)

  /** A dir's committed vector: its immutable file path (what tasks ship)
    * plus the driver-decoded content (what planning routes on).
    */
  final case class DvRef(path: String, vector: DeletionVector)

  /** Qualified-dir-path -> deletion vector reference, for the entries that
    * carry one. Keys are qualified the way listed file paths report their
    * parent (all dirs share the table's filesystem, one lookup suffices).
    */
  def dvByDir(entries: Seq[DirEntry],
              conf: org.apache.hadoop.conf.Configuration): Map[String, DvRef] = {
    val vectored = entries.filter(_.dv.isDefined)
    if (vectored.isEmpty) return Map.empty
    val fs = new Path(vectored.head.dir).getFileSystem(conf)
    vectored.map { e =>
      fs.makeQualified(new Path(e.dir)).toString ->
        DvRef(e.dv.get, DeletionVectorCache.get(e.dv.get, conf))
    }.toMap
  }

  /** Deleted positions of one listed file, given the per-dir vectors
    * (driver-side routing only — tasks re-resolve via the cache).
    */
  def positionsFor(dvs: Map[String, DvRef], file: PartitionedFile): Array[Long] = {
    val p = file.filePath.toPath
    dvs.get(p.getParent.toString)
      .flatMap(_.vector.files.get(p.getName))
      .getOrElse(Array.emptyLongArray)
  }

  /** The vector file covering `file`, when that file has deleted rows. */
  def dvPathFor(dvs: Map[String, DvRef], file: PartitionedFile): Option[String] = {
    val p = file.filePath.toPath
    dvs.get(p.getParent.toString)
      .filter(_.vector.files.get(p.getName).exists(_.nonEmpty))
      .map(_.path)
  }

  /** Split delegated partitions into one-split-per-partition units so each
    * reader knows exactly which file its rows (and their positions) belong
    * to. Split granularity — and with it scan parallelism — is preserved;
    * only the grouping of splits into tasks changes.
    */
  def resplit(parts: Array[InputPartition],
              dvs: Map[String, DvRef]): Array[InputPartition] =
    parts.flatMap {
      case fp: FilePartition => fp.files.map { f =>
        DvInputPartition(FilePartition(0, Array(f)),
          f.filePath.toString, f.start, dvPathFor(dvs, f))
      }
      case other => throw new IllegalStateException(
        s"delegated parquet scan planned a non-file partition: $other")
    }.zipWithIndex.map { case (p, i) => p.copy(inner = FilePartition(i, p.inner.files)) }

  /** Cheapest column to force-read when the query wants none (count(*)):
    * the narrowest fixed-width atomic field, falling back to the first.
    * A column added by schema evolution may be absent from older files —
    * that is fine: the reader null-fills it from footer row counts without
    * touching pages, and row-index generation still runs (spec-pinned).
    */
  private[connector] def padColumn(dataSchema: StructType): StructField =
    dataSchema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.BooleanType | org.apache.spark.sql.types.DateType => true
      case _: org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }).minByOption(_.dataType.defaultSize).getOrElse(dataSchema.fields.head)

  /** Split delegated partitions into (clean, vectored): files hiding rows
    * behind a vector are pulled out and re-split one-file-per-partition
    * ([[resplit]]); everything else — including any non-file partition a
    * future delegate might plan — passes through untouched for the clean
    * factory. Shared by [[GraftHybridScan]] and the changefeed's base
    * image so the routing logic cannot drift between batch and stream.
    */
  def splitCleanVectored(parts: Array[InputPartition],
                         dvs: Map[String, DvRef]): (Array[InputPartition], Array[InputPartition]) = {
    def vectoredFile(f: PartitionedFile): Boolean = positionsFor(dvs, f).nonEmpty
    val clean = parts.flatMap {
      case fp: FilePartition =>
        val keep = fp.files.filterNot(vectoredFile)
        if (keep.isEmpty) None
        else if (keep.length == fp.files.length) Some(fp)
        else Some(FilePartition(fp.index, keep))
      case other => Some(other)
    }
    val vectored = parts.collect { case fp: FilePartition => fp.files.filter(vectoredFile) }.flatten
    (clean, resplit(Array(FilePartition(0, vectored)), dvs))
  }

  /** Rebuild the delegated scan to also produce the row-index column. An
    * empty read schema (a `count(*)`) is padded with the table's first
    * column first: the parquet readers take the no-columns case down a
    * row-count-only path that never materializes the row-index vector, and
    * a deletion-vector count needs real positions to subtract.
    */
  def withRowIndex(ps: ParquetScan): ParquetScan = {
    require(ps.pushedAggregate.isEmpty,
      "aggregate pushdown must be disabled on scans that apply deletion vectors")
    val base =
      if (ps.readDataSchema.fields.isEmpty) Array(padColumn(ps.dataSchema))
      else ps.readDataSchema.fields
    // the copy MUST NOT share the original's mutable hadoopConf:
    // createReaderFactory bakes the requested read schema into that conf,
    // and in local mode broadcasts hand the same object back by reference —
    // a factory later built from the original scan would silently overwrite
    // this scan's padded schema (and vice versa)
    ps.copy(hadoopConf = new org.apache.hadoop.conf.Configuration(ps.hadoopConf),
      readDataSchema = StructType(base :+ rowIndexField))
  }
}

/** One file split plus a REFERENCE to its file's deletion vector (None =
  * no deleted rows in this file). Shipping the path instead of the
  * positions keeps task serialization O(1) however large the vector —
  * executors read and cache each immutable vector file once
  * ([[DeletionVectorCache]]), Delta's model. `fileStart` keeps partition
  * identity stable/readable in plans.
  */
private[connector] final case class DvInputPartition(inner: FilePartition,
                                                     filePath: String,
                                                     fileStart: Long,
                                                     dvPath: Option[String])
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Dispatching reader factory: [[DvInputPartition]]s read row-based through
  * the row-index-equipped delegated factory, get their deleted positions
  * skipped, and are projected onto the advertised output schema (dropping
  * the temporary row-index column, attaching lineage columns when
  * requested). Any other partition passes through to the untouched
  * delegated factory — clean files keep columnar reads.
  *
  * `outputMap`: for each output field, the source — `>= 0` is an ordinal in
  * the delegated data row, [[DvPartitionReaderFactory.SrcFile]] the file
  * path, [[DvPartitionReaderFactory.SrcPos]] the row position.
  */
private[connector] final class DvPartitionReaderFactory(dvFactory: PartitionReaderFactory,
                                                        cleanFactory: PartitionReaderFactory,
                                                        rowIndexOrdinal: Int,
                                                        outputMap: Array[Int],
                                                        outputTypes: Array[DataType],
                                                        conf: SerializableHadoopConf,
                                                        val cleanPassthrough: Boolean)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case d: DvInputPartition =>
      new DvRowReader(dvFactory.createReader(d.inner), d, rowIndexOrdinal,
        outputMap, outputTypes, conf)
    case other => cleanFactory.createReader(other)
  }

  // DataSourceV2ScanExecBase requires ALL partitions of a scan to agree on
  // columnar vs row-based, so a scan that touches any vectored file reads
  // row-based throughout (clean files via the untouched delegated reader).
  // Compaction purges vectors and restores the columnar path.
  override def supportColumnarReads(p: InputPartition): Boolean = false
}

private[connector] object DvPartitionReaderFactory {
  val SrcFile: Int = -1
  val SrcPos: Int = -2

  /** Output map for a required schema over the delegated data schema.
    * `nameMap` translates logical output names to the delegated schema's
    * physical names (column mapping; empty = identity).
    */
  def outputMapFor(required: StructType, dataSchema: StructType,
                   nameMap: Map[String, String] = Map.empty): (Array[Int], Array[DataType]) = {
    val map = required.fields.map { f =>
      f.name match {
        case GraftDvRead.FileCol => SrcFile
        case GraftDvRead.PosCol => SrcPos
        case n =>
          // throws on an unknown column
          dataSchema.fieldIndex(nameMap.getOrElse(n, n))
      }
    }
    (map, required.fields.map(_.dataType))
  }
}

/** Row-based reader over one file split: skips deleted positions (forward
  * cursor — rows arrive in increasing row-index order within a split) and
  * assembles the output row per `outputMap`.
  */
private[connector] final class DvRowReader(inner: PartitionReader[InternalRow],
                                           part: DvInputPartition,
                                           rowIndexOrdinal: Int,
                                           outputMap: Array[Int],
                                           outputTypes: Array[DataType],
                                           conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val skipper = part.dvPath match {
    case None => new DeletionVector.Skipper(Array.emptyLongArray)
    case Some(dvp) =>
      val fileName = new Path(part.filePath).getName
      DeletionVector.skipper(DeletionVectorCache.get(dvp, conf.value), fileName)
  }
  private val fileName = UTF8String.fromString(part.filePath)
  private val out = new GenericInternalRow(outputMap.length)
  private var current: InternalRow = _
  private var currentPos: Long = -1L

  override def next(): Boolean = {
    while (inner.next()) {
      val row = inner.get()
      val pos = row.getLong(rowIndexOrdinal)
      if (!skipper.deleted(pos)) {
        current = row
        currentPos = pos
        return true
      }
    }
    false
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < outputMap.length) {
      outputMap(i) match {
        case DvPartitionReaderFactory.SrcFile => out.update(i, fileName)
        case DvPartitionReaderFactory.SrcPos => out.update(i, currentPos)
        case ord =>
          out.update(i,
            if (current.isNullAt(ord)) null else current.get(ord, outputTypes(i)))
      }
      i += 1
    }
    out
  }

  override def close(): Unit = inner.close()
}

/** Scan for reads that must be fully row-based: every file goes through the
  * row-index path — either because the query selects the lineage columns
  * (`required` contains them) or because this is a merge-on-read row-level
  * scan (which always reads ids). Deletion vectors of the snapshot are
  * applied; pushed filters stay pushed (positions are row-group-pruning
  * safe).
  */
private[connector] final class GraftDvScan(private val inner: ParquetScan,
                                           private val required: StructType,
                                           private val dvs: Map[String, GraftDvRead.DvRef],
                                           nameMap: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics {

  // the delegated parquet estimate counts vectored-out rows too — a small
  // over-estimate, still far better for join planning than no statistics
  override def estimateStatistics(): Statistics = inner.estimateStatistics()

  private val withIdx = GraftDvRead.withRowIndex(inner)
  private val rowIndexOrdinal = withIdx.readDataSchema.length - 1
  private val (outputMap, outputTypes) =
    DvPartitionReaderFactory.outputMapFor(required, inner.readDataSchema, nameMap)

  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-lake mor scan (${dvs.size} vectored dirs)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    GraftDvRead.resplit(withIdx.toBatch.planInputPartitions(), dvs)

  override def createReaderFactory(): PartitionReaderFactory = {
    val delegated = withIdx.toBatch.createReaderFactory()
    // cleanPassthrough = false: the clean factory CANNOT serve this scan's
    // output (it lacks the lineage projection), so every partition — the
    // changefeed's appends included — must route through the dv reader
    new DvPartitionReaderFactory(delegated, delegated,
      rowIndexOrdinal, outputMap, outputTypes,
      new SerializableHadoopConf(inner.hadoopConf), cleanPassthrough = false)
  }

  // vector IDENTITY (the immutable vector file paths), not just the keyed
  // dirs: two snapshots can share every data dir and differ only in vector
  // contents (`t` vs `t VERSION AS OF n` after a MOR DELETE), and the inner
  // ParquetScan's equality is root-path-based — keySet-only equality would
  // let planner scan/exchange reuse serve one snapshot's rows for both
  // sides of a cross-version join/union
  private def dvIdentity: Map[String, String] =
    dvs.map { case (dir, ref) => dir -> ref.path }
  override def equals(other: Any): Boolean = other match {
    case o: GraftDvScan =>
      inner == o.inner && required == o.required && dvIdentity == o.dvIdentity
    case _ => false
  }
  override def hashCode(): Int =
    (inner.hashCode() * 31 + required.hashCode()) * 31 + dvIdentity.hashCode()
}

/** Scan for plain reads of a snapshot that carries deletion vectors but
  * whose query does NOT select lineage columns: files with no deleted rows
  * keep the untouched delegated path (columnar, original task grouping);
  * only files with deletions re-read through the row-index path with their
  * positions skipped.
  */
private[connector] final class GraftHybridScan(private val inner: ParquetScan,
                                               private val dvs: Map[String, GraftDvRead.DvRef],
                                               readSchemaOverride: Option[StructType] = None)
    extends Scan with Batch with SupportsReportStatistics {

  override def estimateStatistics(): Statistics = inner.estimateStatistics()

  // the override carries LOGICAL names over a physically-named delegated
  // read (column mapping); row data is positional either way
  override def readSchema(): StructType =
    readSchemaOverride.getOrElse(inner.readSchema())
  override def description(): String =
    s"graft-lake dv-hybrid scan (${dvs.size} vectored dirs)"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val (clean, dvParts) =
      GraftDvRead.splitCleanVectored(inner.toBatch.planInputPartitions(), dvs)
    clean ++ dvParts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val n = inner.readDataSchema.length
    val rowIdxScan = GraftDvRead.withRowIndex(inner)
    new DvPartitionReaderFactory(
      rowIdxScan.toBatch.createReaderFactory(),
      inner.toBatch.createReaderFactory(),
      rowIdxScan.readDataSchema.length - 1,
      Array.tabulate(n)(identity),
      inner.readDataSchema.fields.map(_.dataType),
      new SerializableHadoopConf(inner.hadoopConf), cleanPassthrough = true)
  }

  // same cross-version reuse hazard as GraftDvScan: compare vector file
  // paths, not just which dirs carry a vector
  private def dvIdentity: Map[String, String] =
    dvs.map { case (dir, ref) => dir -> ref.path }
  override def equals(other: Any): Boolean = other match {
    case o: GraftHybridScan => inner == o.inner && dvIdentity == o.dvIdentity
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() * 31 + dvIdentity.hashCode()
}
