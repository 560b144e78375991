package graft.connector

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING face over an EXTERNAL Delta table's `_delta_log` — the
  * [[GraftChangeStream]] contract applied to the foreign log:
  *
  * {{{
  * spark.readStream.format("delta-import")
  *   .option("path", "/external/delta/t")
  *   .load()
  * }}}
  *
  * Offsets are Delta VERSIONS. The first batch is the table's current
  * snapshot; every later batch reads exactly the files added between two
  * committed versions, walked PAIRWISE so a file added and retired inside
  * one offset range cannot slip through an endpoint diff. Since Delta data
  * files are immutable and a commit is one atomic log entry, each batch is
  * a consistent exactly-once slice — checkpoint resume re-enters at the
  * committed version.
  *
  * Append-only contract (same trade-off the graft table stream documents):
  * a retired file, a deletion-vector change, or a schema/partitioning
  * change fails the stream LOUDLY — `import_delta` + `refresh_delta(keys
  * => …)` is the face that converges non-append sources. Three shapes are
  * refused at stream construction because a micro-batch partition list
  * cannot express their read plan:
  *
  *  - deletion vectors in the CURRENT snapshot (the subtraction is an
  *    anti-join, not a scan) — and any arriving later fail the increment;
  *  - hive partition columns (re-attaching partitionValues is a join);
  *  - `id`-mode column mapping (needs a session-wide parquet flag this
  *    source must not leak). `name`-mode tables stream fine: the delegated
  *    parquet scan reads PHYSICAL names, the table schema stays logical,
  *    rows are positional.
  */
class DeltaImportProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "delta-import"

  // load() resolves the log twice (inferSchema, then getTable) — memoize
  // the snapshot per path so one load is one log replay
  @transient private var last: (String, DeltaImport.Snapshot) = _

  private def snapFor(options: CaseInsensitiveStringMap): (String, DeltaImport.Snapshot) =
    synchronized {
      val path = Option(options.get("path")).getOrElse(
        throw new IllegalArgumentException(
          """delta-import needs option("path", <delta table dir>) (or load(<path>))"""))
      if (last != null && last._1 == path) return last
      val snap = DeltaImport.snapshot(SparkSession.active, path)
      require(snap.partitionColumns.isEmpty,
        s"delta-import cannot STREAM the hive-partitioned Delta table $path " +
          "(partition values re-attach by join, which a micro-batch cannot " +
          "express) — import_delta materializes it instead")
      require(snap.columnMappingMode != "id",
        s"delta-import cannot STREAM the id-mode column-mapped Delta table " +
          s"$path (needs a session-wide parquet flag) — import_delta reads it")
      require(snap.files.forall(_.dv.isEmpty),
        s"delta-import cannot STREAM $path: its snapshot carries deletion " +
          "vectors (subtracting them is an anti-join, not a scan) — " +
          "import_delta + refresh_delta converge vectored sources")
      last = (path, snap)
      last
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    snapFor(options)._2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val (path, snap) = snapFor(new CaseInsensitiveStringMap(properties))
    new DeltaImportStreamTable(path, snap)
  }
}

private[connector] class DeltaImportStreamTable(tableDir: String,
                                                initial: DeltaImport.Snapshot)
    extends Table with SupportsRead {

  override def name(): String = s"delta-import($tableDir)"
  override def schema(): StructType = initial.schema
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = initial.schema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new DeltaImportMicroBatchStream(tableDir, initial)
      }
    }
}

private[connector] class DeltaImportMicroBatchStream(tableDir: String,
                                                     pinned: DeltaImport.Snapshot)
    extends MicroBatchStream {

  // -1 = nothing emitted yet (Delta version 0 is real table state, unlike
  // the graft manifest's empty version 0)
  override def initialOffset(): Offset = GraftVersionOffset(-1L)

  // the per-trigger probe reads the log LISTING only, never checkpoint
  // content — a short-trigger stream must not replay state to learn
  // "nothing changed"
  override def latestOffset(): Offset =
    GraftVersionOffset(DeltaImport.latestVersion(SparkSession.active, tableDir))

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    GraftVersionOffset(node.get("version").asLong())
  }

  /** The files whose rows batch (start, end] emits: the full snapshot for
    * the base image, else the union of PAIRWISE append-only increments —
    * any non-append change in the range throws (see class doc). Every
    * emitted file must be vector-free: [[DeltaImport.appendOnlyIncrement]]
    * legally admits a brand-new file CARRYING a vector (its live rows are
    * file-minus-vector), but a scan-only batch cannot subtract it.
    */
  private def filesFor(sv: Long, ev: Long): Seq[DeltaImport.AddFile] = {
    val spark = SparkSession.active
    // a metadata change between STREAM CONSTRUCTION and any batch — the
    // base image included — would silently misalign rows against the
    // pinned schema; every batch's endpoint must still match it
    def checkPinned(snap: DeltaImport.Snapshot): Unit =
      require(snap.schema.json == pinned.schema.json &&
          snap.partitionColumns == pinned.partitionColumns &&
          snap.columnMappingMode == pinned.columnMappingMode,
        s"stream over $tableDir: the table's schema/partitioning/mapping " +
          "changed since the stream started — restart to pick it up")
    val emitted =
      if (sv < 0) {
        val snap = DeltaImport.snapshot(spark, tableDir, Some(ev))
        checkPinned(snap)
        snap.files
      } else {
        // one resolution per version (each is a from-checkpoint log replay,
        // so a k-version range costs k replays, not 2k), streamed through
        // an ITERATOR so at most two snapshots' file lists are alive at
        // once — a catch-up spanning hundreds of versions of a
        // million-file table must not hold every version's state on the
        // driver simultaneously
        (sv to ev).iterator
          .map { v =>
            val s = DeltaImport.snapshot(spark, tableDir, Some(v))
            checkPinned(s)
            s
          }
          .sliding(2).flatMap { pair =>
            DeltaImport.appendOnlyIncrement(pair.head, pair.last, tableDir).files
          }.toSeq
      }
    emitted.foreach(f => require(f.dv.isEmpty,
      s"stream over $tableDir hit a deletion vector on ${f.path} — this " +
        "stream reads appends only; use import_delta + refresh_delta"))
    emitted
  }

  private def delegate(paths: Seq[String]): ParquetTable =
    ParquetTable(s"delta-import($tableDir)", SparkSession.active,
      CaseInsensitiveStringMap.empty(), paths,
      Some(DeltaImport.physicalDataSchema(pinned)), classOf[ParquetFileFormat])

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[GraftVersionOffset].version
    val ev = end.asInstanceOf[GraftVersionOffset].version
    if (ev <= sv) return Array.empty
    val files = filesFor(sv, ev)
    if (files.isEmpty) return Array.empty
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val paths = files.map { f =>
      val p = DeltaImport.resolvePath(tableDir, f.path)
      p.getFileSystem(conf).makeQualified(p).toString
    }
    delegate(paths).newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
  }

  /** The factory bakes in the read schema but no file list, so one built
    * over an empty path set reads any batch's partitions.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    delegate(Nil).newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
