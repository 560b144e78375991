package graft.connector

import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read `DELETE` for the mini-lakehouse (enabled per table with
  * `TBLPROPERTIES ('graft.delete.mode'='merge-on-read')`): instead of the
  * copy-on-write dir rewrite, the command's matched rows are identified by
  * the lineage columns (`__graft_file`, `__graft_pos` — this operation's
  * [[SupportsDelta.rowId]]), executors collect the matched positions, and
  * the commit writes a few-KB [[DeletionVector]] file per touched dir and
  * swaps the manifest reference — Delta's deletion vectors / Iceberg's
  * position deletes, on Spark's public delta-based row-level API
  * (`SupportsDelta` → `WriteDelta`). A DELETE of ten rows in a multi-GB
  * dir reads one row group (pushed filters stay pushed on the mor scan)
  * and writes kilobytes.
  *
  * Snapshot + concurrency contract (same optimistic rules as the
  * copy-on-write path): the scan pins the table handle's snapshot; at
  * commit every touched dir must still be listed with the SAME vector the
  * scan read (the new vector is the union of old + newly deleted — built
  * against that old vector). A concurrent append or a delete on OTHER
  * dirs retries and converges; a concurrent rewrite/delete of a touched
  * dir conflicts loudly. A dir whose union reaches its committed physical
  * row count is dropped from the manifest outright (the fully-deleted-dir
  * collapse; stats-less dirs can't prove it and just keep their vector).
  */
private[connector] class GraftMorDeleteOperation(log: TableLog,
                                                 delegate: Seq[String] => ParquetTable,
                                                 pinned: Seq[DirEntry])
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = RowLevelOperation.Command.DELETE

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(GraftDvRead.FileCol), Expressions.column(GraftDvRead.PosCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val dvs = GraftDvRead.dvByDir(pinned, log.hadoopConf)
    val readTable = new ParquetTable(log.tableDir, SparkSession.active,
      CaseInsensitiveStringMap.empty(), pinned.map(_.dir), Some(log.schema),
      classOf[ParquetFileFormat]) {
      override lazy val fileIndex: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =
        new GraftFileIndex(sparkSession, pinned, log.schema)
    }
    val inner = readTable.newScanBuilder(options).asInstanceOf[ParquetScanBuilder]
    new org.apache.spark.sql.GraftDelegatingScanBuilder(inner,
      (scan, requiredFull) => {
        val ps = scan.asInstanceOf[ParquetScan]
        val required = requiredFull.getOrElse(throw new IllegalStateException(
          "merge-on-read delete scan was built without column pruning; " +
            "cannot locate the row-id columns"))
        new GraftDvScan(ps, required, dvs)
      },
      metadataColNames = GraftDvRead.MetaColNames,
      refuseAggregates = true)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def description(): String = s"graft-lake mor delete -> ${log.tableDir}"
        override def toBatch: DeltaBatchWrite = new GraftDvBatchWrite(log, pinned)
      }
    }
}

/** Positions deleted by one task, keyed by qualified file path. */
private[connector] final case class DvDeltaMessage(deletes: Map[String, Array[Long]])
    extends WriterCommitMessage

private[connector] class GraftDvBatchWrite(log: TableLog, pinned: Seq[DirEntry])
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
        new DvDeltaWriter
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // merge task outputs: per file, each task's positions are sorted
    // (split-local row order) and tasks cover disjoint splits
    val byFile = scala.collection.mutable.HashMap[String, Array[Long]]()
    messages.foreach {
      case DvDeltaMessage(deletes) => deletes.foreach { case (f, pos) =>
        byFile(f) = byFile.get(f).map(DeletionVector.mergeSorted(_, pos)).getOrElse(pos)
      }
      case other => throw new IllegalStateException(s"unexpected commit message: $other")
    }
    if (byFile.isEmpty) return   // DELETE matched nothing: no new version

    val fs = new Path(log.tableDir).getFileSystem(log.hadoopConf)
    def qualify(dir: String): String = fs.makeQualified(new Path(dir)).toString
    val pinnedByQualified: Map[String, DirEntry] =
      pinned.map(e => qualify(e.dir) -> e).toMap

    // group the new deletes per pinned dir and build each dir's replacement
    // entry ONCE (the union is computed against the PINNED vector; the
    // commit loop below verifies that vector is still current)
    val newByDir: Map[String, DeletionVector] = byFile.toSeq
      .groupBy { case (f, _) => new Path(f).getParent.toString }
      .map { case (dir, files) =>
        dir -> DeletionVector(files.map { case (f, pos) =>
          new Path(f).getName -> pos
        }.toMap)
      }
    val replacements: Map[String, Option[DirEntry]] = newByDir.map { case (qdir, fresh) =>
      val entry = pinnedByQualified.getOrElse(qdir, throw new IllegalStateException(
        s"mor delete scanned $qdir which is not in the pinned snapshot of ${log.tableDir}"))
      val merged = entry.dv
        .map(p => DeletionVector.read(p, log.hadoopConf).union(fresh))
        .getOrElse(fresh)
      val fullyDeleted = entry.stats.exists(s => s.rows == merged.cardinality)
      val replacement =
        if (fullyDeleted) None
        else {
          val dvPath = log.newDvFile()
          DeletionVector.write(dvPath, log.hadoopConf, merged)
          Some(entry.copy(dv = Some(dvPath)))
        }
      entry.dir -> replacement
    }

    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(
          s"mor delete commit to ${log.tableDir} failed after $attempts attempts — " +
            "manifest rename keeps failing (filesystem problem, not contention)")
      val expected = log.latestVersion
      val current = expected.map(log.entriesAt).getOrElse(Nil)
      val next = current.flatMap { e =>
        replacements.get(e.dir) match {
          case Some(repl) =>
            // our union was built against the pinned vector: anyone who
            // changed it (or rewrote the dir) since would be silently undone
            val pinnedDv = pinnedByQualified(qualify(e.dir)).dv
            if (e.dv != pinnedDv)
              throw new ConcurrentModificationException(
                s"concurrent delete/rewrite on ${e.dir} of ${log.tableDir}: " +
                  s"deletion vector changed from $pinnedDv to ${e.dv}")
            repl
          case None => Some(e)
        }
      }
      val missing = replacements.keys.filterNot(d => current.exists(_.dir == d))
      if (missing.nonEmpty)
        throw new ConcurrentModificationException(
          s"concurrent rewrite of ${log.tableDir}: deleted-from dirs replaced: " +
            missing.mkString(", "))
      done = log.tryCommitEntries(expected, next)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Executor-side delta writer: DELETE-only (this operation never rewrites
  * rows, so update/insert arriving here is a planner contract violation and
  * fails loudly). Collects (file, position) pairs; positions arrive in
  * increasing order per file within a task.
  */
private[connector] class DvDeltaWriter extends DeltaWriter[InternalRow] {

  private val acc = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofLong]()

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    acc.getOrElseUpdate(file, new scala.collection.mutable.ArrayBuilder.ofLong) += pos
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException("mor delete writer received an UPDATE row")

  override def insert(row: InternalRow): Unit =
    throw new IllegalStateException("mor delete writer received an INSERT row")

  override def commit(): WriterCommitMessage =
    DvDeltaMessage(acc.map { case (f, b) => f -> b.result() }.toMap)

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
