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

/** Merge-on-read row-level operations for the mini-lakehouse (enabled per
  * command with `TBLPROPERTIES ('graft.<delete|update|merge>.mode' =
  * 'merge-on-read')`): instead of the copy-on-write dir rewrite, matched
  * rows are identified by the lineage columns (`__graft_file`,
  * `__graft_pos` — this operation's [[SupportsDelta.rowId]]), executors
  * collect the matched positions (plus, for UPDATE/MERGE, the replacement
  * rows into one staged dir), and the commit writes a few-KB
  * [[DeletionVector]] file per touched dir, appends the staged dir, and
  * swaps the manifest — Delta's deletion vectors / Iceberg's position
  * deltas, on Spark's public delta-based row-level API (`SupportsDelta` →
  * `WriteDelta`). UPDATEs are represented as delete + reinsert pairs
  * ([[SupportsDelta.representUpdateAsDeleteAndInsert]]), so one writer
  * shape serves all three commands; a DELETE's staged dir stays empty and
  * is never committed.
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
private[connector] class GraftMorOperation(log: TableLog,
                                           delegate: Seq[String] => ParquetTable,
                                           pinned: Seq[DirEntry],
                                           cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def representUpdateAsDeleteAndInsert(): Boolean = true

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
          "merge-on-read scan was built without column pruning; " +
            "cannot locate the row-id columns"))
        new GraftDvScan(ps, required, dvs)
      },
      metadataColNames = GraftDvRead.MetaColNames,
      refuseAggregates = true)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        // the staged dir for reinserted/inserted rows; a pure DELETE has an
        // EMPTY write schema (no data rows flow), which the parquet write
        // builder rejects — so the insert side only exists when rows can
        private val staging =
          if (info.schema().isEmpty) None else Some(log.newDataDir())
        private val inner =
          staging.map(s => delegate(Seq(s)).newWriteBuilder(info).build())
        override def description(): String = s"graft-lake mor $cmd -> ${log.tableDir}"
        override def toBatch: DeltaBatchWrite =
          new GraftDvBatchWrite(log, pinned, inner.map(_.toBatch), staging, cmd)
      }
    }
}

/** Per-task outcome of a merge-on-read write: deleted positions keyed by
  * qualified file path, plus the wrapped parquet writer's own commit
  * message for any inserted rows.
  */
private[connector] final case class DvDeltaMessage(deletes: Map[String, Array[Long]],
                                                   inserts: WriterCommitMessage)
    extends WriterCommitMessage

private[connector] class GraftDvBatchWrite(log: TableLog, pinned: Seq[DirEntry],
                                           innerInserts: Option[BatchWrite],
                                           staging: Option[String],
                                           cmd: RowLevelOperation.Command)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val innerFactory = innerInserts.map(_.createBatchWriterFactory(info))
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
        new DvDeltaWriter(innerFactory.map(_.createWriter(partitionId, taskId)))
    }
  }

  override def useCommitCoordinator(): Boolean =
    innerInserts.forall(_.useCommitCoordinator())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dvMessages = messages.map {
      case m: DvDeltaMessage => m
      case other => throw new IllegalStateException(s"unexpected commit message: $other")
    }
    // finalize any reinserted rows in the staged dir first — files only
    // become visible through the manifest commit below
    innerInserts.foreach(_.commit(dvMessages.map(_.inserts)))
    val stagingEntry = staging.map(s =>
      DirEntry(s, DirStats.collect(s, log.hadoopConf)))
    val stagedRows = stagingEntry.exists(e => !e.stats.exists(_.rows == 0))

    // merge task outputs; positions are NOT assumed ordered — a shuffled
    // plan (sort-merge-join MERGE, IN-subquery DELETE) delivers matched
    // rows in join-key order, so each file's concatenated positions are
    // sorted+deduped here (tasks cover disjoint splits, so true duplicates
    // cannot occur; dedup is cheap insurance)
    val byFile = scala.collection.mutable.HashMap[String, Array[Long]]()
    dvMessages.foreach(_.deletes.foreach { case (f, pos) =>
      byFile(f) = byFile.get(f).map(_ ++ pos).getOrElse(pos)
    })
    byFile.keys.toSeq.foreach(f => byFile(f) = DeletionVector.normalize(byFile(f)))
    if (byFile.isEmpty && !stagedRows) return   // matched nothing: no new version

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
        s"mor write scanned $qdir which is not in the pinned snapshot of ${log.tableDir}"))
      val merged = entry.dv
        .map(p => DeletionVectorCache.get(p, log.hadoopConf).union(fresh))
        .getOrElse(fresh)
      val fullyDeleted = entry.stats.exists(s => s.rows == merged.cardinality)
      val replacement =
        if (fullyDeleted) None
        else {
          val dvPath = log.newDvFile()
          DeletionVector.write(dvPath, log.hadoopConf, merged)
          // cache the cardinality in the manifest line: the count is free
          // here, and it spares every later metadata query (files table,
          // history, vacuum sizing) a driver-side vector read
          Some(entry.copy(dv = Some(dvPath), dvRows = Some(merged.cardinality)))
        }
      entry.dir -> replacement
    }

    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(
          s"mor commit to ${log.tableDir} failed after $attempts attempts — " +
            "manifest rename keeps failing (filesystem problem, not contention)")
      val expected = log.latestVersion
      val current = expected.map(log.entriesAt).getOrElse(Nil)
      val kept = current.flatMap { e =>
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
      val next = if (stagedRows) kept :+ stagingEntry.get else kept
      // the op marker names the command AND the mode: the change-data-feed
      // keys on the exact "UPDATE (merge-on-read)" string to classify this
      // version's rows as update_preimage/update_postimage pairs — a COW
      // UPDATE stamps plain "UPDATE" and must NOT match (its rewrite
      // re-inserts unmatched rows, so the pairing would be fabricated)
      done = log.tryCommitEntriesMeta(expected, next, newMeta = None,
        op = Some(s"$cmd (merge-on-read)"))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    innerInserts.foreach(_.abort(messages.collect { case m: DvDeltaMessage => m.inserts }))
    staging.foreach { s =>
      try {
        val p = new Path(s)
        p.getFileSystem(log.hadoopConf).delete(p, true)
      } catch { case scala.util.control.NonFatal(_) => }
    }
  }
}

/** Executor-side delta writer: DELETE rows contribute (file, position)
  * pairs; INSERT/reinsert rows flow into the wrapped parquet writer for
  * the staged dir. A true in-place UPDATE never arrives
  * (representUpdateAsDeleteAndInsert splits it) and fails loudly.
  * Positions are collected in ARRIVAL order — shuffled plans deliver them
  * keyed by join key, and the driver merge normalizes.
  */
private[connector] class DvDeltaWriter(inserts: Option[DataWriter[InternalRow]])
    extends DeltaWriter[InternalRow] {

  private val acc = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofLong]()

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    acc.getOrElseUpdate(file, new scala.collection.mutable.ArrayBuilder.ofLong) += pos
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException(
      "mor writer received an in-place UPDATE row; updates are represented as delete+insert")

  override def insert(row: InternalRow): Unit =
    inserts.getOrElse(throw new IllegalStateException(
      "mor writer received an INSERT row on a deletes-only (empty-schema) write")).write(row)

  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage =
    DvDeltaMessage(acc.map { case (f, b) => f -> b.result() }.toMap,
      inserts.map(_.commit()).orNull)

  override def abort(): Unit = inserts.foreach(_.abort())
  override def close(): Unit = inserts.foreach(_.close())
}
