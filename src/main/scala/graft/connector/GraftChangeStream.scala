package graft.connector

import java.util.OptionalLong

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming face of a catalog table — `spark.readStream.table("lake.db.t")`
  * tails the manifest log as a changefeed: the stream's offset IS the
  * manifest version, the first batch is the table's current snapshot
  * (initial offset 0 = the empty table), and every later batch reads
  * exactly the data dirs ADDED between two committed versions. Since dirs
  * are immutable and a commit is one atomic manifest rename, each batch is
  * a consistent, exactly-once slice of appended rows — the same mechanism
  * Delta's streaming source uses, minus the jar.
  *
  * Append-only contract: a version range in which a dir DISAPPEARED (a
  * MERGE/UPDATE/DELETE rewrite, INSERT OVERWRITE, or compaction) fails the
  * stream loudly instead of re-emitting rewritten rows as if they were new
  * appends — the documented trade-off Delta resolves with ignoreChanges.
  * Vacuumed-away manifests likewise fail a stream resuming from before the
  * retention window. Streams therefore pair with append-mostly tables
  * (ingest logs); the state-table changefeed use case belongs to the
  * upsert sinks' own streams.
  */
final case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[connector] class GraftMicroBatchStream(log: TableLog,
                                               delegate: Seq[String] => ParquetTable,
                                               factoryScan: Scan)
    extends MicroBatchStream {

  override def initialOffset(): Offset = GraftVersionOffset(0L)

  override def latestOffset(): Offset =
    GraftVersionOffset(log.latestVersion.getOrElse(0L))

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    GraftVersionOffset(node.get("version").asLong())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[GraftVersionOffset].version
    val ev = end.asInstanceOf[GraftVersionOffset].version
    if (ev <= sv) return Array.empty
    // The FIRST batch (sv = 0: nothing emitted yet) is the base image, not
    // an append: it reads version ev's LIVE rows — history before the
    // stream started is irrelevant (a table whose past holds rewrites or
    // deletes streams fine from scratch), and committed deletion vectors
    // are applied, which needs the dv-aware reader factory the table's
    // scan provides whenever its snapshot carries vectors.
    if (sv == 0L) return planSnapshot(ev)
    // Past the base image the append-only contract must hold at EVERY
    // commit in the range, not just between its endpoints: a dir added at
    // sv+1 and rewritten before ev would be invisible to an endpoint diff,
    // silently emitting the rewritten rows as appends (or dropping the
    // deleted ones). Offset ranges routinely span several commits —
    // latestOffset jumps to the newest version and checkpointed streams
    // resume across many — so walk the versions pairwise; a vacuumed-away
    // intermediate manifest fails loudly in entriesAt, which is the
    // documented retention contract. A deletion-vector change on a
    // surviving dir is a non-append change too (rows already emitted were
    // deleted), and fails the same way.
    def dvMap(v: Long): Map[String, Option[String]] =
      log.entriesAt(v).map(e => e.dir -> e.dv).toMap
    val startState: Map[String, Option[String]] = dvMap(sv)
    var prev = startState
    (sv + 1 to ev).foreach { v =>
      val cur = dvMap(v)
      val removed = prev.keySet -- cur.keySet
      if (removed.nonEmpty)
        throw new UnsupportedOperationException(
          s"stream over ${log.tableDir} hit a non-append change at version " +
            s"$v (rewrite/overwrite/compaction removed ${removed.size} " +
            "dirs); this changefeed streams appends only")
      val dvChanged = prev.filter { case (d, dv) => cur.get(d).exists(_ != dv) }
      if (dvChanged.nonEmpty)
        throw new UnsupportedOperationException(
          s"stream over ${log.tableDir} hit a merge-on-read DELETE at " +
            s"version $v (deletion vectors changed on ${dvChanged.size} " +
            "dirs); this changefeed streams appends only")
      prev = cur
    }
    // no removals anywhere in the range => dirs grow monotonically and the
    // endpoint diff is exactly the union of the per-version appends. An
    // appended dir carrying a vector at the endpoint would have to have
    // acquired it mid-range undetected — refuse defensively.
    val endEntries = log.entriesAt(ev)
    val addedVectored = endEntries.filter(e => !startState.contains(e.dir) && e.dv.isDefined)
    if (addedVectored.nonEmpty)
      throw new UnsupportedOperationException(
        s"stream over ${log.tableDir}: appended dirs carry deletion vectors " +
          s"(${addedVectored.map(_.dir).mkString(", ")}); this changefeed " +
          "streams appends only")
    val added = endEntries.map(_.dir).filterNot(startState.keySet)
    if (added.isEmpty) Array.empty
    else routeForFactory(delegate(added)
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions(), Map.empty)
  }

  /** A stream whose scan serves lineage columns has NO clean passthrough —
    * its factory's plain route lacks the output projection — so every
    * batch's partitions (appends included, vector-free or not) must travel
    * as [[DvInputPartition]]s through the dv reader.
    */
  private def routeForFactory(parts: Array[InputPartition],
                              dvs: Map[String, GraftDvRead.DvRef]): Array[InputPartition] =
    factoryScan.toBatch.createReaderFactory() match {
      case f: DvPartitionReaderFactory if !f.cleanPassthrough =>
        GraftDvRead.resplit(parts, dvs)
      case _ => parts
    }

  /** Partitions of the base-image batch: version `ev`'s dirs, with files
    * hiding rows behind deletion vectors re-routed through
    * [[DvInputPartition]]s (read row-based with positions skipped — the
    * stream's shared reader factory dispatches per partition type).
    */
  private def planSnapshot(ev: Long): Array[InputPartition] = {
    val entries = log.entriesAt(ev)
    if (entries.isEmpty) return Array.empty
    val base = delegate(entries.map(_.dir))
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().toBatch.planInputPartitions()
    val dvs = GraftDvRead.dvByDir(entries, log.hadoopConf)
    factoryScan.toBatch.createReaderFactory() match {
      case f: DvPartitionReaderFactory if !f.cleanPassthrough =>
        // lineage-column stream: everything dv-routed (projection lives
        // only on that side)
        GraftDvRead.resplit(base, dvs)
      case _: DvPartitionReaderFactory =>
        // hybrid factory: clean files keep the plain route, vectored files
        // re-split through the dv reader — the same shared splitter the
        // batch scan uses
        val (clean, dvParts) = GraftDvRead.splitCleanVectored(base, dvs)
        clean ++ dvParts
      case _ if dvs.nonEmpty =>
        // a vector landed between query analysis and the first batch — the
        // one shape the analysis-time factory cannot read; fail loudly
        // instead of resurrecting rows
        throw new UnsupportedOperationException(
          s"stream over ${log.tableDir}: deletion vectors appeared between " +
            "query start and the first batch; restart the stream")
      case _ => base
    }
  }

  /** The reader factory of the planner-built scan: it bakes in the read
    * schema and pushed data filters but no file list, so it reads any
    * batch's partitions.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    factoryScan.toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The built Scan of a catalog read: batch behavior delegates verbatim to
  * the native [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]]
  * (partitions, reader factory, statistics, equality for scan reuse), plus
  * the micro-batch face above.
  */
private[connector] class GraftStreamableScan(private val inner: Scan,
                                             log: TableLog,
                                             delegate: Seq[String] => ParquetTable,
                                             streamable: Boolean = true,
                                             readSchemaOverride: Option[StructType] = None)
    extends Scan with Batch with SupportsReportStatistics {

  // the override carries LOGICAL names over a physically-named delegated
  // read (column mapping); row data is positional either way
  override def readSchema(): StructType =
    readSchemaOverride.getOrElse(inner.readSchema())
  override def description(): String = inner.description()

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    inner.toBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    if (!streamable)
      throw new UnsupportedOperationException(
        s"cannot stream ${log.tableDir} pinned at VERSION/TIMESTAMP AS OF: " +
          "the changefeed tails the live manifest and would emit versions past the pin")
    new GraftMicroBatchStream(log, delegate, inner)
  }

  // forward equality so identical scans still dedup/reuse in the planner
  override def equals(other: Any): Boolean = other match {
    case o: GraftStreamableScan => inner == o.inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode()
}

