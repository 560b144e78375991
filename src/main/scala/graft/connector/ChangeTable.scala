package graft.connector

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetTable}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Derived metadata tables of a catalog table, addressed Iceberg-style by
  * an extra identifier part: `lake.db.t.changes` and `lake.db.t.history`
  * ([[GraftCatalog.loadTable]] routes the suffix when `db.t` exists and
  * the trailing name does not resolve to a real table — which it never
  * can, because a table dir is not a namespace).
  *
  * `t.changes` is the change-data-feed as a TABLE — the same per-version
  * insert/delete semantics as [[ChangeFeed.between]] (shared
  * [[ChangeFeed.diff]], so the two faces cannot drift), served through
  * DSv2 partitions instead of a driver-built DataFrame, which is what
  * makes it STREAMABLE: `spark.readStream.table("lake.db.t.changes")`
  * tails every commit kind — merge-on-read deletes and copy-on-write
  * rewrites included — as retraction rows, where the plain table's
  * changefeed is append-only by contract and fails on them. Columns are
  * the data schema plus `_change_type`/`_commit_version`/
  * `_commit_timestamp`.
  *
  * Range control, batch: `option("startVersion", s)` (exclusive, default
  * 0) and `option("endVersion", e)` (inclusive, default latest) — or
  * `startTimestamp`/`endTimestamp` (epoch millis or a timestamp literal,
  * resolved through manifest mtimes). A stream starts AFTER the latest
  * version at stream start — future changes only — unless a start option
  * asks for a replay; its offsets are manifest versions,
  * checkpoint-resumable like the plain changefeed.
  *
  * Scale shape: per emitted version the driver plans only the CHANGED
  * dirs' splits (never snapshot-proportional work); deleted positions
  * travel as vector file REFERENCES resolved through the executor-side
  * [[DeletionVectorCache]]; rows are read once, row-based, through the
  * same row-index machinery as merge-on-read scans. Retention: a range
  * reaching past `vacuum` fails loudly (missing manifest or dir), never
  * silently under-reports.
  */
private[connector] class GraftChangesTable(tableName: String, log: TableLog,
                                           projected: Option[StructType] = None)
    extends Table with SupportsRead {

  override def name(): String = tableName

  // `projected` comes from the FORMAT face ([[GraftChangesProvider]]),
  // where a `columns` option is visible at table-construction time and so
  // can narrow the table schema itself — which is what makes a projected
  // STREAM possible (the streaming planner pins the relation to the
  // table's schema; a narrower scan under a full-schema relation would
  // misalign rows)
  private val dataSchema: StructType = projected.getOrElse(log.schema)

  override def schema(): StructType =
    StructType(dataSchema.fields ++ ChangeFeed.changeFields)

  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  // the delegated reads speak PHYSICAL column names (column mapping; the
  // CURRENT schema's mapping applies to every version — physical names
  // never change once written, which is the whole point of the mapping)
  private def delegate(readSchema: StructType, paths: Seq[String]): ParquetTable =
    ParquetTable(tableName, SparkSession.active, CaseInsensitiveStringMap.empty(),
      paths, Some(ColumnMapping.rename(readSchema, ColumnMapping.nameMap(log.schema))),
      classOf[ParquetFileFormat])

  /** `startTimestamp`/`endTimestamp` option values: epoch millis or an
    * ISO / `java.sql.Timestamp` literal, resolved through manifest mtimes.
    * A start timestamp picks the newest version at-or-before it (that
    * version's own changes are NOT included — it is the exclusive start
    * state, mirroring Delta's startingTimestamp edge); an end timestamp
    * includes everything committed at or before it.
    */
  private def tsToMillis(raw: String): Long =
    try raw.toLong catch {
      case _: NumberFormatException =>
        try java.sql.Timestamp.valueOf(raw).getTime catch {
          case _: IllegalArgumentException =>
            try java.time.Instant.parse(raw).toEpochMilli catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"cannot parse timestamp '$raw': use epoch millis, " +
                    "'yyyy-MM-dd HH:mm:ss[.f]', or ISO-8601 instant")
            }
        }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def versionAt(optName: String): Option[Long] =
      Option(options.get(optName)).map { raw =>
        val ms = tsToMillis(raw)
        log.versionAtTimestamp(ms).getOrElse(
          throw new IllegalArgumentException(
            s"$optName $raw predates every version of ${log.tableDir}"))
      }
    require(!(options.containsKey("startVersion") && options.containsKey("startTimestamp")),
      "startVersion and startTimestamp are exclusive")
    require(!(options.containsKey("endVersion") && options.containsKey("endTimestamp")),
      "endVersion and endTimestamp are exclusive")
    val start = Option(options.get("startVersion")).map(_.toLong)
      .orElse(versionAt("startTimestamp"))
    val end = Option(options.get("endVersion")).map(_.toLong)
      .orElse(versionAt("endTimestamp"))
    // validated here (not just at batch planning) so a stream with a
    // nonsense range fails at query start, not with a manifest-read error
    // inside the first batch — including a start PAST the latest version,
    // which a stream would otherwise accept and idle on forever
    // (latestOffset < initialOffset): a typo'd replay must fail as loudly
    // as the batch face does on the same input
    start.foreach(s => require(s >= 0, s"startVersion must be >= 0, got $s"))
    end.foreach(e => require(e >= 0 && start.forall(_ <= e),
      s"need 0 <= startVersion <= endVersion, got ($start, $e]"))
    val latestNow = log.latestVersion.getOrElse(0L)
    start.foreach(s => require(s <= latestNow,
      s"need 0 <= startVersion <= endVersion <= $latestNow (latest), " +
        s"got ($s, ${end.getOrElse(latestNow)}]"))
    // `option("columns", "a,b")`: an explicit read-schema override — the
    // escape hatch for STREAMS, which Spark's streaming planner never
    // column-prunes (a wide-table CDC stream would read every column per
    // batch). The change columns are always appended (they are computed,
    // not read). Batch reads get planner pruning anyway; when both are
    // present the planner's requirement wins (it is what the query needs).
    val requested: Option[StructType] = Option(options.get("columns")).map(raw =>
      StructType(ChangeFeed.parseColumnsOption(raw, dataSchema).fields ++
        ChangeFeed.changeFields))
    val fullOut = schema()
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // column pruning: a CDC consumer selecting 2 of 40 columns must not
      // read 40 — the delegated parquet scans serve only the required
      // data columns, and the change columns are computed, so they cost
      // nothing to keep.
      private var required: StructType = requested.getOrElse(fullOut)
      override def pruneColumns(r: StructType): Unit = required = r
      override def build(): Scan =
        new GraftChangesScan(required, dataSchema, log, delegate, start, end)
    }
  }
}

private[connector] final class GraftChangesScan(outSchema: StructType,
                                                dataSchema: StructType,
                                                log: TableLog,
                                                delegate: (StructType, Seq[String]) => ParquetTable,
                                                startOpt: Option[Long],
                                                endOpt: Option[Long])
    extends Scan with Batch {

  /** The data columns the output actually needs, in output order. */
  private val prunedData = StructType(
    outSchema.fields.filter(f => dataSchema.fieldNames.contains(f.name)))

  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"graft-lake changes(${startOpt.getOrElse(0L)}, ${endOpt.getOrElse("latest")}] " +
      s"ReadSchema: ${prunedData.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val latest = log.latestVersion.getOrElse(0L)
    val start = startOpt.getOrElse(0L)
    val end = endOpt.getOrElse(latest)
    require(0 <= start && start <= end && end <= latest,
      s"need 0 <= startVersion <= endVersion <= $latest (latest), got ($start, $end]")
    ChangeTableRead.planRange(log, delegate, start, end)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeTableRead.readerFactory(log, delegate, prunedData, outSchema)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // a `columns` option narrows the SCAN, but the streaming planner pins
    // the relation to the TABLE's schema — on the catalog face the two
    // would misalign (rows served under the wrong attributes), so a
    // projected catalog-face stream must fail loudly and point at the
    // format face, whose table schema IS the projection
    if (prunedData.fieldNames.toSeq != dataSchema.fieldNames.toSeq)
      throw new UnsupportedOperationException(
        "a projected changes STREAM must use the format face — " +
          """spark.readStream.format("graft-changes").option("path", <tableDir>)""" +
          """.option("columns", ...).load() — Spark's streaming planner pins """ +
          "the catalog table's full schema, so the columns option cannot " +
          "narrow a db.t.changes stream")
    new GraftChangesMicroBatchStream(log, delegate, startOpt, endOpt,
      prunedData, outSchema)
  }
}

/** Micro-batch face of `t.changes`: offsets are manifest versions, each
  * batch is the change rows of `(startOffset, endOffset]` — planned with
  * the exact machinery the batch face uses. Where the plain table's
  * stream begins with a base-image snapshot, a change stream begins
  * EMPTY at the table's current version (future changes only) unless
  * `startVersion` requests a historical replay.
  */
private[connector] final class GraftChangesMicroBatchStream(log: TableLog,
                                                            delegate: (StructType, Seq[String]) => ParquetTable,
                                                            startOpt: Option[Long],
                                                            endOpt: Option[Long],
                                                            prunedData: StructType,
                                                            outSchema: StructType)
    extends MicroBatchStream {

  override def initialOffset(): Offset =
    GraftVersionOffset(startOpt.getOrElse(log.latestVersion.getOrElse(0L)))

  // endVersion bounds the STREAM too: offsets never advance past it, so a
  // bounded replay drains (start, end] and then idles — it must not keep
  // emitting versions committed after the requested bound
  override def latestOffset(): Offset = {
    val latest = log.latestVersion.getOrElse(0L)
    GraftVersionOffset(endOpt.fold(latest)(math.min(latest, _)))
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    GraftVersionOffset(node.get("version").asLong())
  }

  // the schema this stream emits, fixed at stream start: a structured
  // stream cannot widen its output mid-query
  private val streamSchema: StructType = log.schema

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sv = start.asInstanceOf[GraftVersionOffset].version
    val ev = end.asInstanceOf[GraftVersionOffset].version
    if (ev <= sv) return Array.empty
    // an ALTER inside the batch range would make this stream silently emit
    // wrong rows (the reader factory was built against the start-of-stream
    // schema: an added column would be dropped; a hypothetical rename/type
    // change would serve wrongly-typed values) — fail loudly instead,
    // Delta's schema-change contract; a restarted stream picks up the
    // evolved schema and resumes from its checkpoint. Compared as full
    // StructTypes, not field counts: alterTable only appends today, but a
    // count-only guard would let any future rename/type-change support
    // slip through silently.
    val evolved = log.metaAt(ev)._1
    if (evolved != streamSchema)
      throw new UnsupportedOperationException(
        s"schema of ${log.tableDir} evolved mid-stream " +
          s"(${streamSchema.simpleString} -> ${evolved.simpleString}); " +
          "restart the stream to pick up the new schema")
    ChangeTableRead.planRange(log, delegate, sv, ev)
  }

  // the planner never prunes a streaming DSv2 scan, so prunedData is the
  // full data schema unless the user passed option("columns", ...) — the
  // explicit override that keeps a wide-table CDC stream from reading
  // every column per batch
  override def createReaderFactory(): PartitionReaderFactory =
    ChangeTableRead.readerFactory(log, delegate, prunedData, outSchema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Planning + reading machinery shared by the batch and stream faces of
  * `t.changes`.
  */
private[connector] object ChangeTableRead {

  /** Emit modes of a change split. */
  val InsertLive = 0   // rows not hidden by the NEW vector -> 'insert'
  val DeleteLive = 1   // rows not hidden by the OLD vector -> 'delete'
  val DeleteNew = 2    // rows in new-and-not-old -> 'delete'

  /** Change partitions of `(startVersion, endVersion]`, driver-side:
    * added dirs (clean ones keep the delegated task grouping), removed
    * dirs, and vector-growth dirs, each stamped with its commit.
    *
    * Change-type classification per version: a version whose commit op
    * marker says merge-on-read UPDATE stages EXACT delete+reinsert pairs
    * ([[GraftMorOperation]] represents updates as delete-and-insert), so
    * its vector growth / collapsed dirs emit as `update_preimage` and its
    * staged dir as `update_postimage` — Delta's `table_changes` update
    * types, with pairing implied by the shared `_commit_version`. A
    * merge-on-read MERGE gets the same exact pairs via its per-commit
    * row-lineage markers ([[TableLog.cdcAt]]): the staged dir's `#cdcpost`
    * vector splits its rows PER POSITION into `update_postimage`
    * (reinserts) vs plain `insert` (NOT MATCHED rows), and each touched
    * dir's `#cdcpre` vector splits its retractions into `update_preimage`
    * vs plain `delete` (WHEN MATCHED DELETE
    * rows). Copy-on-write rewrites keep plain insert/delete: they
    * re-insert unmatched rows with no row lineage, so labeling would
    * fabricate updates that never happened — the documented net-effect
    * trade. Pre-marker mor MERGE history (no `#cdc` lines) also stays
    * net-effect.
    */
  def planRange(log: TableLog, delegate: (StructType, Seq[String]) => ParquetTable,
                startVersion: Long, endVersion: Long): Array[InputPartition] = {
    val changes = ChangeFeed.diff(log, startVersion, endVersion)
    val out = Array.newBuilder[InputPartition]

    val opCache = scala.collection.mutable.HashMap[Long, Boolean]()
    def isMorUpdate(v: Long): Boolean =
      opCache.getOrElseUpdate(v,
        log.opAt(v).exists(o => o.contains("UPDATE (merge-on-read)") ||
          o.contains("UPDATE (materialized)")))
    // a mor MERGE / any materialized command classifies only when its
    // commit recorded markers
    val cdcCache = scala.collection.mutable.HashMap[Long, Option[TableLog.CdcMarkers]]()
    def markerCdc(v: Long): Option[TableLog.CdcMarkers] =
      cdcCache.getOrElseUpdate(v,
        if (log.opAt(v).exists(o => o.contains("MERGE (merge-on-read)") ||
            o.endsWith("(materialized)"))) log.cdcAt(v)
        else None)
    // a MATERIALIZED commit (copy-on-write-exact): its adds are mostly
    // carryover rewrites and its removes mostly moved rows — only the
    // marker-named dirs/positions are changes
    def matCdc(v: Long): Option[TableLog.CdcMarkers] =
      if (log.opAt(v).exists(_.endsWith("(materialized)"))) markerCdc(v)
      else None
    def addType(v: Long): String =
      if (isMorUpdate(v)) "update_postimage" else "insert"
    def delType(v: Long): String =
      if (isMorUpdate(v)) "update_preimage" else "delete"
    def qualify(dir: String): String =
      new Path(dir).getFileSystem(log.hadoopConf)
        .makeQualified(new Path(dir)).toString
    // the commit's pre/post-image vectors for one dir (qualified-dir key)
    def preDvOf(v: Long, qdir: String): Option[String] =
      markerCdc(v).flatMap(_.preImageDvByDir.collectFirst {
        case (d, dv) if qualify(d) == qdir => dv
      })
    def postDvOf(v: Long, qdir: String): Option[String] =
      markerCdc(v).flatMap(_.postImageDvByDir.collectFirst {
        case (d, dv) if qualify(d) == qdir => dv
      })

    // splits depend on file sizes only, never on the read schema
    def plan(dirs: Seq[String]): Array[InputPartition] =
      delegate(log.schema, dirs).newScanBuilder(CaseInsensitiveStringMap.empty())
        .build().toBatch.planInputPartitions()

    def resplit(parts: Array[InputPartition], emit: Int, changeType: String,
                v: Long, ts: Long,
                oldDvByDir: Map[String, String],
                newDvByDir: Map[String, String],
                preDvByDir: Map[String, String] = Map.empty,
                postDvByDir: Map[String, String] = Map.empty): Seq[InputPartition] =
      parts.flatMap {
        case fp: FilePartition => fp.files.map { f =>
          val dir = f.filePath.toPath.getParent.toString
          ChangeSplitPartition(FilePartition(0, Array(f)), f.filePath.toString,
            oldDvByDir.get(dir), newDvByDir.get(dir), emit, changeType, v, ts,
            preDv = preDvByDir.get(dir), postDv = postDvByDir.get(dir))
        }
        case other => throw new IllegalStateException(
          s"delegated parquet scan planned a non-file partition: $other")
      }.toSeq

    // adds: per version (a FilePartition groups multiple files, which must
    // share one commit stamp); clean dirs keep the delegated grouping, the
    // rare vectored-at-add dir re-splits per file — and so does the staged
    // dir of a marker-carrying mor MERGE, whose rows split per position by
    // the commit's post-image vector into update_postimage vs insert
    changes.added.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (v, list0) =>
      val ts = log.commitTimestamp(v)
      // a materialized commit's adds: only the marker-listed dirs (the
      // staged insert dir) are changes; every other add is a carryover
      // rewrite of a removed dir — same rows, new layout — and emitting it
      // would fabricate inserts (exactly the net-effect churn this mode
      // removes)
      val list = matCdc(v) match {
        case Some(m) =>
          val addSet = m.addDirs.map(qualify).toSet
          list0.filter(t => addSet.contains(qualify(t._1)))
        case None => list0
      }
      val (vectored, clean) = list.partition(_._2.isDefined)
      val (postSplit, cleanPlain) =
        clean.partition(t => postDvOf(v, qualify(t._1)).isDefined)
      if (cleanPlain.nonEmpty)
        out ++= plan(cleanPlain.map(_._1)).map(p =>
          CleanChangePartition(p.asInstanceOf[FilePartition], addType(v), v, ts))
      if (postSplit.nonEmpty) {
        val postMap = postSplit.flatMap(t =>
          postDvOf(v, qualify(t._1)).map(qualify(t._1) -> _)).toMap
        out ++= resplit(plan(postSplit.map(_._1)), InsertLive, "insert", v, ts,
          Map.empty, Map.empty, postDvByDir = postMap)
      }
      if (vectored.nonEmpty) {
        val dvMap = vectored.map(t => qualify(t._1) -> t._2.get).toMap
        out ++= resplit(plan(vectored.map(_._1)), InsertLive, addType(v), v, ts,
          Map.empty, dvMap)
      }
    }
    // removes: then-live rows as deletes (update_preimage when the version
    // is a mor UPDATE — the fully-deleted-dir collapse: every then-live
    // row of the dropped dir was updated; per-row split by the pre vector
    // when it is a marker-carrying mor MERGE)
    changes.removed.groupBy(_._3).toSeq.sortBy(_._1).foreach { case (v, list) =>
      val ts = log.commitTimestamp(v)
      matCdc(v) match {
        case Some(m) =>
          // materialized commit: a removed dir's rows mostly MOVED to its
          // carryover rewrite — the retractions are exactly the positions
          // of the commit's #cdcdel vector. That is the DeleteNew shape
          // (rows in new-and-not-old, old = none: fresh never overlaps the
          // dir's prior vector), with a one-step chain carrying the
          // per-step pre-image split (update_preimage vs plain delete).
          val delMap = m.deleteDvByDir.map { case (d, dv) => qualify(d) -> dv }
          val dirs = list.map(_._1).filter(d => delMap.contains(qualify(d)))
          out ++= plan(dirs).flatMap[InputPartition] {
            case fp: FilePartition => fp.files.map { f =>
              val dir = f.filePath.toPath.getParent.toString
              val fresh = delMap(dir)
              ChangeSplitPartition(FilePartition(0, Array(f)),
                f.filePath.toString, None, Some(fresh), DeleteNew,
                delType(v), v, ts,
                growth = Seq(ChainStep(v, ts, fresh, delType(v),
                  preDv = preDvOf(v, dir))))
            }
            case other => throw new IllegalStateException(
              s"delegated parquet scan planned a non-file partition: $other")
          }
        case None =>
          val dvMap = list.collect { case (d, Some(dv), _) => qualify(d) -> dv }.toMap
          val preMap = list.flatMap(t =>
            preDvOf(v, qualify(t._1)).map(qualify(t._1) -> _)).toMap
          out ++= resplit(plan(list.map(_._1)), DeleteLive, delType(v), v, ts,
            dvMap, Map.empty, preMap)
      }
    }
    // vector growth: new-minus-old positions as deletes. Grouped by DIR,
    // not by version: vectors only grow, so a dir's growth steps chain
    // (old_1 c new_1 = old_2 c new_2 ...) and ONE scan of the dir serves
    // every step — each newly-deleted row is attributed to the FIRST
    // chain vector containing it. A replay whose history holds V deletes
    // over the same dirs therefore reads each dir once, not V times (the
    // CdfScaleProbe regression that motivated this shape).
    val growthByDir = changes.grown.groupBy(_._1)
    if (growthByDir.nonEmpty) {
      val tsOf = changes.grown.map(_._4).distinct
        .map(v => v -> log.commitTimestamp(v)).toMap
      val chainByDir: Map[String, (Option[String], Seq[ChainStep])] =
        growthByDir.map { case (dir, steps0) =>
          val steps = steps0.sortBy(_._4)
          steps.sliding(2).foreach {
            case Seq((_, _, n1, v1), (_, o2, _, v2)) =>
              require(o2.contains(n1),
                s"growth chain of $dir broken between versions $v1 and $v2")
            case _ =>
          }
          qualify(dir) -> (steps.head._2,
            steps.map(s => ChainStep(s._4, tsOf(s._4), s._3, delType(s._4),
              preDv = preDvOf(s._4, qualify(dir)))))
        }
      out ++= plan(growthByDir.keys.toSeq).flatMap[InputPartition] {
        case fp: FilePartition => fp.files.map { f =>
          val dir = f.filePath.toPath.getParent.toString
          val (baseline, chain) = chainByDir(dir)
          ChangeSplitPartition(FilePartition(0, Array(f)), f.filePath.toString,
            baseline, Some(chain.last.dv), DeleteNew, chain.last.changeType,
            chain.last.version, chain.last.tsMillis, chain)
        }.toSeq
        case other => throw new IllegalStateException(
          s"delegated parquet scan planned a non-file partition: $other")
      }
    }
    out.result()
  }

  /** Output-map codes for the computed change columns. */
  val SrcType: Int = -1
  val SrcVersion: Int = -2
  val SrcTimestamp: Int = -3

  /** One factory serves every partition shape of a change read. Built from
    * a delegated parquet scan whose baked file list is irrelevant — readers
    * take their file splits from the partitions — but whose READ SCHEMA
    * matters: only `prunedData` (the data columns `output` needs) is read,
    * with the row-index variant for vector-aware splits and the plain one
    * for clean appends. `output` maps each emitted field to a data ordinal
    * or a computed change column.
    */
  def readerFactory(log: TableLog, delegate: (StructType, Seq[String]) => ParquetTable,
                    prunedData: StructType, output: StructType): PartitionReaderFactory = {
    // a no-data-column output (count(*)) still needs ONE real column in
    // the delegated schema: the no-columns parquet path never materializes
    // the row-index vector, and withRowIndex pads from this schema
    val readData =
      if (prunedData.fields.nonEmpty) prunedData
      else StructType(Seq(GraftDvRead.padColumn(log.schema)))
    val ps = delegate(readData, Nil)
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .build().asInstanceOf[ParquetScan]
    val withIdx = GraftDvRead.withRowIndex(ps)
    val outputMap = output.fields.map(_.name match {
      case ChangeFeed.TypeCol => SrcType
      case ChangeFeed.VersionCol => SrcVersion
      case ChangeFeed.TimestampCol => SrcTimestamp
      case n => prunedData.fieldIndex(n)
    })
    new ChangePartitionReaderFactory(
      withIdx.toBatch.createReaderFactory(),
      ps.toBatch.createReaderFactory(),
      withIdx.readDataSchema.length - 1,
      outputMap,
      output.fields.map(_.dataType),
      new SerializableHadoopConf(log.hadoopConf))
  }
}

/** One step of a dir's vector-growth chain: the commit, its instant, the
  * chain vector, and the change type its rows emit as (`delete`, or
  * `update_preimage` when that commit was a mor UPDATE). `preDv` (mor
  * MERGE commits only) is the commit's pre-image vector for this dir: the
  * step's rows split per position into `update_preimage` (in it) vs the
  * step's base type (not in it — WHEN MATCHED DELETE rows).
  */
private[connector] final case class ChainStep(version: Long, tsMillis: Long,
                                              dv: String, changeType: String,
                                              preDv: Option[String] = None)

/** One file split of a change read that needs vector awareness: emit mode
  * and change type, plus REFERENCES to the file's old/new vectors
  * (resolved executor-side through [[DeletionVectorCache]]) and the
  * commit stamp. `growth` (the [[ChangeTableRead.DeleteNew]] mode only)
  * is the dir's full growth chain in the range, ascending — so one pass
  * over the file attributes every newly-deleted row to its deleting
  * commit (and that commit's change type). `preDv` (the
  * [[ChangeTableRead.DeleteLive]] mode, mor MERGE collapse only) splits
  * the dropped dir's then-live rows per position into `update_preimage`
  * vs the base change type; `postDv` (the [[ChangeTableRead.InsertLive]]
  * mode, mor MERGE staged dir only) splits the added rows into
  * `update_postimage` vs the base `insert`.
  */
private[connector] final case class ChangeSplitPartition(inner: FilePartition,
                                                         filePath: String,
                                                         oldDv: Option[String],
                                                         newDv: Option[String],
                                                         emit: Int,
                                                         changeType: String,
                                                         version: Long,
                                                         tsMillis: Long,
                                                         growth: Seq[ChainStep] = Nil,
                                                         preDv: Option[String] = None,
                                                         postDv: Option[String] = None)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** A clean appended partition (no vectors anywhere near it): delegated
  * task grouping preserved, every row emits with one change type
  * (`insert`, or `update_postimage` for a mor UPDATE's staged dir).
  */
private[connector] final case class CleanChangePartition(inner: FilePartition,
                                                         changeType: String,
                                                         version: Long,
                                                         tsMillis: Long)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[connector] final class ChangePartitionReaderFactory(dvFactory: PartitionReaderFactory,
                                                            cleanFactory: PartitionReaderFactory,
                                                            rowIndexOrdinal: Int,
                                                            outputMap: Array[Int],
                                                            outputTypes: Array[DataType],
                                                            conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case c: ChangeSplitPartition =>
      new ChangeSplitReader(dvFactory.createReader(c.inner), c, rowIndexOrdinal,
        outputMap, outputTypes, conf)
    case c: CleanChangePartition =>
      new CleanChangeReader(cleanFactory.createReader(c.inner), c,
        outputMap, outputTypes)
    case other => throw new IllegalStateException(
      s"change read got an unexpected partition: $other")
  }

  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** Builds the output row per `outputMap` (data ordinal or computed change
  * column).
  */
private[connector] abstract class ChangeRowAppender(outputMap: Array[Int],
                                                    outputTypes: Array[DataType],
                                                    changeType: String,
                                                    version: Long,
                                                    tsMillis: Long) {
  protected val out = new GenericInternalRow(outputMap.length)
  locally { stamp(changeType, version, tsMillis) }

  /** Re-stamp the change columns (growth-chain rows carry per-row commits
    * — and per-commit change types, since a chain can mix plain DELETEs
    * with mor-UPDATE pre-images).
    */
  protected def stamp(changeType: String, version: Long, tsMillis: Long): Unit = {
    val typeValue = UTF8String.fromString(changeType)
    var i = 0
    while (i < outputMap.length) {
      outputMap(i) match {
        case ChangeTableRead.SrcType => out.update(i, typeValue)
        case ChangeTableRead.SrcVersion => out.update(i, version)
        case ChangeTableRead.SrcTimestamp => out.update(i, tsMillis * 1000L) // micros
        case _ => ()
      }
      i += 1
    }
  }

  protected def fill(row: InternalRow): InternalRow = {
    var i = 0
    while (i < outputMap.length) {
      val m = outputMap(i)
      if (m >= 0)
        out.update(i, if (row.isNullAt(m)) null else row.get(m, outputTypes(i)))
      i += 1
    }
    out
  }
}

private[connector] final class CleanChangeReader(inner: PartitionReader[InternalRow],
                                                 part: CleanChangePartition,
                                                 outputMap: Array[Int],
                                                 outputTypes: Array[DataType])
    extends ChangeRowAppender(outputMap, outputTypes, part.changeType,
      part.version, part.tsMillis)
    with PartitionReader[InternalRow] {
  override def next(): Boolean = inner.next()
  override def get(): InternalRow = fill(inner.get())
  override def close(): Unit = inner.close()
}

/** Row-index read of one file with dual forward-cursor vector probes; the
  * emit mode decides which rows become change rows.
  */
private[connector] final class ChangeSplitReader(inner: PartitionReader[InternalRow],
                                                 part: ChangeSplitPartition,
                                                 rowIndexOrdinal: Int,
                                                 outputMap: Array[Int],
                                                 outputTypes: Array[DataType],
                                                 conf: SerializableHadoopConf)
    extends ChangeRowAppender(outputMap, outputTypes, part.changeType,
      part.version, part.tsMillis)
    with PartitionReader[InternalRow] {

  private val fileName = new Path(part.filePath).getName
  private def skipper(dv: Option[String]) = dv match {
    case None => new DeletionVector.Skipper(Array.emptyLongArray)
    case Some(p) =>
      DeletionVector.skipper(DeletionVectorCache.get(p, conf.value), fileName)
  }
  private val oldSk = skipper(part.oldDv)
  private val newSk = skipper(part.newDv)
  // DeleteNew only: one forward cursor per chain vector; a newly-deleted
  // row's commit is the FIRST chain vector containing it (vectors are
  // nested ascending, so first-containing = the version that deleted it).
  // Each step's optional pre-image vector gets its own cursor: probed only
  // for rows the step owns, so its positions still ascend.
  private val chainSks = part.growth.map(s =>
    (s, skipper(Some(s.dv)), s.preDv.map(p => skipper(Some(p)))))
  // DeleteLive only (mor MERGE dir collapse): the commit's pre-image
  // vector splits then-live rows into update_preimage vs the base type
  private val liveSplitSk = part.preDv.map(p => skipper(Some(p)))
  // InsertLive only (mor MERGE staged dir): the commit's post-image
  // vector splits staged rows into update_postimage vs the base insert
  private val postSplitSk = part.postDv.map(p => skipper(Some(p)))
  private var current: InternalRow = _
  private var stampedType: String = part.changeType

  private def restamp(changeType: String, version: Long, tsMillis: Long): Unit =
    if (changeType != stampedType || part.growth.length > 1) {
      stamp(changeType, version, tsMillis)
      stampedType = changeType
    }

  override def next(): Boolean = {
    while (inner.next()) {
      val row = inner.get()
      val pos = row.getLong(rowIndexOrdinal)
      // both cursors advance on every row — && short-circuiting would
      // leave the old cursor behind, which is fine (it re-advances), but
      // evaluating both keeps the probes O(1) amortized
      val inNew = newSk.deleted(pos)
      val inOld = oldSk.deleted(pos)
      val emit = part.emit match {
        case ChangeTableRead.InsertLive => !inNew
        case ChangeTableRead.DeleteLive => !inOld
        case _ => inNew && !inOld
      }
      if (emit) {
        part.emit match {
          case ChangeTableRead.DeleteNew
              if chainSks.length > 1 || chainSks.exists(_._3.isDefined) =>
            val (step, _, preSk) = chainSks.find(_._2.deleted(pos))
              .getOrElse(chainSks.last)
            val ct =
              if (preSk.exists(_.deleted(pos))) "update_preimage"
              else step.changeType
            restamp(ct, step.version, step.tsMillis)
          case ChangeTableRead.DeleteLive if liveSplitSk.isDefined =>
            val ct =
              if (liveSplitSk.exists(_.deleted(pos))) "update_preimage"
              else part.changeType
            restamp(ct, part.version, part.tsMillis)
          case ChangeTableRead.InsertLive if postSplitSk.isDefined =>
            val ct =
              if (postSplitSk.exists(_.deleted(pos))) "update_postimage"
              else part.changeType
            restamp(ct, part.version, part.tsMillis)
          case _ => ()
        }
        current = row
        return true
      }
    }
    false
  }

  override def get(): InternalRow = fill(current)
  override def close(): Unit = inner.close()
}

/** `lake.db.t.files` — the live snapshot's manifest entries as a
  * queryable table (Iceberg's `files` metadata table at dir granularity):
  * one row per data dir with its committed row count, deletion-vector
  * state, and per-column min/max ranges as strings — the exact
  * information dir-granular pruning plans with, exposed for layout
  * debugging ("why didn't this predicate prune?"). Driver-computed
  * ([[LocalScan]]): manifest-sized by construction.
  */
private[connector] class GraftFilesTable(tableName: String, log: TableLog)
    extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("dir", org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("rows", LongType, nullable = true),
    org.apache.spark.sql.types.StructField("deleted_rows", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("deletion_vector", org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("column_stats",
      org.apache.spark.sql.types.ArrayType(StructType(Seq(
        org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("min", org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("max", org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("nulls", LongType, nullable = false))),
        containsNull = false), nullable = true)))

  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val schema0 = schema()
    () => new LocalScan {
      override def readSchema(): StructType = schema0
      override def description(): String = s"graft-lake files of $tableName"
      override def rows(): Array[InternalRow] =
        log.currentEntries().map { e =>
          val r = new GenericInternalRow(5)
          r.update(0, UTF8String.fromString(e.dir))
          r.update(1, e.stats.map(s => Long.box(s.rows)).orNull)
          r.update(2, log.deletedRows(e))
          r.update(3, e.dv.map(UTF8String.fromString).orNull)
          r.update(4, e.stats.map { s =>
            new org.apache.spark.sql.catalyst.util.GenericArrayData(
              s.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
                val cr = new GenericInternalRow(4)
                cr.update(0, UTF8String.fromString(c))
                cr.update(1, Option(cs.min).map(v => UTF8String.fromString(v.toString)).orNull)
                cr.update(2, Option(cs.max).map(v => UTF8String.fromString(v.toString)).orNull)
                cr.update(3, cs.nulls)
                cr
              }.toArray[Any])
          }.orNull)
          r
        }.toArray
    }
  }
}

/** `lake.db.t.history` — `DESCRIBE HISTORY` as a queryable table:
  * (version, committed_at, operation, dirs, physical_rows, live_rows),
  * newest first, spanning the versions vacuum has kept. `operation` is
  * the commit's `#op` marker — WRITE / OVERWRITE / DELETE / UPDATE /
  * MERGE (suffixed `(merge-on-read)` for vector commits) / OPTIMIZE /
  * ALTER TABLE; NULL on pre-marker history. Driver-computed
  * ([[LocalScan]]): the manifest walk is metadata-sized by construction.
  */
private[connector] class GraftHistoryTable(tableName: String, log: TableLog)
    extends Table with SupportsRead {

  override def name(): String = tableName

  override def schema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("version", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("committed_at", TimestampType, nullable = false),
    org.apache.spark.sql.types.StructField("operation", org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("dirs", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("physical_rows", LongType, nullable = true),
    org.apache.spark.sql.types.StructField("live_rows", LongType, nullable = true)))

  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] = util.Collections.emptyMap()

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val schema0 = schema()
    () => new LocalScan {
      override def readSchema(): StructType = schema0
      override def description(): String = s"graft-lake history of $tableName"
      override def rows(): Array[InternalRow] =
        log.history().map { v =>
          val r = new GenericInternalRow(6)
          r.update(0, v.version)
          r.update(1, v.timestampMs * 1000L)
          r.update(2, v.operation.map(UTF8String.fromString).orNull)
          r.update(3, v.dirs)
          r.update(4, v.physicalRows.map(Long.box).orNull)
          r.update(5, v.liveRows.map(Long.box).orNull)
          r
        }.toArray
    }
  }
}
