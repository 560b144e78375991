package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance procedures of the mini-lakehouse, served through Spark
  * 4.1's `ProcedureCatalog` — Iceberg's `CALL` pattern on the public API:
  *
  * {{{
  *   CALL lake.system.optimize(`table` => 'db.t', zorder_by => 'x,y')
  *   CALL lake.system.vacuum(`table` => 'db.t', keep_versions => 2)
  * }}}
  *
  * Both run driver-side against the table's manifest log (the data work —
  * the compaction rewrite — is a Spark job like any other; only the
  * orchestration is driver code) and return a one-row [[LocalScan]]
  * result. `SHOW PROCEDURES IN lake.system` / `DESCRIBE PROCEDURE` work
  * through the same interface.
  */
private[connector] object GraftProcedures {

  val Namespace = "system"

  def list(): Array[Identifier] =
    Array(Identifier.of(Array(Namespace), "optimize"),
      Identifier.of(Array(Namespace), "vacuum"),
      Identifier.of(Array(Namespace), "restore"),
      Identifier.of(Array(Namespace), "export_delta"),
      Identifier.of(Array(Namespace), "import_delta"),
      Identifier.of(Array(Namespace), "refresh_delta"))

  def load(ident: Identifier, resolve: String => TableLog,
           resolveNew: String => TableLog,
           catalogName: () => String): Option[UnboundProcedure] = {
    if (ident.namespace.toSeq != Seq(Namespace)) return None
    ident.name match {
      case "optimize" => Some(new OptimizeProcedure(resolve))
      case "vacuum" => Some(new VacuumProcedure(resolve))
      case "restore" => Some(new RestoreProcedure(resolve))
      case "export_delta" => Some(new ExportDeltaProcedure(resolve))
      case "import_delta" => Some(new ImportDeltaProcedure(resolveNew))
      case "refresh_delta" => Some(new RefreshDeltaProcedure(resolve, catalogName))
      case _ => None
    }
  }

  private[connector] def oneRowResult(schema: StructType, values: Array[Any]): java.util.Iterator[Scan] = {
    val row = new GenericInternalRow(values)
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }
    java.util.List.of(scan).iterator()
  }

  private[connector] def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private[connector] def in(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Split a comma-separated column list ('' = none). */
  private[connector] def cols(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

/** `CALL lake.system.optimize(...)` — [[Compaction.compact]] as SQL:
  * folds small dirs, purges deletion vectors, optionally lays out by
  * `cluster_by` (sort within partitions) or `zorder_by` (tile-per-dir
  * Morton layout). Returns (compacted, dirs_before, dirs_after).
  */
private[connector] final class OptimizeProcedure(resolve: String => TableLog)
    extends UnboundProcedure {

  override def name(): String = "optimize"
  override def description(): String =
    "compact small data dirs and purge deletion vectors (OPTIMIZE); " +
      "cluster_by/zorder_by choose the rewrite layout"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = OptimizeProcedure.this.name()
    override def description(): String = OptimizeProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("small_bytes", LongType, (128L << 20).toString),
      GraftProcedures.in("target_bytes", LongType, (512L << 20).toString),
      GraftProcedures.in("cluster_by", StringType, "''"),
      GraftProcedures.in("zorder_by", StringType, "''"),
      GraftProcedures.in("purge_deleted_fraction", DoubleType, "0.1"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val log = resolve(input.getUTF8String(0).toString)
      val before = log.currentEntries().size
      val compacted = Compaction.compact(SparkSession.active, log,
        smallBytes = input.getLong(1),
        targetBytes = input.getLong(2),
        clusterBy = GraftProcedures.cols(input.getUTF8String(3).toString),
        purgeDeletedFraction = input.getDouble(5),
        zorderBy = GraftProcedures.cols(input.getUTF8String(4).toString))
      val after = log.currentEntries().size
      GraftProcedures.oneRowResult(
        StructType(Seq(StructField("compacted", BooleanType, nullable = false),
          StructField("dirs_before", IntegerType, nullable = false),
          StructField("dirs_after", IntegerType, nullable = false))),
        Array(compacted, before, after))
    }
  }
}

/** `CALL lake.system.vacuum(...)` — [[TableLog.vacuum]] as SQL: drop all
  * but the newest `keep_versions` manifests and reclaim unreferenced
  * data dirs / vector files past the orphan retention window. Returns
  * (manifests_dropped, paths_reclaimed).
  */
private[connector] final class VacuumProcedure(resolve: String => TableLog)
    extends UnboundProcedure {

  override def name(): String = "vacuum"
  override def description(): String =
    "drop manifests past keep_versions and reclaim unreferenced dirs/vectors " +
      "(run outside the reader SLA window)"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = VacuumProcedure.this.name()
    override def description(): String = VacuumProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("keep_versions", IntegerType, "2"),
      GraftProcedures.in("orphan_retention_ms", LongType, (60L * 60 * 1000).toString))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val log = resolve(input.getUTF8String(0).toString)
      val stats = log.vacuum(keepVersions = input.getInt(1),
        orphanRetentionMs = input.getLong(2))
      GraftProcedures.oneRowResult(
        StructType(Seq(
          StructField("manifests_dropped", IntegerType, nullable = false),
          StructField("paths_reclaimed", IntegerType, nullable = false))),
        Array(stats.manifestsDropped, stats.pathsReclaimed))
    }
  }
}

/** `CALL lake.system.restore(...)` — version rollback as a NEW commit:
  * reinstates version `version`'s manifest entries AND meta header
  * (schema + properties — a restore past a bad ALTER undoes the schema
  * change too) under the normal CAS, stamped `RESTORE (to version N)`.
  * History stays intact (time travel still reads every version), the
  * change feed sees the rollback as an ordinary remove/re-add diff, and
  * vacuum keeps the reinstated dirs and vectors alive because the new
  * head manifest references them. Almost nothing is rewritten — the one
  * exception is a dir that SURVIVES from the head with a DIFFERENT
  * deletion vector (only a merge-on-read history can produce this): the
  * feed's diff invariant says vectors only grow on a surviving dir, so
  * those dirs are re-committed as fresh vector-applied copies and the
  * resurrection surfaces as ordinary remove/add churn netting to the
  * revived rows.
  *
  * Restorable = the target manifest still exists; vacuum reclaims data
  * only when no kept manifest references it, so a surviving manifest
  * implies surviving data. A vacuumed version fails loudly up front.
  * Version 0 (the pre-first-commit empty table) restores to empty under
  * the CREATE-time schema.
  */
private[connector] final class RestoreProcedure(resolve: String => TableLog)
    extends UnboundProcedure {

  override def name(): String = "restore"
  override def description(): String =
    "roll the table back to an earlier version as a new commit (RESTORE); " +
      "history and time travel keep working; only dirs whose deletion " +
      "vector would shrink are rewritten"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = RestoreProcedure.this.name()
    override def description(): String = RestoreProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("version", LongType))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val log = resolve(input.getUTF8String(0).toString)
      val target = input.getLong(1)
      val latest = log.latestVersion.getOrElse(
        throw new IllegalArgumentException(
          s"cannot restore ${log.tableDir}: the table has no committed versions"))
      require(target >= 0 && target <= latest,
        s"restore target $target out of range [0, $latest] for ${log.tableDir}")
      val (entries, meta) =
        if (target == 0L) (Seq.empty[DirEntry], log.baseMetaPublic)
        else
          try (log.entriesAt(target), log.metaAt(target))
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"cannot restore ${log.tableDir} to version $target: its " +
                  "manifest no longer exists (vacuumed past keep_versions?) — " +
                  "only versions still readable by time travel are restorable",
                e)
          }
      // declarative target state -> a lost CAS race just re-reads the head
      // and retries; the bound guards against a filesystem that never wins
      var attempts = 0
      var committed = -1L
      // A dir that SURVIVES from the head into the restored version with a
      // DIFFERENT deletion vector would break the change feed's diff
      // invariant (vectors only grow on a surviving dir — a restore shrinks
      // or removes them, which diff either rejects or silently replays as
      // zero rows). Those dirs are REWRITTEN instead: one combined job
      // applying the TARGET vectors into a fresh dir, so every dir in the
      // restored manifest is either byte-identical to the head's entry,
      // newly added, or freshly written — the feed then sees ordinary
      // remove/add churn whose net effect is exactly the resurrection.
      // (rewrittenFor, rewritten) memoize across CAS retries: recompute
      // only when a concurrent commit changed the conflict set.
      var rewrittenFor: Set[String] = null
      var rewritten: Option[DirEntry] = None
      var committedDirs = 0
      while (committed < 0) {
        attempts += 1
        if (attempts > 100)
          throw new java.io.IOException(
            s"restore of ${log.tableDir} failed after $attempts attempts — " +
              "manifest rename keeps failing (filesystem problem, not contention)")
        val expected = log.latestVersion
        val headByDir = expected.map(log.entriesAt).getOrElse(Nil)
          .map(e => e.dir -> e).toMap
        val (conflicting, passThrough) = entries.partition(e =>
          headByDir.get(e.dir).exists(_.dv != e.dv))
        if (rewrittenFor == null || rewrittenFor != conflicting.map(_.dir).toSet) {
          rewrittenFor = conflicting.map(_.dir).toSet
          rewritten =
            if (conflicting.isEmpty) None
            else DvReads.rewriteApplied(SparkSession.active, log, conflicting,
              meta._1)   // the TARGET version's schema: its physical names
        }
        val next = passThrough ++ rewritten
        if (log.tryCommitEntriesMeta(expected, next, newMeta = Some(meta),
            op = Some(s"RESTORE (to version $target)"))) {
          committed = expected.getOrElse(0L) + 1
          committedDirs = next.size
        }
      }
      GraftProcedures.oneRowResult(
        StructType(Seq(
          StructField("restored_to", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false),
          StructField("dirs", IntegerType, nullable = false))),
        Array(target, committed, committedDirs))
    }
  }
}

/** `CALL lake.system.export_delta(...)` — [[DeltaExport.exportSnapshot]]
  * as SQL: materialize one snapshot (latest, or `version`) as a Delta
  * Lake table at `location`, readable by any engine speaking the open
  * Delta protocol. Returns (files, rows, bytes, location).
  */
private[connector] final class ExportDeltaProcedure(resolve: String => TableLog)
    extends UnboundProcedure {

  override def name(): String = "export_delta"
  override def description(): String =
    "export a snapshot as a Delta Lake table at `location` for external " +
      "engines; `version` defaults to latest. materialize => true " +
      "(default) rewrites plain v1 parquet (vectors applied, logical " +
      "names — every reader); materialize => false BYTE-COPIES the data " +
      "files and exports real deletion vectors / column-mapping metadata " +
      "(O(bytes), needs a DV/mapping-capable reader). Immutable snapshot " +
      "copy either way."

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = ExportDeltaProcedure.this.name()
    override def description(): String = ExportDeltaProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("location", StringType),
      GraftProcedures.in("version", LongType, "-1"),
      GraftProcedures.in("materialize", BooleanType, "true"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val log = resolve(input.getUTF8String(0).toString)
      val dest = input.getUTF8String(1).toString
      val version = input.getLong(2) match {
        case -1L => None
        case v => Some(v)
      }
      val stats = DeltaExport.exportSnapshot(SparkSession.active, log, dest,
        version, materialize = input.getBoolean(3))
      GraftProcedures.oneRowResult(
        StructType(Seq(
          StructField("files", IntegerType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("bytes", LongType, nullable = false),
          StructField("location", StringType, nullable = false))),
        Array(stats.files, stats.rows, stats.bytes, UTF8String.fromString(stats.location)))
    }
  }
}

/** `CALL lake.system.import_delta(...)` — [[DeltaImport.readSnapshot]] as
  * SQL, the inbound half of the interop loop: materialize an EXTERNAL
  * Delta Lake table's current snapshot as a NEW graft table at `table`.
  * The snapshot is copied (one distributed scan + write), not referenced
  * — later Delta commits do not appear (re-import for a newer snapshot).
  * Hive-partitioned Delta layouts materialize their partition columns as
  * ordinary columns (graft's layout is stats-pruned dirs, not value
  * paths). Tables demanding reader features the import does not implement
  * (column mapping, deletion vectors, …) are refused loudly — see
  * [[DeltaImport]]. Returns (files, rows, source_version, table_dir).
  */
private[connector] final class ImportDeltaProcedure(resolveNew: String => TableLog)
    extends UnboundProcedure {

  override def name(): String = "import_delta"
  override def description(): String =
    "copy an external Delta Lake table's snapshot (latest, or `version` — " +
      "Delta time travel) into a NEW graft table; partition columns " +
      "materialize inline; unsupported reader features are refused loudly"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = ImportDeltaProcedure.this.name()
    override def description(): String = ImportDeltaProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("location", StringType),
      GraftProcedures.in("version", LongType, "-1"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val log = resolveNew(input.getUTF8String(0).toString)
      val location = input.getUTF8String(1).toString
      val version = input.getLong(2) match {
        case -1L => None
        case v => Some(v)
      }
      val spark = SparkSession.active
      require(!log.exists,
        s"target table already exists at ${log.tableDir} — import_delta " +
          "creates a NEW table; drop it first or import elsewhere")
      val dir = new org.apache.hadoop.fs.Path(log.tableDir)
      val fs = dir.getFileSystem(log.hadoopConf)
      require(fs.exists(dir.getParent),
        s"namespace of ${log.tableDir} does not exist — create it first " +
          "(a silent mkdirs would invent namespaces, cf. RENAME TO)")
      val snap = DeltaImport.snapshot(spark, location, version)
      // the source coordinates ride as table properties so refresh_delta
      // can later append exactly the source's new files
      log.create(snap.schema, Map(
        "graft.delta.location" -> location,
        "graft.delta.sourceVersion" -> snap.version.toString))
      var rows = 0L
      var files = 0
      // everything after create() is fenced: a failed copy/stats/commit
      // would otherwise strand a created-but-empty table, and the retry
      // then refuses with "already exists" until someone drops it by hand.
      // EXCEPT the lost-CAS case: losing the first commit means a
      // concurrent writer REALLY committed to this table — deleting the
      // dir would destroy their data, and the retry's "already exists"
      // refusal is then the truth, not a stranding
      var lostRace = false
      try {
        if (snap.files.nonEmpty) {
          val staged = s"${log.tableDir}/data/import-" +
            java.util.UUID.randomUUID().toString.replace("-", "").take(12)
          // the ALREADY-resolved snapshot feeds the read: resolving again
          // would let a concurrent Delta commit desynchronize the created
          // schema/reported version from the data actually copied. The copy
          // executes the read eagerly, so an id-mode table's session-conf
          // flag is scoped to it and restored after
          DeltaImport.withFieldIdRead(spark) {
            DeltaImport.readSnapshot(spark, location, snap).write.parquet(staged)
          }
          val stats = DirStats.collect(staged, log.hadoopConf)
          rows = stats.map(_.rows).getOrElse(0L)
          files = fs.listStatus(new org.apache.hadoop.fs.Path(staged))
            .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          if (!log.tryCommitEntries(None, Seq(DirEntry(staged, stats)))) {
            lostRace = true
            throw new IllegalStateException(
              s"first commit of the imported table ${log.tableDir} lost a race " +
                "— a concurrent writer appeared under a table that did not exist")
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (!lostRace) {
            // best-effort drop of the half-imported table so the retry is
            // clean; the original failure is what surfaces
            try fs.delete(dir, true)
            catch { case scala.util.control.NonFatal(_) => () }
            TableLog.invalidateCache(log.tableDir)
          }
          throw e
      }
      GraftProcedures.oneRowResult(
        StructType(Seq(
          StructField("files", IntegerType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("source_version", LongType, nullable = false),
          StructField("table_dir", StringType, nullable = false))),
        Array(files, rows, snap.version, UTF8String.fromString(log.tableDir)))
    }
  }
}

/** `CALL lake.system.refresh_delta(table => 'db.t' [, keys => 'k1,k2'])`
  * — INCREMENTAL re-sync of a table created by `import_delta`: resolve
  * the source's current snapshot (coordinates come from the
  * `graft.delta.*` table properties the import stamped) and converge the
  * mirror in O(changed data), never O(table). Two increment shapes:
  *
  *  - PURE APPEND (no retired files, no deletion-vector changes): copy
  *    exactly the new files' live rows and commit them TOGETHER with the
  *    advanced `graft.delta.sourceVersion` property in one CAS commit — a
  *    crash between copy and commit leaves only an unreferenced staged
  *    dir (vacuum's to reclaim) and the next refresh redoes the same
  *    increment. No `keys` needed.
  *  - CHANGED DATA (deletion vectors grew — the modern Delta DELETE
  *    shape — files were retired by UPDATE/compaction, or a RESTORE
  *    revived rows): needs `keys` naming columns that uniquely identify
  *    a row (the standard CDC contract). The procedure diffs ONLY the
  *    changed files' live rows between the recorded and current source
  *    snapshots — rows live-then-not become `delete` changes, rows
  *    not-then-live become `insert` changes — and applies them through
  *    the CDC MERGE machinery ([[CdcApply.applyBatch]]). A compaction
  *    (same rows, new files) therefore nets to ZERO mirror writes, and a
  *    DV growth deletes exactly the newly-dead rows. Ordering: a
  *    WRITE-AHEAD INTENT commit (`graft.delta.pendingDiff` = the diff's
  *    coordinates, alongside the advanced source version) CLAIMS the
  *    increment before any MERGE runs; the MERGEs follow; a final commit
  *    retires the intent. A crash mid-MERGE leaves the intent behind, and
  *    the next refresh (any shape) RECOVERS it first — re-running the
  *    idempotent diff (deletes of absent rows match nothing, upserts
  *    re-apply equal values) before handling its own increment.
  *
  * Schema / partitioning / column-mapping changes still refuse with
  * "re-import instead" — an incremental copy cannot re-type history.
  * Every commit re-reads the head's metadata and requires the recorded
  * source version UNCHANGED and no foreign intent outstanding, so two
  * concurrent refreshes — keyed, append, or mixed — cannot both apply the
  * same increment (the loser refuses loudly at its own CAS, before or
  * after its work, never with silent duplicates).
  * Returns (files, rows, from_version, to_version).
  */
private[connector] final class RefreshDeltaProcedure(resolve: String => TableLog,
                                                     catalogName: () => String)
    extends UnboundProcedure {

  override def name(): String = "refresh_delta"
  override def description(): String =
    "incrementally re-sync a table created by import_delta: appends copy " +
      "directly; deletes/updates/compaction on the source converge via " +
      "keyed CDC MERGE (pass keys => 'cols that identify a row'); schema " +
      "changes refuse loudly — re-import for those"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = RefreshDeltaProcedure.this.name()
    override def description(): String = RefreshDeltaProcedure.this.description()
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = Array(
      GraftProcedures.in("table", StringType),
      GraftProcedures.in("keys", StringType, "''"))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val tableArg = input.getUTF8String(0).toString
      val keys = GraftProcedures.cols(input.getUTF8String(1).toString)
      val log = resolve(tableArg)
      val spark = SparkSession.active
      val SrcKey = "graft.delta.sourceVersion"
      val PendingKey = "graft.delta.pendingDiff"
      val mirror = s"`${catalogName()}`." +
        tableArg.split('.').map(p => s"`$p`").mkString(".")

      // head metadata read version-addressed, NEVER through the pinned
      // log.properties cache — this procedure commits property changes
      // mid-flight and must observe its own (and concurrent) commits
      def headProps: Map[String, String] =
        log.latestVersion.map(log.metaAt).getOrElse(log.baseMetaPublic)._2

      // CAS a property update (optionally carrying an appended dir): the
      // head's CURRENT metadata is re-read here — not a snapshot from
      // before the potentially long copy/MERGE jobs — and `check` must
      // accept it, so a concurrent refresh that committed in between makes
      // the loser refuse loudly instead of silently duplicating rows
      def casProps(check: Map[String, String] => Unit)
                  (update: Map[String, String] => Map[String, String],
                   entry: Option[DirEntry]): Unit = {
        val latest = log.latestVersion
        val (headSchema, hp) = latest.map(log.metaAt).getOrElse(log.baseMetaPublic)
        check(hp)
        val prior = latest.map(log.entriesAt).getOrElse(Nil)
        require(log.tryCommitEntriesMeta(latest, prior ++ entry.toSeq,
            newMeta = Some((headSchema, update(hp)))),
          s"refresh of ${log.tableDir} lost a commit race — re-run it " +
            "(any staged copy is unreferenced and vacuum reclaims it)")
      }
      def checkUnclaimed(expectSrc: Long)(hp: Map[String, String]): Unit = {
        require(hp.get(SrcKey).contains(expectSrc.toString),
          s"refresh of ${log.tableDir} raced a concurrent refresh (recorded " +
            s"source version is now ${hp.getOrElse(SrcKey, "?")}, expected " +
            s"$expectSrc) — the increment was already applied; re-run to " +
            "pick up anything newer")
        require(!hp.contains(PendingKey),
          s"refresh of ${log.tableDir}: another refresh's keyed diff is in " +
            "flight (or crashed) — re-run to recover it first")
      }

      val props0 = headProps
      val location = props0.getOrElse("graft.delta.location",
        throw new IllegalArgumentException(
          s"${log.tableDir} was not created by import_delta (no " +
            "graft.delta.location property) — nothing to refresh from"))

      // one keyed diff between two SOURCE snapshots, applied to the mirror
      // through the CDC MERGE machinery. Only the CHANGED files' live rows
      // are read (retired / vector-changed files on the old side, their
      // survivors + brand-new files on the new side — a compaction's
      // rewritten rows land on both and cancel in the diff). IDEMPOTENT:
      // deletes of absent rows match nothing, upserts re-apply equal
      // values — crash-replay and recovery converge.
      def applyDiff(o: DeltaImport.Snapshot, n: DeltaImport.Snapshot,
                    ks: Seq[String]): (Int, Long) = {
        require(o.schema.json == n.schema.json &&
            o.partitionColumns == n.partitionColumns &&
            o.columnMappingMode == n.columnMappingMode,
          s"Delta table $location changed its schema/partitioning/mapping " +
            s"between versions ${o.version} and ${n.version} — re-import " +
            "instead of refreshing")
        val newByPath = n.files.map(f => f.path -> f).toMap
        val oldByPath = o.files.map(f => f.path -> f).toMap
        val changedOld = o.files.filter(f =>
          !newByPath.contains(f.path) || newByPath(f.path).dv != f.dv)
        val changedNewPaths = changedOld.map(_.path).toSet
        val changedNew = n.files.filter(f =>
          changedNewPaths(f.path) || !oldByPath.contains(f.path))
        import org.apache.spark.sql.functions.lit
        // the eager localCheckpoint executes the diff scans, so an id-mode
        // source's session-conf flag is scoped here and restored after
        val batch = DeltaImport.withFieldIdRead(spark) {
          val oldLive = DeltaImport.readSnapshot(spark, location,
            o.copy(files = changedOld))
          val newLive = DeltaImport.readSnapshot(spark, location,
            n.copy(files = changedNew))
          oldLive.exceptAll(newLive)
            .withColumn(ChangeFeed.TypeCol, lit("delete"))
            .unionByName(newLive.exceptAll(oldLive)
              .withColumn(ChangeFeed.TypeCol, lit("insert")))
            .withColumn(ChangeFeed.VersionCol, lit(n.version))
            // truncate lineage: the MERGEs re-plan the batch several times,
            // and each re-plan would otherwise re-run the four-scan diff
            .localCheckpoint(true)
        }
        val rows = batch.count()
        CdcApply.applyBatch(batch, mirror, ks, n.schema.fieldNames.toSeq, None)
        (changedNew.size, rows)
      }

      // The keyed diff and its recovery hold a heartbeat LEASE (own file,
      // never the table's commit lock — a MERGE inside the body must still
      // be able to take that one). The lease is what distinguishes a LIVE
      // refresh's write-ahead intent from a crashed one: a live holder
      // renews (so a concurrent refresh refuses at acquire instead of
      // "recovering" a diff that is still being applied and regressing the
      // mirror with stale rows); a dead holder's lease expires past the
      // TTL and the next refresh recovers safely. Residual: a holder whose
      // PROCESS stalls past the TTL mid-MERGE — the envelope every TTL
      // lease in this codebase documents.
      def withRefreshLease[T](body: => T): T = {
        val lock = new LeaseFileCommitLock(log.hadoopConf)
        val leaseDir = s"${log.tableDir}/_refresh_lease"
        // refuse FAST when a live holder exists: in-process, withLock's
        // stripe monitor has no timeout, so without this probe a second
        // caller would park silently for the holder's whole MERGE. The
        // probe is advisory (racy); the lock below is the real exclusion.
        require(!lock.isHeld(leaseDir),
          s"refresh of ${log.tableDir}: another refresh holds the lease " +
            "(a keyed diff is being applied right now) — re-run after it " +
            "finishes")
        lock.withLock(leaseDir)(body)
      }

      // RECOVERY: an interrupted keyed refresh left its write-ahead intent
      // — the version advance committed but its MERGEs may not have
      // finished. Redo the (idempotent) diff up to the CLAIMED version and
      // retire the intent before handling this call's own increment. A
      // diff that can no longer be replayed (the source vacuumed the old
      // version's history) must not wedge the table silently: the refusal
      // names the situation and the ways out.
      props0.get(PendingKey).foreach { intent =>
        withRefreshLease {
          // re-read under the lease: the crashed run's intent may already
          // have been recovered by a racer that held the lease before us
          headProps.get(PendingKey).filter(_ == intent).foreach { _ =>
            val Array(fromS, keysCsv) = intent.split(";", 2)
            // the catch is scoped to SNAPSHOT RESOLUTION — the one step
            // whose failure means the diff can never be replayed (source
            // history vacuumed). A transient failure inside the MERGE
            // replay below propagates as-is: the diff is idempotent, so
            // a plain re-run recovers it — steering an operator to the
            // destructive remedies for a retryable error would lose rows
            val (oSnap, nSnap) =
              try
                (DeltaImport.snapshot(spark, location, Some(fromS.toLong)),
                  DeltaImport.snapshot(spark, location, Some(props0(SrcKey).toLong)))
              catch {
                case scala.util.control.NonFatal(e) =>
                  throw new IllegalStateException(
                    s"refresh of ${log.tableDir}: a crashed keyed refresh left " +
                      s"intent '$intent', and the source versions it names can " +
                      "no longer be resolved (history vacuumed past the " +
                      "recorded version?) — the mirror may be missing part of " +
                      "that diff. Re-import the table (DROP + CALL " +
                      "import_delta), or accept the gap and clear it: ALTER " +
                      "TABLE ... UNSET TBLPROPERTIES " +
                      "('graft.delta.pendingDiff')", e)
              }
            applyDiff(oSnap, nSnap, GraftProcedures.cols(keysCsv))
            casProps(hp => require(hp.get(PendingKey).contains(intent),
                s"refresh recovery of ${log.tableDir} raced another refresh — " +
                  "re-run"))(
              hp => hp - PendingKey, None)
          }
        }
      }

      val recorded = headProps(SrcKey).toLong
      def result(files: Int, rows: Long, to: Long) =
        GraftProcedures.oneRowResult(
          StructType(Seq(
            StructField("files", IntegerType, nullable = false),
            StructField("rows", LongType, nullable = false),
            StructField("from_version", LongType, nullable = false),
            StructField("to_version", LongType, nullable = false))),
          Array(files, rows, recorded, to))

      val newSnap = DeltaImport.snapshot(spark, location)
      if (newSnap.version == recorded) return result(0, 0L, recorded)

      val oldSnap = DeltaImport.snapshot(spark, location, Some(recorded))
      val newByPath = newSnap.files.map(f => f.path -> f).toMap
      val retired = oldSnap.files.filterNot(f => newByPath.contains(f.path))
      val dvChangedOld = oldSnap.files.filter(f =>
        newByPath.get(f.path).exists(_.dv != f.dv))

      if (retired.isEmpty && dvChangedOld.isEmpty) {
        // ---- pure append: copy the new files' live rows, one CAS commit
        val increment = DeltaImport.appendOnlyIncrement(oldSnap, newSnap, location)
        var rows = 0L
        var files = 0
        var entry: Option[DirEntry] = None
        if (increment.files.nonEmpty) {
          val staged = s"${log.tableDir}/data/refresh-" +
            java.util.UUID.randomUUID().toString.replace("-", "").take(12)
          DeltaImport.withFieldIdRead(spark) {
            DeltaImport.readSnapshot(spark, location, increment).write.parquet(staged)
          }
          val stats = DirStats.collect(staged, log.hadoopConf)
          rows = stats.map(_.rows).getOrElse(0L)
          val fs = new org.apache.hadoop.fs.Path(staged).getFileSystem(log.hadoopConf)
          files = fs.listStatus(new org.apache.hadoop.fs.Path(staged))
            .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          entry = Some(DirEntry(staged, stats))
        }
        casProps(checkUnclaimed(recorded))(
          _.updated(SrcKey, newSnap.version.toString), entry)
        result(files, rows, newSnap.version)
      } else {
        // ---- changed data: keyed diff of ONLY the changed files
        require(oldSnap.schema.json == newSnap.schema.json &&
            oldSnap.partitionColumns == newSnap.partitionColumns &&
            oldSnap.columnMappingMode == newSnap.columnMappingMode,
          s"Delta table $location changed its schema/partitioning/mapping " +
            s"between versions ${oldSnap.version} and ${newSnap.version} — " +
            "re-import instead of refreshing")
        require(keys.nonEmpty,
          s"Delta table $location is not append-only between versions " +
            s"$recorded and ${newSnap.version} (${retired.size} file(s) " +
            s"retired, ${dvChangedOld.size} deletion vector(s) changed) — " +
            "pass keys => 'columns that uniquely identify a row' to apply " +
            "the changes incrementally, or re-import")
        // WRITE-AHEAD INTENT, under the refresh lease: claim the increment
        // (advance the version AND record the diff coordinates) BEFORE the
        // MERGEs run — a concurrent refresh of either shape now refuses at
        // its own CAS instead of appending rows this diff already merged;
        // a crash mid-MERGE drops the lease and leaves the intent for the
        // next refresh to recover, while a LIVE holder's heartbeat keeps
        // premature "recovery" out
        val intent = s"$recorded;${keys.mkString(",")}"
        val (files, rows) = withRefreshLease {
          casProps(checkUnclaimed(recorded))(
            _.updated(SrcKey, newSnap.version.toString).updated(PendingKey, intent),
            None)
          val applied = applyDiff(oldSnap, newSnap, keys)
          casProps(hp => require(hp.get(PendingKey).contains(intent),
              s"refresh of ${log.tableDir} raced another refresh mid-diff — " +
                "the state is recovered by the next refresh; re-run"))(
            hp => hp - PendingKey, None)
          applied
        }
        result(files, rows, newSnap.version)
      }
    }
  }
}
