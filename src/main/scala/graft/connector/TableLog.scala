package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}

import scala.collection.immutable.ListMap

/** Versioned manifest log for one [[GraftTable]] — the transaction layer of
  * the mini-lakehouse catalog. The table's state is a list of immutable data
  * directories (each a finished parquet write); version `v` is the file
  * `manifest-v` listing them, and creating `manifest-(v+1)` IS the commit.
  *
  * Commit protocol (the same shape Delta's `_delta_log` uses, minus the jar):
  *   1. stage the full manifest content into a uniquely-named temp file,
  *   2. publish it as `manifest-(v+1)` — fail-if-exists, so two committers
  *      racing for the same version CAS on the publish and the loser retries
  *      (appends) or aborts (rewrites, see [[GraftBatchWrite]]).
  * A torn write is impossible at the commit point because the publish is the
  * only mutation of a visible name; a crash anywhere earlier leaves one
  * orphan temp/staging dir for [[vacuum]]. Readers resolve "latest" by
  * listing `manifest-*` and taking the max version — no mutable pointer file
  * exists, so there is nothing to heal on recovery.
  *
  * The publish primitive is scheme-dependent (see [[writeAtomic]]): HDFS
  * rename is atomically non-overwriting; the local filesystem uses link(2)
  * because POSIX rename(2) silently replaces (CasRaceTwoJvmSpec races two
  * JVMs over one table dir to pin this). On an object store whose rename is
  * copy+delete the CAS narrows to best-effort and a multi-writer deployment
  * needs an external lock per table — the identical caveat Delta documents
  * for S3 without a LogStore. Reads are snapshot-isolated regardless because
  * every name a manifest references is immutable.
  *
  * Reference durability contract this backs: the engine's per-block
  * transactional upsert (stream_blocks.py:108-115).
  */
/** One manifest entry: an immutable data dir, the column stats recorded
  * when it was committed (None = pre-stats manifest line or unreadable
  * footers; such a dir is simply never pruned), and the dir's current
  * deletion vector, if any rows have been merge-on-read deleted (an
  * immutable [[DeletionVector]] file under `dv/`; a later DELETE commits a
  * NEW file holding the union and swaps the reference). Stats always
  * describe the PHYSICAL rows of the dir — deletion only hides rows, so
  * min/max/null bounds stay conservative for pruning and `rows` is the
  * pre-deletion count.
  */
/** `dvRows` is the vector's cardinality, cached in the manifest line at
  * commit time (the committer just built the vector, so the count is free)
  * — metadata queries (`db.t.files`, `history()`) serve it without
  * re-reading vector files driver-side. None on pre-cache manifest lines;
  * such entries degrade to reading the (immutable) vector file.
  */
final case class DirEntry(dir: String, stats: Option[DirStats],
                          dv: Option[String] = None,
                          dvRows: Option[Long] = None)

class TableLog(val tableDir: String, conf: Configuration) extends Serializable {

  private def fs: FileSystem = new Path(tableDir).getFileSystem(conf)

  /** The built-in commit lock used when the table's scheme lacks an atomic
    * non-overwriting rename and no user lock is registered (see
    * [[writeAtomic]]); in-process stripes live in the companion, so every
    * handle of one table shares the same layer-1 monitor.
    */
  @transient private lazy val defaultLeaseLock = new LeaseFileCommitLock(conf)

  private val schemaPath = new Path(tableDir, "table.json")
  private def manifestPath(v: Long) = new Path(tableDir, s"manifest-$v")

  // ---- small-file IO -------------------------------------------------------

  private def slurp(p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream(256)
      val bytes = new Array[Byte](4096)
      var n = in.read(bytes)
      while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def writeAtomic(dst: Path, content: String): Boolean = {
    val tmp = new Path(tableDir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // External-lock seam (LogStore-shaped — the same seam Delta uses for
    // S3 multi-writer): when a CommitLock is registered, the whole
    // exists+publish sequence serializes through it, which makes the CAS
    // correct even on a store whose rename is copy+delete (non-atomic,
    // overwriting). Without a user-registered lock, a scheme whose rename
    // atomicity this layer cannot vouch for gets the in-tree
    // [[LeaseFileCommitLock]] BY DEFAULT (create-no-overwrite lease file +
    // TTL + fencing token — the public S3DynamoDBLogStore shape without
    // the DynamoDB dependency), so object-store deployments get
    // exactly-one-winner commits out of the box; ObjectStoreRenameSpec
    // pins both the locked fix and (with the default disabled) the bare
    // failure mode the old warning described.
    TableLog.commitLock match {
      case Some(lock) => lock.withLock(tableDir)(publish(tmp, dst))
      case None =>
        val scheme = Option(fs.getUri.getScheme).getOrElse("")
        if (TableLog.AtomicRenameSchemes.contains(scheme)) publish(tmp, dst)
        else if (TableLog.defaultLeaseLockEnabled) {
          if (TableLog.leaseLockNoted.add(TableLog.dirKey(tableDir)))
            System.err.println(s"[graft-lake] INFO: filesystem scheme " +
              s"'$scheme' for $tableDir has no atomic non-overwriting " +
              "rename; commits serialize through the built-in lease-file " +
              "lock (_commitlock, TTL 60s). Register a store-native lock " +
              "via TableLog.setCommitLock to replace it (noted once per table)")
          defaultLeaseLock.withLock(tableDir)(publish(tmp, dst))
        } else {
          if (TableLog.nonAtomicSchemeWarned.add(TableLog.dirKey(tableDir)))
            System.err.println(s"[graft-lake] WARN: filesystem scheme " +
              s"'$scheme' for $tableDir is not known to rename atomically " +
              "without overwriting; two writers racing a commit can SILENTLY " +
              "LOSE one (copy+delete rename lets both publishes succeed). " +
              "Use a single writer per table here, or register an external " +
              "lock via TableLog.setCommitLock (warned once per table)")
          publish(tmp, dst)
        }
    }
  }

  private def publish(tmp: Path, dst: Path): Boolean = {
    // the CAS: publish tmp under dst's name, failing if dst exists.
    // HDFS rename is atomically non-overwriting, but the LOCAL filesystem's
    // rename maps to POSIX rename(2), which silently REPLACES an existing
    // destination — the exists() pre-check below narrows but cannot close
    // that window across processes (two JVMs both observing "absent" would
    // both rename, the second silently destroying the first's commit). On
    // a file: scheme the publish therefore uses link(2) instead
    // (Files.createLink), which atomically fails with EEXIST — making the
    // local CAS exactly as strong as the HDFS one. (Object stores without
    // atomic rename: single-writer, or the CommitLock seam wrapped around
    // this whole sequence by writeAtomic — ObjectStoreRenameSpec pins
    // both the unlocked failure mode and the locked fix.)
    // getUri.getScheme, not getScheme: Hadoop's base FileSystem.getScheme
    // throws UnsupportedOperationException for implementations that never
    // overrode it, and this probe runs on EVERY commit of every scheme
    if (fs.exists(dst)) { fs.delete(tmp, false); false }
    else if ("file" == fs.getUri.getScheme &&
             !TableLog.linkUnsupportedDirs.contains(TableLog.dirKey(tableDir))) {
      // ONLY createLink inside the try: a failure of the post-publish tmp
      // cleanup must never be mistaken for a failed publish
      val published =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          Some(true)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            // lost the CAS — the normal racing-committer outcome
            Some(false)
          case _: java.nio.file.NoSuchFileException =>
            // our tmp vanished (a concurrent vacuum reclaimed an expired
            // staging file under a stalled writer): a lost CAS — the
            // caller re-reads the head and restages
            Some(false)
          case e @ (_: UnsupportedOperationException |
                    _: java.nio.file.FileSystemException) =>
            // Either this mount has no hardlinks (zipfs throws UOE; Linux
            // maps EPERM/EOPNOTSUPP to a plain FileSystemException) or the
            // error is TRANSIENT (EIO, ENOSPC — also plain
            // FileSystemException). Distinguish by probing link support in
            // this table dir: a genuinely hardlink-less mount fails the
            // probe on EVERY attempt, so the rename fallback latches only
            // after [[TableLog.LinkProbeLatchThreshold]] CONSECUTIVE probe
            // failures (a transient blip — EIO/ENOSPC hitting both the
            // commit's createLink and the one-shot probe — must not
            // permanently downgrade the cross-process CAS; a later
            // successful probe resets the count). The latch is PER TABLE
            // DIR (another table on a link-capable mount keeps the safe
            // CAS) with one loud warning, since the fallback's
            // exists+rename narrows but cannot close the cross-process
            // race; until the latch trips, the failure just reports a lost
            // CAS and the caller's bounded retry loop either clears it or
            // fails loudly.
            val key = TableLog.dirKey(tableDir)
            if (!TableLog.probeLinkSupport(tableDir)) {
              val fails: Int = TableLog.linkProbeFailures.merge(key, Int.box(1),
                (a: Integer, b: Integer) => Int.box(a + b))
              if (fails >= TableLog.LinkProbeLatchThreshold &&
                  TableLog.linkUnsupportedDirs.add(key))
                System.err.println(s"[graft-lake] WARN: hardlinks unsupported " +
                  s"under $tableDir ($fails consecutive probe failures, last " +
                  s"commit error ${e.getClass.getName}); manifest commits " +
                  "fall back to rename, which is NOT atomic against writers " +
                  "in other processes on a local mount — use a single writer " +
                  "per table here (warned once per table)")
            } else TableLog.linkProbeFailures.remove(key)
            None
        }
      published match {
        case Some(true) =>
          try fs.delete(tmp, false) catch { case _: Exception => () }
          true
        case _ =>
          try fs.delete(tmp, false) catch { case _: Exception => () }
          false
      }
    }
    else if (fs.rename(tmp, dst)) true
    else { fs.delete(tmp, false); false }
  }

  // ---- table metadata ------------------------------------------------------

  def exists: Boolean = fs.exists(schemaPath)

  def create(schema: StructType, properties: Map[String, String]): Unit = {
    // a table re-created where one was dropped restarts version numbers:
    // nothing cached under this dir may survive into the new history
    TableLog.invalidateCache(tableDir)
    fs.mkdirs(new Path(tableDir))
    if (!writeAtomic(schemaPath, TableLog.encodeMeta(schema, properties)))
      throw new IllegalStateException(s"table already exists: $tableDir")
  }

  /** CREATE-time schema and properties (`table.json`) — the fallback for
    * every version whose manifest carries no meta header (pre-ALTER
    * history, or a table never altered).
    */
  @transient private lazy val baseMeta: (StructType, Map[String, String]) =
    TableLog.decodeMeta(slurp(schemaPath))

  /** Schema + properties in effect at version `v`: the manifest's own meta
    * header when present (written by ALTER TABLE and carried forward by
    * every later commit), else the CREATE-time `table.json`. Versioned so
    * time travel reads each snapshot under the schema it was written with.
    */
  def metaAt(v: Long): (StructType, Map[String, String]) =
    TableLog.parseMetaHeader(slurp(manifestPath(v))).getOrElse(baseMeta)

  /** CREATE-time meta, for callers resolving the empty-table case. */
  private[connector] def baseMetaPublic: (StructType, Map[String, String]) = baseMeta

  // manifests are immutable once committed, so the raw meta header of a
  // version can be memoized per TableLog instance — commit CAS loops would
  // otherwise re-slurp the expected manifest on every attempt just to
  // carry its header forward
  @transient private lazy val headerCache =
    scala.collection.mutable.HashMap[Long, Option[String]]()
  private def headerAt(v: Long): Option[String] = headerCache.synchronized {
    headerCache.getOrElseUpdate(v,
      slurp(manifestPath(v)).linesIterator.nextOption()
        .filter(_.startsWith(TableLog.MetaHeaderPrefix)))
  }

  // current meta is resolved once per TableLog instance (a query plans
  // several scans/writes, each of which would otherwise re-slurp the same
  // small files) — the same analysis-time pinning scans get
  @transient private lazy val metaCache: (StructType, Map[String, String]) =
    latestVersion.map(metaAt).getOrElse(baseMeta)
  def schema: StructType = metaCache._1
  def properties: Map[String, String] = metaCache._2

  def drop(): Boolean = {
    TableLog.invalidateCache(tableDir)
    fs.delete(new Path(tableDir), true)
  }

  // ---- versions ------------------------------------------------------------

  private val latestHintPath = new Path(tableDir, "_latest")

  /** Highest committed version, or None for a freshly-created empty table.
    *
    * Resolution is hint-first: every successful commit overwrites a
    * `_latest` hint file, so the common case is one small read plus a
    * couple of existence probes — NOT a `listStatus` over every
    * `manifest-*` (O(versions) per table load / per CAS attempt; a
    * 10k-commit table would pay 10k list entries on every loadTable).
    * The hint is STRICTLY a hint, never the source of truth:
    *  - stale-LOW (writer crashed between manifest rename and hint update,
    *    or two committers' hint writes landed out of order) heals by
    *    probing `manifest-(h+1)`, `(h+2)`, ... forward — bounded by how
    *    many commits landed since the hint, not by history size;
    *  - stale-HIGH cannot occur (the hint is written only after its
    *    manifest is visible, and vacuum never drops the newest manifest);
    *  - a torn/garbled hint (plain overwrite, deliberately not CAS'd)
    *    falls back to the full listing.
    * Correctness therefore never depends on the hint — the commit CAS is
    * still the manifest rename itself.
    */
  def latestVersion: Option[Long] = {
    val hinted: Option[Long] =
      try {
        if (!fs.exists(latestHintPath)) None
        else {
          val h = slurp(latestHintPath).trim.toLong
          if (h < 0 || !fs.exists(manifestPath(h))) None
          else {
            var v = h
            while (fs.exists(manifestPath(v + 1))) v += 1
            // the probe's two observations are not atomic against a
            // concurrent vacuum: a stale-low hint could pass its own
            // existence check an instant before vacuum (ascending, see
            // [[vacuum]]) reclaims it and its successor. Re-checking the
            // RESOLVED version closes that window — a vanished resolved
            // manifest means the probe straddled a vacuum and the listing
            // (whose max is always a vacuum-kept version) must decide.
            if (fs.exists(manifestPath(v))) Some(v) else None
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    hinted.orElse(listedLatestVersion)
  }

  /** The listing-based resolution (the hint's fallback, and the probe's
    * reference implementation).
    */
  def listedLatestVersion: Option[Long] = {
    val root = new Path(tableDir)
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Best-effort `_latest` hint refresh after a successful commit: a plain
    * overwrite (readers tolerate torn content by falling back), and any
    * failure never fails the commit — but the FIRST failure per table logs
    * one warning: a persistently failing hint write (e.g. permissions on
    * `_latest`) silently degrades every table load to the stale-hint
    * forward probe or the full O(versions) listing, and without a signal
    * nobody would ever notice the optimization is off.
    */
  private def updateLatestHint(v: Long): Unit =
    try {
      val out = fs.create(latestHintPath, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (TableLog.hintWriteWarned.add(tableDir))
          System.err.println(s"[graft-lake] WARN: _latest hint write failed " +
            s"for $tableDir (${e.getClass.getName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString +
            "); commits are unaffected but latest-version resolution " +
            "degrades to probing/listing until hint writes succeed " +
            "(warned once per table)")
    }

  /** Data directories + their committed column stats at version `v`, in
    * manifest order. Manifest line format: `relDir` alone (no stats — the
    * pre-stats layout, or a dir whose footers could not be read),
    * `relDir<TAB>statsJson`, `relDir<TAB>statsJson<TAB>relDvFile` for a
    * dir carrying a deletion vector (the stats field is empty when the dir
    * is statless but vectored), or `...<TAB>relDvFile<TAB>dvRows` with the
    * vector's cached cardinality. Unparseable stats degrade to None (the
    * dir is simply never pruned), so old manifests read unchanged.
    */
  def entriesAt(v: Long): Seq[DirEntry] =
    try resolveCached(v)
    catch {
      // one retry: a delta-chain walk racing a concurrent vacuum can see a
      // mid-chain manifest vanish an instant before vacuum's checkpoint at
      // the oldest kept version becomes its replacement root — the second
      // pass finds that checkpoint. A version that is GENUINELY vacuumed
      // still fails here, with the same exception as always. The race can
      // surface as FileNotFoundException too (resolution slurps
      // optimistically, and nested reads — a predecessor's manifest, a
      // stats footer — can hit the same window), so both are retried once.
      case _: TableLog.MissingVersion => resolveCached(v)
      case _: java.io.FileNotFoundException => resolveCached(v)
    }

  /** Resolved-state cache: manifests are immutable, so version `v`'s entry
    * list never changes once computed. Access-ordered and bounded — the
    * change feed walks versions ascending, so each step resolves as one
    * delta applied to the cached predecessor; entries are shared across
    * versions (applyPatch reuses unchanged [[DirEntry]] instances), so the
    * cache holds little beyond one full state.
    */
  @transient private lazy val entriesCache =
    new java.util.LinkedHashMap[Long, Seq[DirEntry]](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Long, Seq[DirEntry]]): Boolean =
        size > 8
    }

  private def resolveCached(v: Long): Seq[DirEntry] = {
    val hit = entriesCache.synchronized(entriesCache.get(v))
    if (hit != null) return hit
    val key = (TableLog.dirKey(tableDir), v)
    // A shared-cache hit is trusted only if the on-disk resolution root
    // still has the identity recorded when the state was cached: in-process
    // invalidation (drop, re-create, vacuum) cannot reach OTHER JVMs'
    // caches, so a table dropped and re-created by another writer restarts
    // version numbers and (path, version) alone would serve the dropped
    // history's dirs indefinitely. One getFileStatus per cold handle is the
    // whole validation cost; a mismatch purges the dir's keys and resolves
    // fresh.
    val resolved = TableLog.cachedState(key) match {
      case Some((entries, id)) if manifestIdentity(v).contains(id) => entries
      case shared =>
        if (shared.isDefined) TableLog.invalidateCache(tableDir)
        // identity is captured BEFORE and re-checked AFTER the read: cache
        // only a state whose root file provably did not change underneath
        // the resolution (a drop+re-create mid-read must not pair the old
        // entries with the new file's identity)
        val idBefore = manifestIdentity(v)
        val entries = resolveEntries(v)
        if (idBefore.isDefined && manifestIdentity(v) == idBefore)
          TableLog.cacheState(key, entries, idBefore.get)
        entries
    }
    entriesCache.synchronized(entriesCache.put(v, resolved))
    resolved
  }

  /** On-disk identity of version `v`'s resolution root — the manifest, or
    * the checkpoint standing in for a vacuumed manifest — as (which file,
    * mtime, length). None when neither exists. Committed files are
    * immutable, so a changed identity can only mean drop/re-create or
    * vacuum in another process.
    */
  private def manifestIdentity(v: Long): Option[TableLog.ManifestId] = {
    def stat(p: Path, cp: Boolean): Option[TableLog.ManifestId] =
      try {
        val st = fs.getFileStatus(p)
        Some(TableLog.ManifestId(cp, st.getModificationTime, st.getLen))
      } catch { case _: java.io.FileNotFoundException => None }
    stat(manifestPath(v), cp = false).orElse(stat(checkpointPath(v), cp = true))
  }

  /** State resolution for one version. A FULL manifest (every manifest of a
    * table at or under [[TableLog.FullManifestMaxEntries]] dirs — and every
    * pre-delta manifest, unchanged on disk) is the state. A DELTA manifest
    * (`#delta` marker: only the commit's removed/changed/added entries) is
    * applied over its predecessor's state — unless a `checkpoint-v` file
    * (the full state, written by every [[TableLog.CheckpointInterval]]-th
    * delta commit and by vacuum at the oldest kept version) short-circuits
    * the walk, which bounds every chain. See PLANS.md §manifest-scale: an
    * 8k-dir table's append used to rewrite a 5.4 MB manifest per commit.
    */
  private def resolveEntries(v: Long): Seq[DirEntry] = {
    // optimistic reads: exists-then-slurp leaves a window where a
    // concurrent vacuum deletes the file between the two calls (surfacing
    // as FileNotFoundException instead of MissingVersion, dodging the
    // retry) — so each file is read directly, with "missing" derived from
    // the read itself
    slurpIfExists(manifestPath(v)) match {
      case None =>
        // manifest vacuumed but the version kept alive as a checkpoint root
        slurpIfExists(checkpointPath(v)) match {
          case Some(c) => parseEntries(c)
          case None => throw new TableLog.MissingVersion(v, tableDir)
        }
      case Some(content) if !TableLog.isDelta(content) => parseEntries(content)
      case Some(content) =>
        slurpIfExists(checkpointPath(v)) match {
          case Some(c) => parseEntries(c)
          case None =>
            applyPatch(resolveCached(v - 1), parseRemoves(content), parseEntries(content))
        }
    }
  }

  private def slurpIfExists(p: Path): Option[String] =
    try Some(slurp(p))
    catch { case _: java.io.FileNotFoundException => None }

  private def checkpointPath(v: Long) = new Path(tableDir, s"checkpoint-$v")

  private def parseRemoves(content: String): Set[String] =
    content.linesIterator.filter(_.startsWith(TableLog.RemovePrefix))
      .map(l => new Path(tableDir, l.stripPrefix(TableLog.RemovePrefix)).toString)
      .toSet

  /** The one definition of delta-application semantics — the commit path
    * simulates THIS function against the caller's entry list and falls back
    * to a full manifest on any mismatch, so writer and reader cannot drift:
    * base order kept with same-dir replacements in place, removed dirs
    * dropped, new dirs appended in patch order.
    */
  private def applyPatch(base: Seq[DirEntry], removed: Set[String],
                         patch: Seq[DirEntry]): Seq[DirEntry] = {
    val byDir = patch.map(e => e.dir -> e).toMap
    val baseDirs = base.map(_.dir).toSet
    base.collect { case e if !removed.contains(e.dir) => byDir.getOrElse(e.dir, e) } ++
      patch.filterNot(e => baseDirs.contains(e.dir))
  }

  private def parseEntries(content: String): Seq[DirEntry] =
    content.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
      val (rel, stats, dv, dvRows) = line.split("\t", 4) match {
        case Array(r, json, dvRel, card) =>
          (r, if (json.isEmpty) None else DirStats.decode(json),
            Some(new Path(tableDir, dvRel).toString), card.toLongOption)
        case Array(r, json, dvRel) =>
          (r, if (json.isEmpty) None else DirStats.decode(json),
            Some(new Path(tableDir, dvRel).toString), None)
        case Array(r, json) => (r, DirStats.decode(json), None, None)
        case Array(r) => (r, None, None, None)
      }
      DirEntry(new Path(tableDir, rel).toString, stats, dv, dvRows)
    }.toSeq

  /** Cardinality of an entry's deletion vector: the manifest-cached count
    * when present, else one read of the (immutable) vector file; 0 for an
    * unvectored entry.
    */
  def deletedRows(e: DirEntry): Long =
    e.dvRows.orElse(e.dv.map(p => DeletionVector.read(p, conf).cardinality))
      .getOrElse(0L)

  /** Data directories of version `v` (absolute paths), in manifest order. */
  def dirsAt(v: Long): Seq[String] = entriesAt(v).map(_.dir)

  /** Data directories of the latest version (empty for an empty table). */
  def currentDirs(): Seq[String] = latestVersion.map(dirsAt).getOrElse(Nil)

  /** Entries of the latest version (empty for an empty table). */
  def currentEntries(): Seq[DirEntry] = latestVersion.map(entriesAt).getOrElse(Nil)

  /** Every physical column name the table can still read: the CREATE-time
    * schema, each SURVIVING manifest's meta header (historical schemas —
    * read through the cached first-line [[headerAt]], never a full
    * manifest slurp), the footer-stat keys of the current entries, and —
    * for current dirs with NO committed stats, where those keys are
    * absent — one real footer-schema read per dir. ADD COLUMN's
    * fresh-name generator checks candidates against this set
    * ([[ColumnMapping.freshPhysicalName]]): an 8-hex birthday collision
    * with a dropped column of the same logical name would otherwise read
    * that column's stale bytes as the new column's data. Residual gap,
    * accepted: a column DROPPED from stats as unusable, in a dir whose
    * writing-era manifests were all vacuumed — layered behind the 2^-32
    * tag collision itself.
    */
  def usedPhysicalNames(): Set[String] = {
    val versions = fs.listStatus(new Path(tableDir)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong)
    val schemas = baseMeta._1 +:
      versions.flatMap(v => headerAt(v).flatMap(TableLog.parseMetaHeader))
        .map(_._1)
    val fromSchemas =
      schemas.flatMap(_.fields.map(ColumnMapping.physicalName))
    val entries = currentEntries()
    val fromStats = entries.flatMap(_.stats).flatMap(_.cols.keysIterator)
    val fromStatless = entries.filter(_.stats.isEmpty)
      .flatMap(e => DirStats.footerFieldNames(e.dir, conf))
    (fromSchemas ++ fromStats ++ fromStatless).toSet
  }

  /** Newest version whose manifest was committed at or before `tsMillis`
    * (manifest file mtime — the commit instant, since the rename that
    * creates it is the commit).
    */
  def versionAtTimestamp(tsMillis: Long): Option[Long] = {
    val root = new Path(tableDir)
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith("manifest-"))
      .filter(_.getModificationTime <= tsMillis)
      .map(_.getPath.getName.stripPrefix("manifest-").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Commit instant of one version (manifest mtime — the rename IS the
    * commit), without the full per-version stats/vector walk `history()`
    * does. Fails on a vacuumed-away version, like `entriesAt`.
    */
  def commitTimestamp(v: Long): Long = {
    val p = manifestPath(v)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"version $v of $tableDir has no manifest (vacuumed or never committed)")
    fs.getFileStatus(p).getModificationTime
  }

  /** Allocate a fresh, never-visible data directory name for a write. */
  def newDataDir(): String =
    new Path(tableDir, s"data/d-${java.util.UUID.randomUUID().toString.take(12)}").toString

  /** Allocate a fresh deletion-vector file name (committed into a manifest
    * line by a merge-on-read DELETE; immutable once written, like data dirs).
    */
  def newDvFile(): String =
    new Path(tableDir, s"dv/v-${java.util.UUID.randomUUID().toString.take(12)}").toString

  /** Allocate a fresh PRE-IMAGE vector file name: a mor MERGE commits one
    * per touched dir holding only THAT COMMIT's update-caused deletions
    * (referenced by a `#cdcpre` marker line, not by the entry itself), so
    * the change feed can split the commit's retractions into exact
    * `update_preimage` rows vs plain deletes. Immutable, `dv/`-housed like
    * the entry vectors, reclaimed by vacuum under the same liveness rules.
    */
  def newPreDvFile(): String =
    new Path(tableDir, s"dv/p-${java.util.UUID.randomUUID().toString.take(12)}").toString

  private def rel(abs: String): String = {
    val prefix = new Path(tableDir).toString + "/"
    val s = new Path(abs).toString
    if (s.startsWith(prefix)) s.stripPrefix(prefix) else s
  }

  /** Attempt to commit `dirs` as the content of version `expected + 1`
    * (expected = the version the writer based its work on, None = empty
    * table). Returns false when that version was claimed by someone else —
    * the caller re-reads and retries or aborts.
    */
  def tryCommit(expected: Option[Long], dirs: Seq[String]): Boolean =
    tryCommitEntries(expected, dirs.map(DirEntry(_, None)))

  /** As [[tryCommit]], preserving each entry's column stats and deletion
    * vector reference in the manifest. The previous version's meta header
    * (post-ALTER schema/properties) is carried forward verbatim, so
    * `metaAt` never has to walk history.
    */
  def tryCommitEntries(expected: Option[Long], entries: Seq[DirEntry]): Boolean =
    tryCommitEntriesMeta(expected, entries, newMeta = None)

  /** As [[tryCommitEntries]]; `newMeta` replaces the meta header (ALTER
    * TABLE's commit — same CAS, so schema changes serialize with writes),
    * and `op` stamps the commit's OPERATION as a per-commit `#op` line
    * (written by merge-on-read row-level commands; the change-data-feed
    * reads it back through [[opAt]] to classify a version's retractions as
    * update pre/post-images). Unlike the meta header, an op line is never
    * carried forward — it describes exactly one commit.
    */
  def tryCommitEntriesMeta(expected: Option[Long], entries: Seq[DirEntry],
                           newMeta: Option[(StructType, Map[String, String])],
                           op: Option[String] = None,
                           cdc: Option[TableLog.CdcMarkers] = None): Boolean = {
    val next = expected.getOrElse(0L) + 1
    if (latestVersion.exists(_ >= next)) return false
    val header: Option[String] = newMeta.map(TableLog.encodeMetaHeader)
      .orElse(expected.flatMap(headerAt))
    op.foreach(o => require(!o.contains("\n") && !o.contains("\t"),
      s"illegal op marker '$o'"))
    // per-commit CDC row-lineage markers (`#cdcpost`/`#cdcpre` lines):
    // invisible to entry parsing, never carried forward — like #op
    val cdcLines: Seq[String] = cdc.toSeq.flatMap { m =>
      m.postImageDvByDir.toSeq.sortBy(_._1).map { case (d, dv) =>
        s"${TableLog.CdcPostPrefix}${rel(d)}\t${rel(dv)}"
      } ++
        m.preImageDvByDir.toSeq.sortBy(_._1).map { case (d, dv) =>
          s"${TableLog.CdcPrePrefix}${rel(d)}\t${rel(dv)}"
        } ++
        m.deleteDvByDir.toSeq.sortBy(_._1).map { case (d, dv) =>
          s"${TableLog.CdcDelPrefix}${rel(d)}\t${rel(dv)}"
        } ++
        m.addDirs.sorted.map(d => s"${TableLog.CdcAddPrefix}${rel(d)}")
    }
    // Delta-vs-full decision: a table past FullManifestMaxEntries dirs
    // commits only its CHANGES (a `#delta`-marked manifest: `#remove`
    // lines + changed/added entry lines) instead of rewriting the whole
    // O(dirs) list — the write-amplification ceiling ManifestScaleProbe
    // measured (680 ms / 5.4 MB per append at 8k dirs). Small tables keep
    // full manifests: their rewrite is trivial and their loads then never
    // pay a chain walk. The delta is used only when replaying it over the
    // predecessor's state reproduces the caller's list EXACTLY (order
    // included) — a reordering caller (compaction layouts) gets a full
    // manifest, so readers always observe precisely the committed order.
    val prevEntries: Seq[DirEntry] =
      if (expected.isEmpty || entries.size <= TableLog.FullManifestMaxEntries) Nil
      else entriesAt(expected.get)
    val deltaLines: Option[Seq[String]] =
      if (expected.isEmpty || entries.size <= TableLog.FullManifestMaxEntries) None
      else {
        val nextDirs = entries.map(_.dir).toSet
        val prevByDir = prevEntries.map(e => e.dir -> e).toMap
        val removes = prevEntries.map(_.dir).filterNot(nextDirs.contains)
        val patch = entries.filter(e => !prevByDir.get(e.dir).contains(e))
        if (applyPatch(prevEntries, removes.toSet, patch) == entries)
          Some(TableLog.DeltaMarker +:
            (removes.map(d => TableLog.RemovePrefix + rel(d)) ++ entryLines(patch)))
        else None
      }
    val body = (header.toSeq ++ op.map(TableLog.OpPrefix + _).toSeq ++
      cdcLines ++ deltaLines.getOrElse(entryLines(entries)))
      .mkString("", "\n", "\n")
    val won = writeAtomic(manifestPath(next), body)
    if (won) {
      updateLatestHint(next)
      // bound every delta chain: each CheckpointInterval-th commit of a
      // delta-writing table also publishes the FULL state as a checkpoint
      // file (Delta's checkpoint.parquet role). Best-effort like the hint:
      // a failed write only lengthens chains until the next one lands.
      if (deltaLines.isDefined && next % TableLog.CheckpointInterval == 0)
        writeCheckpoint(next, entries)
    }
    won
  }

  private def entryLines(entries: Seq[DirEntry]): Seq[String] =
    entries.map { e =>
      val statsField = e.stats.map(DirStats.encode).getOrElse("")
      e.dv match {
        case Some(dvPath) =>
          val base = s"${rel(e.dir)}\t$statsField\t${rel(dvPath)}"
          e.dvRows.fold(base)(c => s"$base\t$c")
        case None if statsField.nonEmpty => s"${rel(e.dir)}\t$statsField"
        case None => rel(e.dir)
      }
    }

  /** Publish version `v`'s full state as `checkpoint-v` (atomic, idempotent
    * — a racing duplicate writer simply loses the fail-if-exists publish).
    * Failures never fail the commit that triggered it, but warn once per
    * table: persistently-failing checkpoints silently degrade every later
    * load to longer delta-chain walks.
    */
  private def writeCheckpoint(v: Long, entries: Seq[DirEntry]): Unit =
    try {
      writeAtomic(checkpointPath(v), entryLines(entries).mkString("", "\n", "\n"))
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        if (TableLog.checkpointWriteWarned.add(tableDir))
          System.err.println(s"[graft-lake] WARN: checkpoint write failed " +
            s"for $tableDir version $v (${e.getClass.getName}); commits are " +
            "unaffected but snapshot resolution walks longer delta chains " +
            "until a checkpoint lands (warned once per table)")
    }

  /** The operation marker of version `v`'s commit (`#op` line), if its
    * writer recorded one. Memoized per instance (manifests are immutable)
    * — the change-feed planner probes several versions per range.
    */
  def opAt(v: Long): Option[String] = opCache.synchronized {
    opCache.getOrElseUpdate(v, parseOp(slurp(manifestPath(v))))
  }

  @transient private lazy val opCache =
    scala.collection.mutable.HashMap[Long, Option[String]]()

  private def parseOp(content: String): Option[String] =
    content.linesIterator
      .find(_.startsWith(TableLog.OpPrefix))
      .map(_.stripPrefix(TableLog.OpPrefix))

  /** The CDC row-lineage markers of version `v`'s commit (`#cdcpost` /
    * `#cdcpre` lines, absolute paths), if its writer recorded any — a mor
    * MERGE does; every other commit returns None and the change feed keeps
    * its version-level classification. Memoized like [[opAt]].
    */
  def cdcAt(v: Long): Option[TableLog.CdcMarkers] = cdcCache.synchronized {
    cdcCache.getOrElseUpdate(v, parseCdc(slurp(manifestPath(v))))
  }

  @transient private lazy val cdcCache =
    scala.collection.mutable.HashMap[Long, Option[TableLog.CdcMarkers]]()

  private def parseCdc(content: String): Option[TableLog.CdcMarkers] = {
    val post = Map.newBuilder[String, String]
    val pre = Map.newBuilder[String, String]
    def entry(l: String, prefix: String): (String, String) = {
      val Array(d, dv) = l.stripPrefix(prefix).split("\t", 2)
      new Path(tableDir, d).toString -> new Path(tableDir, dv).toString
    }
    val del = Map.newBuilder[String, String]
    val add = Seq.newBuilder[String]
    content.linesIterator.foreach {
      case l if l.startsWith(TableLog.CdcPostPrefix) =>
        post += entry(l, TableLog.CdcPostPrefix)
      case l if l.startsWith(TableLog.CdcPrePrefix) =>
        pre += entry(l, TableLog.CdcPrePrefix)
      case l if l.startsWith(TableLog.CdcDelPrefix) =>
        del += entry(l, TableLog.CdcDelPrefix)
      case l if l.startsWith(TableLog.CdcAddPrefix) =>
        add += new Path(tableDir, l.stripPrefix(TableLog.CdcAddPrefix)).toString
      case _ => ()
    }
    val m = TableLog.CdcMarkers(post.result(), pre.result(), del.result(),
      add.result())
    if (m.postImageDvByDir.isEmpty && m.preImageDvByDir.isEmpty &&
        m.deleteDvByDir.isEmpty && m.addDirs.isEmpty) None
    else Some(m)
  }

  private[connector] def hadoopConf: Configuration = conf

  /** Version history, newest first (`DESCRIBE HISTORY`'s role): commit
    * instant = manifest mtime (the rename IS the commit), physical rows
    * from committed stats (None when any dir is statless), live rows =
    * physical minus deletion-vector cardinality. Spans only versions
    * vacuum has kept.
    */
  def history(): Seq[TableLog.TableVersion] = {
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Nil
    val asc = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith("manifest-"))
      .map(st => st.getPath.getName.stripPrefix("manifest-").toLong -> st.getModificationTime)
      .sortBy(_._1)
    // resolve oldest→newest, applying each delta to the running state —
    // one slurp per version (serving entries AND the op marker) instead of
    // a chain walk per version; the oldest kept version alone may need the
    // checkpoint-rooted resolution. A delta is applied to the running
    // state ONLY when it is the direct successor (vacuum keeps a
    // contiguous suffix, but a mid-history gap — manual deletion, a
    // half-finished external copy — must re-root through entriesAt, not
    // silently apply against the wrong predecessor).
    var state: Seq[DirEntry] = null
    var stateV: Long = -1L
    asc.map { case (v, ts) =>
      val content = slurp(manifestPath(v))
      val entries =
        if (!TableLog.isDelta(content)) parseEntries(content)
        else if (state != null && stateV == v - 1)
          applyPatch(state, parseRemoves(content), parseEntries(content))
        else entriesAt(v)
      state = entries
      stateV = v
      val rows =
        if (entries.forall(_.stats.isDefined)) Some(entries.flatMap(_.stats).map(_.rows).sum)
        else None
      val deleted = entries.map(deletedRows).sum
      TableLog.TableVersion(v, ts, entries.size, rows, rows.map(_ - deleted),
        parseOp(content))
    }.reverse
  }

  /** Drop all but the newest `keepVersions` manifests and delete the data
    * dirs no surviving manifest references. Two classes of dead dir differ
    * in how safely they can be reclaimed:
    *  - dirs referenced by a DROPPED manifest are superseded history —
    *    deletable immediately;
    *  - dirs referenced by NO manifest at all are either crashed-write
    *    orphans or the staging dir of an IN-FLIGHT write that has not
    *    CAS-committed yet — deleting a live staging dir would let its
    *    commit publish a manifest pointing at nothing, so these (and
    *    crashed `.tmp-` manifest staging files) are only reclaimed once
    *    older than `orphanRetentionMs` (Delta's retention-window rule).
    * Run outside the reader SLA window — same contract as Delta VACUUM.
    * Returns what was reclaimed (the CALL procedure's result row).
    */
  def vacuum(keepVersions: Int = 2,
             orphanRetentionMs: Long = 60L * 60 * 1000): TableLog.VacuumStats = {
    val v = latestVersion.getOrElse(return TableLog.VacuumStats(0, 0))
    val root = new Path(tableDir)
    val manifests = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("manifest-"))
      .map(p => p.getName.stripPrefix("manifest-").toLong -> p)
    val (kept, dropped) = manifests.partition(_._1 > v - keepVersions)
    val keptEntries = kept.map { case (mv, _) => entriesAt(mv) }
    val droppedEntries = dropped.map { case (mv, _) => entriesAt(mv) }
    val live: Set[String] =
      keptEntries.flatten.map(e => new Path(e.dir).getName).toSet
    val superseded: Set[String] =
      droppedEntries.flatten.map(e => new Path(e.dir).getName).toSet -- live
    // deletion-vector files follow the same liveness rules as data dirs:
    // referenced by a kept manifest = live, referenced only by dropped
    // manifests = superseded history, referenced by nothing = in-flight or
    // crashed (retention window applies). Pre-image vectors (#cdcpre marker
    // references — the change feed's update-classification input for a mor
    // MERGE version) count as references too: a kept version's change rows
    // must stay replayable.
    def preDvs(vs: Seq[(Long, Path)]): Set[String] =
      vs.flatMap { case (mv, _) =>
        cdcAt(mv).toSeq.flatMap(m =>
          m.preImageDvByDir.values ++ m.postImageDvByDir.values ++
            m.deleteDvByDir.values)
      }.map(p => new Path(p).getName).toSet
    val liveDv: Set[String] =
      keptEntries.flatten.flatMap(_.dv).map(p => new Path(p).getName).toSet ++
        preDvs(kept)
    val supersededDv: Set[String] =
      (droppedEntries.flatten.flatMap(_.dv).map(p => new Path(p).getName)
        .toSet ++ preDvs(dropped)) -- liveDv
    // Before any manifest drops: the OLDEST KEPT version must stay
    // resolvable once the chain below it is gone. A kept delta manifest
    // resolves through its predecessors — so when manifest-O is a delta,
    // vacuum publishes `checkpoint-O` (the full state, resolved while the
    // chain is still intact) as the new resolution root; every kept
    // version ≥ O then chains down at most to O and stops there. A full
    // manifest at O is its own root and needs nothing. Checkpoint
    // publication is a hard precondition of dropping — a failure aborts
    // the vacuum with history intact.
    if (dropped.nonEmpty) {
      val o = kept.map(_._1).min
      if (TableLog.isDelta(slurp(manifestPath(o))) && !fs.exists(checkpointPath(o))) {
        val state = entriesAt(o)
        if (!writeAtomic(checkpointPath(o), entryLines(state).mkString("", "\n", "\n"))
            && !fs.exists(checkpointPath(o)))
          throw new java.io.IOException(
            s"vacuum of $tableDir aborted: could not publish checkpoint-$o " +
              "(the oldest kept version would become unresolvable)")
      }
    }
    // delete dropped manifests in ASCENDING version order: at every
    // instant "manifest-k exists => manifest-(k+1) exists (or k is the
    // latest)", so the `_latest` hint's forward probe cannot strand
    // mid-history — a stale-low hint either finds its own manifest gone
    // (falls back to the listing) or probes to the true latest.
    // Lexicographic listing order would let manifest-10 die before
    // manifest-2, breaking that invariant where a writer could then
    // CAS-resurrect a reclaimed version number. The probe's own
    // resolved-version re-check (see latestVersion) covers the residual
    // non-atomic-observation window. (Checkpoint files are named outside
    // the manifest-* sequence, so they are invisible to the hint probe and
    // the listing — keeping an old checkpoint root never breaks the
    // contiguity invariant.)
    dropped.sortBy(_._1).foreach { case (_, p) => fs.delete(p, false) }
    // checkpoints strictly below the oldest kept version can no longer be
    // any kept version's resolution root (resolution stops at the FIRST
    // checkpoint on the walk down, and the oldest kept version now carries
    // its own root when it needs one)
    if (dropped.nonEmpty) {
      val o = kept.map(_._1).min
      fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("checkpoint-"))
        .filter(_.getName.stripPrefix("checkpoint-").toLong < o)
        .foreach(p => fs.delete(p, false))
    }
    val now = System.currentTimeMillis()
    def reclaim(subdir: String, keep: Set[String], dead: Set[String]): Int = {
      val root = new Path(tableDir, subdir)
      if (!fs.exists(root)) return 0
      val victims = fs.listStatus(root).toSeq
        .filterNot(st => keep.contains(st.getPath.getName))
        .filter(st => dead.contains(st.getPath.getName) ||
          now - st.getModificationTime > orphanRetentionMs)
      victims.foreach(st => fs.delete(st.getPath, true))
      victims.size
    }
    val reclaimed = reclaim("data", live, superseded) +
      reclaim("dv", liveDv, supersededDv)
    fs.listStatus(root).toSeq
      .filter(st => st.getPath.getName.startsWith(".tmp-") &&
        now - st.getModificationTime > orphanRetentionMs)
      .foreach(st => fs.delete(st.getPath, false))
    // reclaimed versions must stop resolving for FRESH handles ("fails on
    // a vacuumed-away version"); kept versions simply re-resolve through
    // the new checkpoint root on next access
    if (dropped.nonEmpty) {
      TableLog.invalidateCache(tableDir)
      entriesCache.synchronized(entriesCache.clear())
    }
    TableLog.VacuumStats(dropped.size, reclaimed)
  }
}

object TableLog {

  /** Table dirs whose local mount refused link(2) (no hardlink support) —
    * commits there fall back to the rename CAS for the rest of the
    * process. Keyed PER TABLE DIR (normalized, see [[dirKey]]), not
    * process-wide: one hardlink-less mount must not disable the safe
    * cross-process CAS for tables on link-capable mounts. See
    * [[TableLog.writeAtomic]].
    */
  private val linkUnsupportedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Consecutive link-probe failures per table dir (normalized key). The
    * rename fallback latches only at [[LinkProbeLatchThreshold]] — one
    * transient EIO/ENOSPC window that fails both a commit's createLink and
    * the probe must not permanently disable the link-based CAS. A
    * successful probe clears the dir's count.
    */
  private val linkProbeFailures =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private[connector] val LinkProbeLatchThreshold = 3

  /** Canonical latch/cache key for a table dir: alternate spellings of the
    * same directory (trailing slash, relative vs absolute, `file:` URI vs
    * bare path, symlinked parent) must hit the SAME entry, not re-probe
    * and re-warn per spelling.
    *
    * The local-path normalization (`Paths.get` + `toRealPath`) applies ONLY
    * to the `file`/empty schemes it is valid for. A non-local URI keeps its
    * FULL identity — scheme + authority + lexically-normalized path —
    * because stripping scheme/authority would collide two distinct tables
    * whose paths merely coincide (`s3a://bucketA/warehouse/t` vs
    * `s3a://bucketB/warehouse/t`, or `hdfs://nn/x/t` vs `file:/x/t`), and
    * the process-wide snapshot cache keyed on this would then silently
    * serve one table's entry list for the other; `toRealPath` could even
    * resolve a non-local path against a coincidentally-existing local one.
    * Any resolution failure degrades to the raw string.
    */
  private[connector] def dirKey(tableDir: String): String =
    try {
      val uri = new Path(tableDir).toUri
      val scheme = Option(uri.getScheme).getOrElse("")
      if (scheme.isEmpty || scheme == "file") {
        val local = Option(uri.getPath).filter(_.nonEmpty).getOrElse(tableDir)
        val p = java.nio.file.Paths.get(local).toAbsolutePath.normalize
        try p.toRealPath().toString
        catch { case _: Exception => p.toString }
      } else {
        val n = uri.normalize()
        val auth = Option(n.getAuthority).getOrElse("")
        val path = Option(n.getPath).getOrElse("").stripSuffix("/")
        s"$scheme://$auth$path"
      }
    } catch { case _: Exception => tableDir }

  /** Does link(2) work under `tableDir`? Two throwaway files, one link
    * attempt — run only when a commit's createLink failed ambiguously
    * (plain FileSystemException covers both "no hardlinks on this mount"
    * and transient EIO/ENOSPC; the probe separates them).
    */
  private def probeLinkSupport(tableDir: String): Boolean = {
    val a = java.nio.file.Paths.get(tableDir,
      s".tmp-probe-${java.util.UUID.randomUUID()}")
    val b = java.nio.file.Paths.get(tableDir,
      s".tmp-probe-${java.util.UUID.randomUUID()}")
    try {
      // a failed probe WRITE is ambient trouble (ENOSPC, permissions), not
      // evidence about links — report "supported" so nothing latches and
      // the caller's bounded retries decide
      try java.nio.file.Files.write(a, Array[Byte](1))
      catch { case _: Exception => return true }
      java.nio.file.Files.createLink(b, a)
      true
    } catch { case _: Exception => false }
    finally {
      try java.nio.file.Files.deleteIfExists(b) catch { case _: Exception => () }
      try java.nio.file.Files.deleteIfExists(a) catch { case _: Exception => () }
    }
  }

  /** Tables whose `_latest` hint write has already logged its one warning
    * (process-wide: the condition is environmental, warning per-instance
    * would re-spam on every new TableLog handle).
    */
  private val hintWriteWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Tables whose checkpoint write has already logged its one warning. */
  private val checkpointWriteWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Table dirs already warned that their filesystem scheme's rename is not
    * known to be atomically non-overwriting (multi-writer can lose commits
    * there without an external [[CommitLock]]).
    */
  private val nonAtomicSchemeWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Table dirs that already logged the one-time note that commits run
    * under the built-in lease-file lock.
    */
  private val leaseLockNoted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Whether non-atomic-rename schemes fall back to the built-in
    * [[LeaseFileCommitLock]] (default) instead of bare best-effort publish
    * + warning. Test seam: ObjectStoreRenameSpec disables it to pin the
    * unlocked failure mode the lock exists to prevent.
    */
  @volatile private[connector] var defaultLeaseLockEnabled: Boolean = true

  /** Schemes whose publish primitive is a true CAS without external help:
    * `file` via link(2) (EEXIST-atomic; see [[TableLog.writeAtomic]]) and
    * HDFS-family renames (atomically non-overwriting per the FileSystem
    * contract). Anything else — object stores whose rename is copy+delete,
    * FUSE mounts of unknown semantics — warns once per table and is safe
    * only single-writer or under a registered [[CommitLock]];
    * ObjectStoreRenameSpec pins the silent-lost-commit failure mode the
    * warning describes.
    */
  private[connector] val AtomicRenameSchemes: Set[String] =
    Set("file", "hdfs", "viewfs")

  /** LogStore-shaped external-lock seam (the role Delta's LogStore plays
    * for S3 multi-writer): when registered, every manifest/checkpoint
    * publish — the exists-probe plus the rename/link — runs inside
    * `withLock(tableDir)`, which restores CAS semantics on stores whose
    * rename is non-atomic or overwriting. Implementations coordinate
    * across WRITERS (a DynamoDB/ZooKeeper/advisory-file lock per table
    * dir); readers never take the lock (manifests are immutable once
    * visible).
    */
  trait CommitLock {
    def withLock[T](tableDir: String)(body: => T): T
  }

  @volatile private var commitLockProvider: Option[CommitLock] = None
  private def commitLock: Option[CommitLock] = commitLockProvider
  /** Register (or, with null, clear) the process-wide commit lock. */
  def setCommitLock(lock: CommitLock): Unit =
    commitLockProvider = Option(lock)

  /** Thrown (and caught once for a vacuum-race retry) when a version's
    * manifest and checkpoint are both absent mid-resolution.
    */
  private[connector] final class MissingVersion(v: Long, tableDir: String)
    extends IllegalArgumentException(s"no version $v of table $tableDir")

  /** Process-wide resolved-state cache, keyed (normalized table dir,
    * version) — the role Delta's snapshot cache plays. Committed versions
    * are immutable, so entries never go stale from WRITES; the only
    * invalidations are a table DROPPED or re-CREATED at the same path and
    * a VACUUM reclaiming history (each purges its dir's keys). Every new
    * TableLog handle — one per query load — hits this instead of
    * re-parsing an O(dirs) manifest or re-walking a delta chain; resolving
    * the next version after a commit is then one delta applied to the
    * cached predecessor. Bounded by TOTAL cached DirEntry count (states
    * share unchanged entry instances across versions of one table, so the
    * budget overcounts; it is a ceiling, not a working-set estimate),
    * evicting whole states LRU.
    */
  /** Identity of the file a cached state was resolved from (`checkpoint`
    * distinguishes manifest-vs-checkpoint roots — a manifest vacuumed into
    * a checkpoint of identical size/mtime must still read as a change).
    * Compared against a fresh getFileStatus on every shared-cache hit, so
    * another JVM's drop/re-create/vacuum — invisible to this process's
    * invalidation hooks — cannot serve the old history's dirs.
    *
    * Residual envelope, accepted: the identity is (mtime, length), so a
    * cross-JVM drop+re-create whose replacement manifest-v has the SAME
    * byte length AND lands inside the store's mtime granularity tick
    * (1 ms local, up to 1 s on some object stores) is indistinguishable —
    * closing it would cost a content read per validation where this costs
    * one stat. Same trade Delta makes for its log-segment caching; the
    * in-process invalidation hooks cover every same-JVM path exactly.
    */
  private[connector] final case class ManifestId(checkpoint: Boolean,
                                                 mtime: Long, length: Long)

  private val sharedStates =
    new java.util.LinkedHashMap[(String, Long), (Seq[DirEntry], ManifestId)](64, 0.75f, true)
  private var sharedStateEntries = 0L
  // ~64k DirEntry refs ≈ tens of MB retained at stats-heavy width — enough
  // for several 8k-dir tables' hot versions, small next to executor memory
  private val SharedStateEntryBudget = 65536L

  private def cachedState(key: (String, Long)): Option[(Seq[DirEntry], ManifestId)] =
    sharedStates.synchronized(Option(sharedStates.get(key)))

  private def cacheState(key: (String, Long), state: Seq[DirEntry],
                         id: ManifestId): Unit =
    sharedStates.synchronized {
      if (sharedStates.containsKey(key)) return
      sharedStates.put(key, (state, id))
      sharedStateEntries += math.max(1, state.size)
      val it = sharedStates.entrySet().iterator()   // access order: eldest first
      while (sharedStateEntries > SharedStateEntryBudget && sharedStates.size > 1 &&
             it.hasNext) {
        val e = it.next()
        if (e.getKey != key) {
          sharedStateEntries -= math.max(1, e.getValue._1.size)
          it.remove()
        }
      }
    }

  /** Purge every cached state of one table dir (drop, re-create, vacuum;
    * also the seam specs and probes use to force cold resolution).
    */
  private[graft] def invalidateCache(tableDir: String): Unit =
    sharedStates.synchronized {
      val key = dirKey(tableDir)
      val it = sharedStates.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == key) {
          sharedStateEntries -= math.max(1, e.getValue._1.size)
          it.remove()
        }
      }
    }

  /** Marker line of a delta manifest (entries = changes vs the previous
    * version, not the full state). Sits below the meta header (which must
    * stay line 1 for [[parseMetaHeader]]); `#`-prefixed, so entry parsing
    * skips it and pre-delta readers of FULL manifests are unaffected.
    */
  private[connector] val DeltaMarker = "#delta\t1"
  private val DeltaPrefix = "#delta\t"

  /** Removed-dir line of a delta manifest: `#remove<TAB><relDir>`. */
  private[connector] val RemovePrefix = "#remove\t"

  private[connector] def isDelta(manifestContent: String): Boolean =
    manifestContent.linesIterator.exists(_.startsWith(DeltaPrefix))

  /** Every Nth commit of a delta-writing table publishes a full-state
    * checkpoint file, bounding resolution chains to N reads (PLANS.md
    * §manifest-scale holds the measured trade-off).
    */
  private[connector] val CheckpointInterval = 16L

  /** Tables at or under this many dirs always commit FULL manifests: the
    * rewrite is trivially cheap there, and their loads never pay a chain
    * walk — only genuinely wide tables take the delta path.
    */
  private[connector] val FullManifestMaxEntries = 64

  /** One row of [[TableLog.history]]. `operation` = the commit's `#op`
    * marker (None on pre-marker history — markers arrived with the CDC
    * update-type work, so older manifests simply have no record).
    */
  final case class TableVersion(version: Long, timestampMs: Long, dirs: Int,
                                physicalRows: Option[Long], liveRows: Option[Long],
                                operation: Option[String] = None)

  /** What one [[TableLog.vacuum]] run reclaimed. */
  final case class VacuumStats(manifestsDropped: Int, pathsReclaimed: Int)

  /** Manifest meta-header line: `#meta<TAB>{"schema":"<json>","properties":{...}}`.
    * Written by ALTER TABLE, carried forward by every later commit;
    * `#`-prefixed lines are invisible to entry parsing, so pre-evolution
    * manifests (and pre-evolution readers of header-less manifests) are
    * unaffected.
    */
  private[connector] val MetaHeaderPrefix = "#meta\t"

  /** Per-commit operation marker line: `#op<TAB><OPERATION>`. Invisible to
    * entry parsing (`#` lines are skipped) and never carried forward.
    */
  private[connector] val OpPrefix = "#op\t"

  /** Per-commit CDC row-lineage marker lines (mor MERGE commits), both of
    * the form `<prefix><relDir><TAB><relDvFile>`:
    * `#cdcpre` names the pre-image vector holding the commit's
    * update-caused deleted positions of one touched dir (a subset of that
    * dir's vector growth — the rest were WHEN MATCHED DELETEs), and
    * `#cdcpost` names the post-image vector over the commit's STAGED dir
    * marking which staged rows are update post-images (the rest are NOT
    * MATCHED inserts). Invisible to entry parsing, never carried forward,
    * reclaimed by vacuum with their manifest.
    */
  private[connector] val CdcPostPrefix = "#cdcpost\t"
  private[connector] val CdcPrePrefix = "#cdcpre\t"
  // materialized (copy-on-write-exact) commits only: the retraction
  // positions of a REMOVED dir (`#cdcdel dir dv`), and the added dirs
  // whose rows are ALL changes (`#cdcadd dir` — the staged insert dir;
  // every other add of the version is a carryover rewrite the feed skips)
  private[connector] val CdcDelPrefix = "#cdcdel\t"
  private[connector] val CdcAddPrefix = "#cdcadd\t"

  /** Parsed per-commit CDC markers (absolute paths). */
  final case class CdcMarkers(postImageDvByDir: Map[String, String],
                              preImageDvByDir: Map[String, String],
                              deleteDvByDir: Map[String, String] = Map.empty,
                              addDirs: Seq[String] = Nil)

  private[connector] def encodeMetaHeader(meta: (StructType, Map[String, String])): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put("schema", meta._1.json)
    val props = node.putObject("properties")
    meta._2.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    MetaHeaderPrefix + om.writeValueAsString(node)
  }

  private[connector] def parseMetaHeader(manifestContent: String): Option[(StructType, Map[String, String])] =
    manifestContent.linesIterator.nextOption()
      .filter(_.startsWith(MetaHeaderPrefix))
      .map { line =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = om.readTree(line.stripPrefix(MetaHeaderPrefix))
        val schema = DataType.fromJson(node.get("schema").asText()).asInstanceOf[StructType]
        val props = scala.collection.immutable.ListMap.newBuilder[String, String]
        node.get("properties").properties().forEach { e =>
          props += e.getKey -> e.getValue.asText()
        }
        (schema, props.result())
      }

  /** `table.json` layout: first line the schema JSON, then one
    * `key<TAB>value` property per line. Kept line-oriented (not nested JSON)
    * so it can be read without a JSON parser dependency.
    */
  private[connector] def encodeMeta(schema: StructType,
                                    properties: Map[String, String]): String = {
    require(properties.forall { case (k, v) =>
      !k.contains("\t") && !k.contains("\n") && !v.contains("\n") },
      "table properties must not contain tabs or newlines")
    (schema.json +: properties.toSeq.sortBy(_._1).map { case (k, v) => s"$k\t$v" })
      .mkString("", "\n", "\n")
  }

  private[connector] def decodeMeta(s: String): (StructType, Map[String, String]) = {
    val lines = s.linesIterator.toSeq
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val props = lines.tail.filter(_.nonEmpty).map { line =>
      val Array(k, v) = line.split("\t", 2)
      k -> v
    }
    (schema, ListMap(props: _*))
  }
}
