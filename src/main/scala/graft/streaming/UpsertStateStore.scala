package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage backend for [[UpsertSink]]: where the folded current-state table
  * lives and how a batch's rewritten key buckets are installed. The sink owns
  * the MERGE fold (latest-wins compaction, tombstones, seq fencing); a store
  * only persists `(data columns, __bucket, __seq, __deleted)` rows and must
  * make each commit atomic-per-bucket and crash-recoverable, because the
  * checkpointed micro-batch replay is the healing mechanism.
  */
trait UpsertStateStore extends Serializable {

  /** Heal any half-done install left by a crashed commit (called before
    * every read/merge).
    */
  def recover(): Unit

  /** True when committed state exists. */
  def hasState: Boolean

  /** Current state including the bookkeeping columns, pruned to the
    * `touched` buckets (None = all buckets). None when no listed bucket has
    * stored state (callers must not invent a schema for "empty").
    */
  def read(touched: Option[Seq[Int]]): Option[DataFrame]

  /** Install the rewritten `touched` buckets from `next` (which carries
    * every surviving row of exactly those buckets). Buckets not in
    * `touched` must remain untouched on storage.
    */
  def commit(next: DataFrame, touched: Seq[Int], batchId: Long): Unit
}

/** The zero-dependency default: state hash-partitioned into
  * `current/__bucket=k/` directories, each commit staging its touched
  * buckets and swapping them in with install-first/delete-last renames.
  * In-place: a reader concurrent with a swap can observe a bucket
  * mid-flight — single-process deployments (the reference's shape,
  * stream_blocks.py:108-115 upserts inside one block txn) and tests.
  */
class BucketSwapStore(spark: SparkSession, stateDir: String)
    extends UpsertStateStore {
  import UpsertSink.BucketCol

  private val current = s"$stateDir/current"
  private val staging = s"$stateDir/staging"

  /** All directory surgery goes through the Hadoop FileSystem API, so the
    * store works unchanged on HDFS and on the local FS (tests). Directory
    * rename is atomic on HDFS and POSIX; on object stores (S3) rename is
    * copy+delete — there, use [[SnapshotStore]] (pointer-swap publish) or a
    * lakehouse MERGE.
    */
  private def fs: FileSystem =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def hasState: Boolean = {
    val d = new Path(current)
    fs.exists(d) && fs.listStatus(d).nonEmpty
  }

  /** Crash recovery for the install-first/delete-last bucket swap below: a
    * leftover `old-<batch>-<k>` dir means a crash interrupted a swap. If the
    * bucket's current dir is missing, the crash hit between moving the old
    * data aside and installing the staged replacement — move the old data
    * back (the checkpointed batch will replay and redo the merge). If the
    * current dir exists, the install completed — the old copy is garbage.
    */
  def recover(): Unit = {
    val root = new Path(stateDir)
    if (!fs.exists(root)) return
    val leftovers = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("old-"))
    leftovers.foreach { old =>
      val name = old.getPath.getName
      val k = name.substring(name.lastIndexOf('-') + 1)
      val curPart = new Path(s"$current/$BucketCol=$k")
      if (!fs.exists(curPart)) {
        fs.mkdirs(new Path(current))
        renameOrThrow(old.getPath, curPart)
      }
      else fs.delete(old.getPath, true)
    }
  }

  /** Hadoop FileSystem.rename reports failure by RETURNING FALSE (it also
    * moves src UNDER an existing dst directory instead of failing flat, the
    * way java.io.File.renameTo did) — a discarded false here would let the
    * next rename nest new state inside stale state and silently serve old
    * rows. Every swap rename must therefore be checked and fail loudly;
    * recover() + checkpointed replay heal the interrupted swap on restart.
    */
  private def renameOrThrow(src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  def read(touched: Option[Seq[Int]]): Option[DataFrame] = {
    val df = spark.read.parquet(current)
    Some(touched match {
      // the isin filter prunes to exactly those partition directories
      case Some(ks) => df.filter(col(BucketCol).isin(ks.map(Int.box): _*))
      case None => df
    })
  }

  def commit(next: DataFrame, touched: Seq[Int], batchId: Long): Unit = {
    next.write.partitionBy(BucketCol).mode("overwrite").parquet(staging)
    // swap ONLY the touched bucket directories; every other bucket's files
    // are left untouched on disk. Order is install-first/delete-last: the
    // current data is moved aside (rename, not delete), the staged
    // replacement installed, and only then the old copy removed — a crash at
    // any point leaves either the old or the new data in place, and
    // recover() + checkpointed replay heals the half-done swap.
    fs.mkdirs(new Path(current))
    touched.foreach { k =>
      val stagePart = new Path(s"$staging/$BucketCol=$k")
      val curPart = new Path(s"$current/$BucketCol=$k")
      val old = new Path(s"$stateDir/old-$batchId-$k")
      if (fs.exists(curPart)) renameOrThrow(curPart, old)
      // a bucket whose keys were all deleted has no staging output — the
      // bucket directory simply disappears
      if (fs.exists(stagePart)) renameOrThrow(stagePart, curPart)
      if (fs.exists(old)) fs.delete(old, true)
    }
    fs.delete(new Path(staging), true)
  }
}

/** Versioned-manifest store: the mini-lakehouse shape of MERGE. Bucket data
  * dirs are IMMUTABLE (`data/b<k>-<batch>/`, the bucket id stored as a
  * regular column); each commit writes the touched buckets as NEW dirs,
  * writes `manifest-<v+1>` mapping every live bucket to its dir, and
  * atomically publishes the `_latest` pointer. Readers resolve the pointer
  * once and then read only immutable files — SNAPSHOT ISOLATION for readers
  * concurrent with writes (what Delta/Iceberg MERGE gives on a shared
  * lakehouse, and what the in-place bucket swap cannot), while writes stay
  * O(touched buckets). Superseded dirs/manifests stay until [[vacuum]], so
  * an in-flight reader's snapshot never disappears under it. The only
  * rename that must be atomic is the single `_latest` pointer file —
  * object-store safe, unlike directory swap.
  */
class SnapshotStore(spark: SparkSession, stateDir: String)
    extends UpsertStateStore {
  import UpsertSink.{BucketCol, PartCol}

  private def fs: FileSystem =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val latestPath = new Path(stateDir, "_latest")
  private def manifestPath(v: Long) = new Path(stateDir, s"manifest-$v")

  /** Read a small control file fully (a single read() may short-read). */
  private def slurp(p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream(64)
      val bytes = new Array[Byte](256)
      var n = in.read(bytes)
      while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def latestVersion: Option[Long] =
    if (!fs.exists(latestPath)) None
    else try Some(slurp(latestPath).trim.toLong)
    catch { case _: NumberFormatException => None }

  /** bucket -> immutable data dir, one `k<TAB>path` line per bucket. */
  private def readManifest(v: Long): Map[Int, String] =
    slurp(manifestPath(v)).linesIterator.filter(_.nonEmpty).map { line =>
      val Array(k, path) = line.split("\t", 2)
      k.toInt -> path
    }.toMap

  def hasState: Boolean = latestVersion.exists(v => readManifest(v).nonEmpty)

  /** Nothing to heal: data dirs and the manifest become visible only through
    * the atomic `_latest` publish, so a crash mid-commit leaves the previous
    * version intact and at worst some unreferenced attempt dirs (each
    * attempt writes under fresh names and is reclaimed by vacuum).
    */
  def recover(): Unit = ()

  def read(touched: Option[Seq[Int]]): Option[DataFrame] = {
    val m = latestVersion.map(readManifest).getOrElse(Map.empty)
    // path-level pruning: untouched buckets' files are never even listed
    // (the manifest is the partition index)
    val paths = touched match {
      case Some(ks) => ks.flatMap(m.get)
      case None => m.values.toSeq
    }
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  def commit(next: DataFrame, touched: Seq[Int], batchId: Long): Unit = {
    val v = latestVersion.getOrElse(0L)
    val base = latestVersion.map(readManifest).getOrElse(Map.empty)
    // stage the touched buckets in one write; PartCol duplicates the bucket
    // id into the directory layout while BucketCol stays a regular column
    // inside the files (the data dirs are renamed out of the partitioned
    // layout, so the column must travel IN the data)
    val stagingDir = s"$stateDir/staging-$batchId"
    next.withColumn(PartCol, col(BucketCol))
      .write.partitionBy(PartCol).mode("overwrite").parquet(stagingDir)
    var m2 = base
    // attempt-unique suffix: a REPLAYED batch (publish succeeded but the
    // crash landed before the streaming checkpoint recorded it) must not
    // touch the dirs its previous attempt published — manifest v still
    // references them, and a reader pinned to v (the snapshot isolation this
    // store advertises) would lose its data mid-scan. New names every
    // attempt means commit never deletes and never renames onto a live
    // path; superseded/orphaned attempt dirs are reclaimed by vacuum().
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    touched.foreach { k =>
      val stagePart = new Path(s"$stagingDir/$PartCol=$k")
      if (fs.exists(stagePart)) {
        val dst = new Path(s"$stateDir/data/b$k-$batchId-$attempt")
        fs.mkdirs(dst.getParent)
        if (!fs.rename(stagePart, dst))
          throw new java.io.IOException(s"rename failed: $stagePart -> $dst")
        m2 += (k -> dst.toString)
      } else m2 -= k   // every key in the bucket was deleted
    }
    val mp = manifestPath(v + 1)
    if (fs.exists(mp)) fs.delete(mp, false)   // crashed-replay leftover
    val out = fs.create(mp, true)
    try out.write(m2.toSeq.sortBy(_._1)
      .map { case (k, p) => s"$k\t$p" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    // atomic publish: readers see version v or v+1, never a torn state
    val tmp = new Path(stateDir,
      "_latest.tmp." + java.util.UUID.randomUUID().toString)
    val tout = fs.create(tmp, true)
    try tout.write((v + 1).toString.getBytes("UTF-8")) finally tout.close()
    FileContext.getFileContext(latestPath.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, latestPath, Options.Rename.OVERWRITE)
    fs.delete(new Path(stagingDir), true)
  }

  /** Reclaim storage: drop all but the newest `keepVersions` manifests and
    * every data dir none of the survivors reference. Run OUTSIDE the reader
    * SLA window — a reader pinned to a vacuumed version loses its snapshot
    * (the same contract as Delta VACUUM).
    */
  def vacuum(keepVersions: Int = 2): Unit = {
    val v = latestVersion.getOrElse(return)
    val all = fs.listStatus(new Path(stateDir)).toSeq.map(_.getPath)
    val manifests = all.filter(_.getName.startsWith("manifest-"))
      .map(p => p.getName.stripPrefix("manifest-").toLong -> p)
    val (kept, dropped) = manifests.partition(_._1 > v - keepVersions)
    // compare by terminal dir name (b<k>-<batch>, unique per commit):
    // listStatus returns scheme-qualified paths (file:/...), manifest lines
    // store them as written — a string compare of full paths never matches
    val live: Set[String] = kept.flatMap { case (mv, _) =>
      readManifest(mv).values.map(p => new Path(p).getName) }.toSet
    dropped.foreach { case (_, p) => fs.delete(p, false) }
    val dataRoot = new Path(stateDir, "data")
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).toSeq.map(_.getPath)
        .filterNot(p => live.contains(p.getName))
        .foreach(p => fs.delete(p, true))
  }
}
