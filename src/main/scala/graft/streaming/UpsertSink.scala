package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Upsert

/** The engine's merge sink (S6 streaming form): each micro-batch of upsert
  * events is folded into a persistent "current state" parquet table with
  * latest-wins semantics — the table-format-free equivalent of MERGE INTO.
  *
  * State is hash-partitioned into `numBuckets` key buckets
  * (`current/__bucket=k/`), and a micro-batch rewrites ONLY the buckets its
  * keys fall in — O(touched state), not O(state), per batch (the reference
  * likewise updates only the block's keys, engine/post_storage.py:68-71).
  * Untouched bucket directories are never opened or rewritten, which a spec
  * asserts byte-for-byte.
  *
  * Combined with checkpointing (exactly-once micro-batches) the fold is
  * idempotent: replaying a batch re-merges the same rows onto state that
  * already contains them and changes nothing — which also makes the
  * per-bucket directory swap safe: a crash between bucket swaps is healed by
  * the replay. At cluster scale the same foreachBatch body targets a
  * lakehouse MERGE (Delta/Iceberg) with identical shape.
  */
class UpsertSink(spark: SparkSession, stateDir: String,
                 keys: Seq[String], seqCol: String, opCol: String,
                 numBuckets: Int = 16)
    extends Serializable {

  private val current = s"$stateDir/current"
  private val staging = s"$stateDir/staging"
  private val BucketCol = "__bucket"

  // the state parquet owns these names; a user column sharing one would
  // silently corrupt the fold (e.g. withColumn(seqCol, col(SeqState)) is a
  // no-op overwrite when seqCol == "__seq")
  require(!(keys :+ seqCol :+ opCol).exists(UpsertSink.Reserved.contains),
    s"key/seq/op columns must not use reserved names ${UpsertSink.Reserved.mkString(", ")}")

  /** All directory surgery goes through the Hadoop FileSystem API, so the
    * sink works unchanged on HDFS and on the local FS (tests). Directory
    * rename is atomic on HDFS and POSIX; on object stores (S3) rename is
    * copy+delete — there, target the documented lakehouse MERGE instead.
    */
  private def fs: FileSystem =
    new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stable key bucket: Murmur3 over the key columns, identical for a key on
    * the batch side and in the state layout.
    */
  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  private def hasState: Boolean = {
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
  private def recover(): Unit = {
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

  private val SeqState = "__seq"
  private val DeletedState = "__deleted"

  def state(): DataFrame = {
    recover()
    if (hasState) spark.read.parquet(current)
      .filter(!col(DeletedState))
      .drop(BucketCol, SeqState, DeletedState)
    else spark.emptyDataFrame
  }

  /** Merge one micro-batch of upsert-log rows into the state table,
    * rewriting only the key buckets the batch touches.
    *
    * The state parquet carries two bookkeeping columns per key so that
    * CROSS-batch out-of-order delivery reproduces full-log compaction:
    * `__seq` — the highest seq ever applied to the key — lets existing
    * state re-enter the fold at its TRUE position (re-entering at seq −inf
    * would let any late event in a later micro-batch overwrite newer
    * state); and `__deleted` tombstones keep a trailing delete's seq, so a
    * late upsert older than the delete stays dead instead of resurrecting
    * the key. With those two, a late row's columns merge exactly where the
    * full-log window would have put them.
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val clash = batch.columns.filter(UpsertSink.Reserved.contains)
    require(clash.isEmpty,
      s"batch carries reserved state-bookkeeping column(s) ${clash.mkString(", ")}")
    recover()
    val b = withBucket(batch)
    val touched = b.select(BucketCol).distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val existing =
      if (hasState)
        // only the touched partitions re-enter the fold, at their stored
        // seq; the isin filter prunes to those partition directories
        Some(spark.read.parquet(current)
          .filter(col(BucketCol).isin(touched.map(Int.box).toSeq: _*))
          .withColumn(seqCol, col(SeqState))
          .withColumn(opCol, when(col(DeletedState), "delete").otherwise("upsert"))
          .drop(SeqState, DeletedState))
      else None
    val log = existing.map(_.unionByName(b)).getOrElse(b)
    // __bucket is functionally dependent on the keys, so it survives the
    // per-key compaction unchanged
    val groupCols = (keys :+ BucketCol).map(col)
    val maxSeq = log.groupBy(groupCols: _*).agg(max(col(seqCol)).as(SeqState))
    val compacted = Upsert.compactLog(log, keys, seqCol, opCol)
      .join(maxSeq.drop(BucketCol), keys)
      .withColumn(DeletedState, lit(false))
    // keys present in the log but absent from the compacted output ended in
    // a delete — persist them as tombstones (all data columns null)
    val dataCols = log.columns.filterNot(c =>
      keys.contains(c) || c == BucketCol || c == seqCol || c == opCol)
    val tombstones = maxSeq
      .join(compacted.select(keys.map(col): _*), keys, "left_anti")
      .select((keys :+ BucketCol).map(col) ++
        dataCols.map(c => lit(null).cast(log.schema(c).dataType).as(c)) :+
        col(SeqState) :+ lit(true).as(DeletedState): _*)
    val next = compacted.unionByName(tombstones)
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

  /** Attach as a foreachBatch sink on a stream of upsert-log rows. */
  def attach[T](ds: Dataset[T]): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      merge(batch.toDF(), id)
      ()
    }
}

object UpsertSink {
  /** State-bookkeeping column names the sink owns (see the constructor guard). */
  val Reserved: Set[String] = Set("__seq", "__deleted", "__bucket")
}
