package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Upsert

/** The engine's merge sink (S6 streaming form): each micro-batch of upsert
  * events is folded into a persistent "current state" table with
  * latest-wins semantics — the table-format-free equivalent of MERGE INTO.
  *
  * State is hash-partitioned into `numBuckets` key buckets, and a
  * micro-batch rewrites ONLY the buckets its keys fall in — O(touched
  * state), not O(state), per batch (the reference likewise updates only the
  * block's keys, engine/post_storage.py:68-71). WHERE the buckets live and
  * how a commit becomes visible is the [[UpsertStateStore]] backend:
  * [[BucketSwapStore]] (default) swaps `current/__bucket=k/` directories in
  * place; [[SnapshotStore]] writes immutable bucket dirs behind a versioned
  * manifest + atomic pointer, giving concurrent readers snapshot isolation —
  * the lakehouse-MERGE shape (the reference's durability contract is a
  * transactional per-block upsert, stream_blocks.py:108-115); and
  * [[CatalogMergeStore]] persists through an actual SQL `MERGE INTO` against
  * a [[graft.connector.GraftCatalog]] table (DSv2 row-level operations) —
  * the table-format MERGE backend, with a Delta/Iceberg target droppable in
  * behind the same trait.
  *
  * Combined with checkpointing (exactly-once micro-batches) the fold is
  * idempotent: replaying a batch re-merges the same rows onto state that
  * already contains them and changes nothing — which is what makes every
  * store's crash recovery safe: an interrupted install is healed by replay.
  */
class UpsertSink(spark: SparkSession, stateDir: String,
                 keys: Seq[String], seqCol: String, opCol: String,
                 numBuckets: Int = 16,
                 backend: UpsertSink.Backend = UpsertSink.BucketSwap)
    extends Serializable {

  import UpsertSink.{BucketCol, DeletedState, SeqState}

  // the state table owns these names; a user column sharing one would
  // silently corrupt the fold (e.g. withColumn(seqCol, col(SeqState)) is a
  // no-op overwrite when seqCol == "__seq")
  require(!(keys :+ seqCol :+ opCol).exists(UpsertSink.Reserved.contains),
    s"key/seq/op columns must not use reserved names ${UpsertSink.Reserved.mkString(", ")}")

  private val store: UpsertStateStore = backend match {
    case UpsertSink.BucketSwap => new BucketSwapStore(spark, stateDir)
    case UpsertSink.Snapshot => new SnapshotStore(spark, stateDir)
    case UpsertSink.CatalogMerge => new CatalogMergeStore(spark, stateDir, keys)
    case UpsertSink.CatalogMergeMor =>
      new CatalogMergeStore(spark, stateDir, keys, mergeOnRead = true)
  }

  /** Stable key bucket: Murmur3 over the key columns, identical for a key on
    * the batch side and in the state layout.
    */
  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  def state(): DataFrame = {
    store.recover()
    if (store.hasState)
      store.read(None).map(_
        .filter(!col(DeletedState))
        .drop(BucketCol, SeqState, DeletedState))
        .getOrElse(spark.emptyDataFrame)
    else spark.emptyDataFrame
  }

  /** Merge one micro-batch of upsert-log rows into the state table,
    * rewriting only the key buckets the batch touches.
    *
    * The state carries two bookkeeping columns per key so that CROSS-batch
    * out-of-order delivery reproduces full-log compaction: `__seq` — the
    * highest seq ever applied to the key — lets existing state re-enter the
    * fold at its TRUE position (re-entering at seq −inf would let any late
    * event in a later micro-batch overwrite newer state); and `__deleted`
    * tombstones keep a trailing delete's seq, so a late upsert older than
    * the delete stays dead instead of resurrecting the key. With those two,
    * a late row's columns merge exactly where the full-log window would
    * have put them.
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val clash = batch.columns.filter(UpsertSink.Reserved.contains)
    require(clash.isEmpty,
      s"batch carries reserved state-bookkeeping column(s) ${clash.mkString(", ")}")
    store.recover()
    val b = withBucket(batch)
    val touched = b.select(BucketCol).distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val existing =
      if (store.hasState)
        // only the touched buckets re-enter the fold, at their stored seq
        store.read(Some(touched.toSeq)).map(_
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
    store.commit(next, touched.toSeq, batchId)
  }

  /** Attach as a foreachBatch sink on a stream of upsert-log rows. */
  def attach[T](ds: Dataset[T]): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      merge(batch.toDF(), id)
      ()
    }
}

object UpsertSink {
  /** State-bookkeeping column names the sink owns (see the constructor
    * guard). `__bpart` is the SnapshotStore's transient staging partition
    * column.
    */
  val Reserved: Set[String] = Set("__seq", "__deleted", "__bucket", "__bpart")

  private[streaming] val BucketCol = "__bucket"
  private[streaming] val PartCol = "__bpart"
  private[streaming] val SeqState = "__seq"
  private[streaming] val DeletedState = "__deleted"

  /** Which [[UpsertStateStore]] a sink persists through. */
  sealed trait Backend extends Serializable
  /** In-place `current/__bucket=k/` directory swap (zero-dependency default). */
  case object BucketSwap extends Backend
  /** Immutable bucket dirs + versioned manifest + atomic `_latest` pointer:
    * snapshot isolation for concurrent readers, object-store-safe publish.
    */
  case object Snapshot extends Backend
  /** State lives in a [[graft.connector.GraftCatalog]] table and each batch
    * installs through a real SQL `MERGE INTO` (DSv2 row-level op) — full
    * lakehouse transaction semantics, O(state) rewrite per batch.
    */
  case object CatalogMerge extends Backend
  /** [[CatalogMerge]] with the table in merge-on-read mode: a batch writes
    * deletion vectors over the matched rows plus ONE appended dir of new
    * state instead of rewriting bucket dirs — O(batch) written per batch,
    * with `compact()` as the amortized maintenance that purges vectors.
    */
  case object CatalogMergeMor extends Backend
}
