package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Upsert

/** The engine's merge sink (S6 streaming form): each micro-batch of upsert
  * events is folded into a persistent "current state" parquet table —
  * read-merge-rewrite with latest-wins semantics, the table-format-free
  * equivalent of a MERGE INTO. Combined with checkpointing (exactly-once
  * micro-batches) the fold is idempotent: replaying a batch re-merges the
  * same rows onto state that already contains them and changes nothing.
  *
  * At cluster scale the same `merge` body targets a real lakehouse MERGE
  * (Delta/Iceberg) or is partitioned so only touched partitions rewrite;
  * the foreachBatch shape is identical.
  */
class UpsertSink(spark: SparkSession, stateDir: String,
                 keys: Seq[String], seqCol: String, opCol: String)
    extends Serializable {

  private val current = s"$stateDir/current"
  private val staging = s"$stateDir/staging"

  def state(): DataFrame =
    if (new java.io.File(current).exists()) spark.read.parquet(current)
    else spark.emptyDataFrame

  /** Merge one micro-batch of upsert-log rows into the state table. */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val existing =
      if (new java.io.File(current).exists())
        // existing state re-enters the fold as seq -inf upserts
        Some(spark.read.parquet(current)
          .withColumn(seqCol, lit(Long.MinValue))
          .withColumn(opCol, lit("upsert")))
      else None
    val log = existing.map(_.unionByName(batch)).getOrElse(batch)
    val next = Upsert.compactLog(log, keys, seqCol, opCol)
    // rewrite via staging dir: the batch is atomic at the directory-rename
    // level (a real deployment uses a table format's transaction instead)
    next.write.mode("overwrite").parquet(staging)
    val cur = new java.io.File(current)
    if (cur.exists()) {
      val old = new java.io.File(s"$stateDir/old-$batchId")
      cur.renameTo(old)
      new java.io.File(staging).renameTo(cur)
      delete(old)
    } else {
      new java.io.File(staging).renameTo(cur)
    }
  }

  /** Attach as a foreachBatch sink on a stream of upsert-log rows. */
  def attach[T](ds: Dataset[T]): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      merge(batch.toDF(), id)
      ()
    }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
  }
}
