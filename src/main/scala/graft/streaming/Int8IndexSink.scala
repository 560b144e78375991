package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Incremental SQ8 (int8 scalar-quantized) ANN index — the streaming face
  * of `Similarity.int8TopK`, mirroring `AnnIndexSink`'s shape for PQ.
  * Unlike PQ there is NO trained model to freeze: the per-vector symmetric
  * scale is a pure function of each vector, so every micro-batch encodes
  * independently and APPENDS to the persistent `(id, vec, codes, __n2)`
  * table; `topK` runs the shared `Similarity.int8Search` (integer
  * code-cosine shortlist + exact re-rank) over the accumulated index, so
  * stream-fed and batch-built indexes return identical results.
  *
  * Scale shape: state is append-only parquet — no batch rewrites it and
  * encoding cost is O(batch); a search scans only the `codes`/`__n2`
  * columns (parquet pruning keeps full vectors on disk for the shortlist
  * re-rank alone). Replay safety: re-delivered rows encode byte-identically
  * (deterministic per-vector scale) and reads collapse them with a
  * dropDuplicates on id.
  */
class Int8IndexSink(spark: SparkSession, stateDir: String,
                    autoCompactEvery: Int = 0)
    extends Serializable {

  private val codesDir = s"$stateDir/sq8_index"

  // Hadoop FS probe, not java.io.File (cf. NearDupSink: a local-file probe
  // on an HDFS/object-store stateDir silently reports "no state"); data
  // presence means actual parquet data — `_SUCCESS`-only and
  // `_temporary`-only leftovers must not count (see IndexDirs.hasData)
  private def hasState: Boolean = IndexDirs.hasData(spark, codesDir)

  /** Encode one micro-batch and append it — one scan, no join: the encoder
    * carries the source vector through (`keepVec`), so a duplicated id in a
    * replayed batch appends byte-identical rows instead of fanning out
    * through a self-join.
    */
  def process(batch: DataFrame, idCol: String, vecCol: String,
              batchId: Long): Unit = {
    IndexDirs.heal(spark, codesDir)   // a crashed compact may hold state aside
    Similarity.int8Encode(batch, idCol, vecCol, keepVec = true)
      .withColumn("__batch", lit(batchId))
      .write.mode("append").parquet(codesDir)
    // amortized maintenance, same opt-in as the near-dup sinks (foreachBatch
    // executions are serialized — right after the append is between batches)
    if (autoCompactEvery > 0 && batchId % autoCompactEvery == autoCompactEvery - 1)
      compact()
  }

  /** Everything indexed so far, replay-duplicates collapsed. */
  def index(): DataFrame = {
    require(hasState, s"SQ8 index at $codesDir is empty — nothing processed yet")
    spark.read.parquet(codesDir).dropDuplicates("id")
  }

  /** SQ8 top-k over the accumulated index; query ids must be indexed. Same
    * semantics as `Similarity.int8TopK` over the union of all processed
    * batches.
    */
  def topK(queryIds: Seq[Long], k: Int, shortlist: Int = 64): DataFrame = {
    val idx = index().localCheckpoint(true)   // one snapshot feeds scan + re-rank
    Similarity.int8Search(
      idx.select(col("id"), col("codes"), col("__n2")),
      idx.select(col("id").as("vid"), col("vec").as("v")),
      queryIds, k, shortlist)
  }

  /** Fold the per-batch code-table files down to a few, preserving
    * `__batch` and the replay-duplicate rows (dropDuplicates still
    * collapses them on read) — run between micro-batches (see
    * [[IndexDirs.compact]]).
    */
  def compact(targetFiles: Int = 4): Unit =
    IndexDirs.compact(spark, codesDir, None, targetFiles)

  /** Attach as a foreachBatch sink on a stream of embedding rows. */
  def attach[T](ds: Dataset[T], idCol: String, vecCol: String): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      process(batch.toDF(), idCol, vecCol, id)
      ()
    }
}
