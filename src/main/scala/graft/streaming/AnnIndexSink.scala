package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Incremental PQ-ANN index — the streaming face of `Similarity.pqTopK`
  * (north-star extension): the codebook is trained ONCE on a reference
  * corpus and frozen; each micro-batch of embedding rows is encoded with
  * that frozen model and APPENDED to a persistent code table; `topK`
  * searches whatever has been indexed so far with the same ADC-shortlist +
  * exact-re-rank math as the batch path (shared `Similarity.pqSearch`), so
  * stream-fed and batch-built indexes return identical results — the
  * mirror of NearDupSink's shape for ANN.
  *
  * Scale shape:
  *  - the state is APPEND-ONLY parquet `(id, vec, codes, __batch)` — no
  *    batch ever rewrites it; encoding cost is O(batch), independent of the
  *    accumulated index size;
  *  - a search scans only the `codes` column (m code bytes per vector —
  *    parquet column pruning keeps the full vectors on disk) with a bounded
  *    per-partition heap per query; the exact re-rank reads `vec` for the
  *    shortlist rows alone, via the id join;
  *  - the frozen model is a few KB in the task closure, like the IVF
  *    codebook. (Codebook drift under distribution shift is the operator's
  *    retrain-and-rebuild decision, exactly as for a production IVF/PQ
  *    index.)
  *
  * Replay safety: an at-least-once re-delivery appends byte-identical rows
  * (same frozen model, same ids — encode is deterministic); reads collapse
  * them with a dropDuplicates on id, so a crash between append and
  * checkpoint commit cannot skew search results.
  */
class AnnIndexSink(spark: SparkSession, stateDir: String,
                   model: Similarity.PqModel, autoCompactEvery: Int = 0)
    extends Serializable {

  private val codesDir = s"$stateDir/pq_index"

  // Hadoop FS probe, not java.io.File (cf. NearDupSink: a local-file probe
  // on an HDFS/object-store stateDir silently reports "no state"); data
  // presence means actual parquet data — `_SUCCESS`-only and
  // `_temporary`-only leftovers must not count (see IndexDirs.hasData)
  private def hasState: Boolean = IndexDirs.hasData(spark, codesDir)

  /** Encode one micro-batch with the frozen model and append it. */
  def process(batch: DataFrame, idCol: String, vecCol: String,
              batchId: Long): Unit = {
    IndexDirs.heal(spark, codesDir)   // a crashed compact may hold state aside
    import spark.implicits._
    val m = model
    batch.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(Long, Seq[Double])]
      .mapPartitions(_.map { case (id, raw) => (id, raw, m.encode(raw).toSeq) })
      .toDF("id", "vec", "codes")
      .withColumn("__batch", lit(batchId))
      .write.mode("append").parquet(codesDir)
    // amortized maintenance, same opt-in as the near-dup sinks (foreachBatch
    // executions are serialized — right after the append is between batches)
    if (autoCompactEvery > 0 && batchId % autoCompactEvery == autoCompactEvery - 1)
      compact()
  }

  /** Everything indexed so far (id, vec, codes), replay-duplicates collapsed. */
  def index(): DataFrame = {
    require(hasState, s"ANN index at $codesDir is empty — nothing processed yet")
    spark.read.parquet(codesDir).dropDuplicates("id")
  }

  /** PQ top-k over the accumulated index; query ids must be indexed. Same
    * semantics as `Similarity.pqTopK` over the union of all processed
    * batches.
    */
  def topK(queryIds: Seq[Long], k: Int, shortlist: Int = 64): DataFrame = {
    import spark.implicits._
    val idx = index().localCheckpoint(true)   // one snapshot feeds page+scan+re-rank
    val qPage: Array[(Long, Seq[Double])] = idx
      .filter(col("id").isin(queryIds: _*))
      .select(col("id"), col("vec"))
      .as[(Long, Seq[Double])].collect()
    require(qPage.length == queryIds.distinct.length,
      s"only ${qPage.length} of ${queryIds.distinct.length} query ids are indexed: " +
        s"missing ${queryIds.distinct.filterNot(qPage.map(_._1).toSet).mkString(",")}")
    Similarity.pqSearch(
      idx.select(col("id"), col("codes")),
      idx.select(col("id").as("vid"), col("vec").as("v")),
      qPage, k, shortlist, model)
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
