package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** Shared engine of the perceptual-hash dedup sinks — the streaming
  * increment of the `simhashPairs` family for any 64-bit perceptual hash
  * ([[ImageNearDupSink]] plugs in dHash, [[AudioNearDupSink]] the audio
  * energy fingerprint), with the same state architecture as the text
  * [[NearDupSink]]: each micro-batch of `(doc_id, media)` rows is hashed,
  * checked against every previously KEPT doc and against itself;
  * near-dup-free survivors pass and only their hash chunks enter state.
  *
  * Scale shape (identical to NearDupSink's, argued there): an APPEND-ONLY
  * parquet chunk index `(chunk, chunk_val, id, hash)` hash-partitioned by
  * `__bucket`; batches probe only the partitions their own chunk values
  * fall in; candidates are popcount-scored from stored 8-byte hashes — no
  * pixels/samples in state, probe cost |candidates| not |corpus|. With
  * `maxHamming <= numChunks - 1` the chunk blocking has pigeonhole-total
  * recall: the candidate PAIRS are exact, never probabilistic.
  *
  * Keep semantics, first-wins like the text sink: a doc drops when it
  * near-duplicates an earlier batch's KEPT doc, or when it is the
  * larger id of ANY intra-batch pair — including a pair whose smaller id
  * was itself dropped (the batch keep-one-per-pair-chain convention
  * NearDupSink documents). On an intra-batch chain a~b, b~c with a !~ c,
  * that drops c where per-doc arrival (batch size 1) would keep it — so
  * the kept set can depend on batch boundaries along chains, exactly as
  * in the text sink; the spec pins stream == the fold with THESE
  * semantics, and equals-the-ideal-fold whenever every pair chain leads
  * through its smallest id (the planted-group fixtures' shape).
  */
abstract class PerceptualNearDupSink(spark: SparkSession, stateDir: String,
                                     maxHamming: Int, numChunks: Int,
                                     numBuckets: Int,
                                     autoCompactEvery: Int = 0)
    extends Serializable {

  require(64 % numChunks == 0, s"numChunks $numChunks must divide 64")
  require(maxHamming <= numChunks - 1,
    s"maxHamming $maxHamming > numChunks - 1 = ${numChunks - 1} breaks the " +
      "pigeonhole recall guarantee (stream and batch would diverge)")

  /** The `(id, simhash)` perceptual-hash frame of one batch of
    * `(doc_id, media)` rows; undecodable payloads yield no row (they pass
    * the gate — they duplicate nothing).
    */
  protected def hashFrame(batch: DataFrame): DataFrame

  private val index = s"$stateDir/chunk_index"
  private val bits = 64 / numChunks

  // state exists only when actual parquet data does: `_SUCCESS`-only
  // (zero-row append) and `_temporary`-only (crashed append) leftovers
  // must not count — see IndexDirs.hasData
  private def hasState: Boolean = IndexDirs.hasData(spark, index)

  /** (chunk, chunk_val, id, hash) rows — the same slicing simhashPairs
    * blocks on, so stream and batch propose identical candidates.
    */
  private def chunked(hashes: DataFrame): DataFrame =
    hashes.select(col("id"), col("simhash"),
        explode(sequence(lit(0), lit(numChunks - 1))).as("chunk"))
      .withColumn("chunk_val",
        expr(s"(simhash >> (chunk * $bits)) & ${(1L << bits) - 1}"))

  /** Process one micro-batch of `(doc_id, media)` rows: returns the kept
    * (near-dup-free) ids, appends their chunk-index entries. Index rows
    * carry the batch id and the probe sees strictly earlier batches only,
    * so checkpoint replay reproduces the original kept set (same fencing
    * as NearDupSink).
    */
  def process(batch: DataFrame, batchId: Long): DataFrame = {
    val hashes = hashFrame(batch).persist()
    val batchChunks = chunked(hashes)
      .withColumn("__bucket", pmod(col("chunk_val"), lit(numBuckets.toLong)))
      .persist()
    try {
      val histDupIds =
        if (hasState) {
          val touched = batchChunks.select("__bucket").distinct()
            .collect().map(_.getLong(0))
          spark.read.parquet(index)
            .filter(col("__bucket").isin(touched.map(Long.box).toSeq: _*))
            .filter(col("__batch") < batchId)
            .select(col("chunk"), col("chunk_val"), col("hash").as("prior_hash"))
            .join(batchChunks, Seq("chunk", "chunk_val"))
            .filter(bit_count(expr("simhash ^ prior_hash")) <= maxHamming)
            .select(col("id")).distinct()
        } else hashes.select(col("id")).limit(0)
      // intra-batch: smaller id wins; chain losers drop with their winner
      // (hashes is already persisted above — the On variant skips the
      // public entry's redundant per-batch localCheckpoint)
      val intraDupIds = Dedup.simhashPairsOn(hashes, maxHamming, numChunks)
        .select(col("id_b").as("id")).distinct()
      val dupIds = histDupIds.unionByName(intraDupIds).distinct()
      // kept starts from the BATCH ids: a non-decodable payload yields no
      // hash row, is no duplicate of anything, and must survive the gate.
      // LAZY localCheckpoint, not eager — the append is the first action:
      // it materializes the blocks and truncates lineage in the same job,
      // one job less per micro-batch (see NearDupSink for why the lineage
      // truncation is load-bearing under in-stream compaction)
      val kept = batch.select(col("doc_id").as("id")).distinct()
        .join(dupIds, Seq("id"), "left_anti")
        .localCheckpoint(false)
      batchChunks.join(kept, Seq("id"), "left_semi")
        .select(col("__bucket"), col("chunk"), col("chunk_val"), col("id"),
          col("simhash").as("hash"), lit(batchId).as("__batch"))
        .write.partitionBy("__bucket").mode("append").parquet(index)
      // amortized maintenance: foreachBatch executions are serialized, so
      // right after the append IS "between micro-batches" — opting in via
      // autoCompactEvery keeps the file count at O(buckets) with no
      // operator intervention
      if (autoCompactEvery > 0 && batchId % autoCompactEvery == autoCompactEvery - 1)
        compact()
      kept
    } finally {
      batchChunks.unpersist(blocking = false)
      hashes.unpersist(blocking = false)
    }
  }

  /** Fold the per-batch chunk-index files to ~one per `__bucket`,
    * preserving the `__batch` replay fence — run between micro-batches
    * (see [[IndexDirs.compact]] for the contract). Probe results and
    * replay fencing are identical before and after.
    */
  def compact(): Unit = IndexDirs.compact(spark, index, Some("__bucket"))

  /** Attach as a foreachBatch sink over a `(doc_id, media)` stream. */
  def attach[T](ds: Dataset[T])
               (onKept: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      onKept(process(batch.toDF(), id), id)
      ()
    }
}

/** Incremental perceptual-hash IMAGE dedup — the streaming increment of
  * [[Multimodal.imageNearDupPairs]]: dHash (BMP byte math / JDK ImageIO
  * for PNG/GIF/JPEG) into the shared [[PerceptualNearDupSink]] engine.
  */
class ImageNearDupSink(spark: SparkSession, stateDir: String,
                       maxHamming: Int = 3, numChunks: Int = 4,
                       numBuckets: Int = 16, autoCompactEvery: Int = 0)
    extends PerceptualNearDupSink(spark, stateDir, maxHamming, numChunks,
      numBuckets, autoCompactEvery) {

  protected def hashFrame(batch: DataFrame): DataFrame =
    Multimodal.dHash64(spark, batch)
}

/** Incremental perceptual-hash AUDIO dedup — the streaming increment of
  * [[Multimodal.audioNearDupPairs]]: the PCM energy-difference
  * fingerprint into the shared [[PerceptualNearDupSink]] engine.
  */
class AudioNearDupSink(spark: SparkSession, stateDir: String,
                       maxHamming: Int = 3, numChunks: Int = 4,
                       numBuckets: Int = 16, autoCompactEvery: Int = 0)
    extends PerceptualNearDupSink(spark, stateDir, maxHamming, numChunks,
      numBuckets, autoCompactEvery) {

  protected def hashFrame(batch: DataFrame): DataFrame =
    Multimodal.audioFingerprint64(spark, batch)
}
