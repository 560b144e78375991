package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Incremental MinHash-LSH near-duplicate dedup — the streaming increment of
  * `Dedup.minhashNearDupPairs` (north-star extension): each micro-batch of
  * documents is checked against every previously KEPT document and against
  * itself; only near-dup-free survivors pass, and only their signatures are
  * added to the state.
  *
  * Scale shape (the part that must survive 100 TB of accumulated corpus):
  *  - the state is an APPEND-ONLY parquet band index `(band_hash, id, sig)`,
  *    hash-partitioned by `__bucket = band_hash % numBuckets` — no batch ever
  *    rewrites it (contrast UpsertSink, whose state mutates);
  *  - a batch probes the state by equi-join on band_hash AFTER pruning to
  *    the `__bucket` partitions its own band hashes fall in — small batches
  *    read a few partition directories, never the whole index;
  *  - candidates are est-Jaccard-scored from the stored signatures (no text
  *    is kept in state), so probe cost is |candidates|, not |corpus|.
  *
  * Dedup is first-wins, like `StreamOps.dedupStream`: an earlier batch's kept
  * doc beats a later near-duplicate; within a batch the smaller id wins
  * (deterministic). A doc dropped as a near-dup does NOT enter the index, so
  * a chain A~B~C (A kept) drops B and keeps C only if C is genuinely far
  * from A — matching the batch keep-one-per-cluster convention.
  */
class NearDupSink(spark: SparkSession, stateDir: String,
                  threshold: Double, numHashes: Int = 32, numBands: Int = 16,
                  numBuckets: Int = 16, autoCompactEvery: Int = 0)
    extends Serializable {

  require(numBands >= 1 && numHashes / numBands >= 1,
    s"numBands $numBands must leave >= 1 signature row per band at $numHashes hashes")

  private val index = s"$stateDir/band_index"

  // Hadoop FS probe, not java.io.File: on an HDFS/object-store stateDir a
  // local-file probe is always false, silently disabling every historical
  // near-dup check (cf. UpsertSink.fs)
  // state exists only when actual parquet data does: `_SUCCESS`-only
  // (zero-row append) and `_temporary`-only (crashed append) leftovers
  // must not count — see IndexDirs.hasData
  private def hasState: Boolean = IndexDirs.hasData(spark, index)

  /** (band_hash, id, sig) rows for a signature frame — the SAME banding
    * layout as batch LSH (`Dedup.bandHashes`), so stream and batch propose
    * identical candidates. */
  private def banded(sigs: DataFrame): DataFrame =
    Dedup.bandHashes(sigs, numBands)
      .join(sigs, Seq("id"))
      .select(col("band_hash"), col("id"), col("sig"))

  private def estJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Dedup.estJaccard(a, b)

  /** Process one micro-batch of (idCol, textCol) rows: returns the kept
    * (near-dup-free) ids and appends their band index entries to state.
    *
    * Index rows carry the writing batch id, and the historical probe only
    * sees STRICTLY EARLIER batches — so a checkpoint-replayed batch (crash
    * between append and commit) reproduces its original kept set instead of
    * matching its own half-written entries and dropping everything.
    */
  def process(batch: DataFrame, idCol: String, textCol: String,
              batchId: Long): DataFrame = {
    val sigs = Dedup.minhashSignatures(batch, idCol, textCol, numHashes)
      .persist()
    val batchBands = banded(sigs)
      .withColumn("__bucket", pmod(col("band_hash"), lit(numBuckets.toLong)))
      .persist()
    try {
      // historical dups: probe ONLY the state partitions this batch's band
      // hashes fall in (partition pruning via the isin filter)
      val histDupIds =
        if (hasState) {
          val touched = batchBands.select("__bucket").distinct()
            .collect().map(_.getLong(0))
          spark.read.parquet(index)
            .filter(col("__bucket").isin(touched.map(Long.box).toSeq: _*))
            .filter(col("__batch") < batchId)
            .select(col("band_hash"), col("id").as("prior_id"), col("sig").as("prior_sig"))
            .join(batchBands, Seq("band_hash"))
            .filter(estJaccard(col("sig"), col("prior_sig")) >= threshold)
            .select(col("id")).distinct()
        } else sigs.select(col("id")).limit(0)
      // intra-batch dups: smaller id wins (first-wins convention); a loser
      // whose winner was itself a historical dup still drops — its near-dup
      // chain leads to an already-kept prior doc, the batch
      // keep-one-per-pair-chain convention
      // sigs is already persisted above — the On variant skips the public
      // entry's redundant per-batch localCheckpoint
      val intraDupIds = Dedup.minhashCandidatePairsOn(sigs, numBands)
        .filter(col("est_jaccard") >= threshold)
        .select(col("id_b").as("id")).distinct()
      val dupIds = histDupIds.unionByName(intraDupIds).distinct()
      // kept starts from the BATCH ids, not the signature frame: a
      // zero-token (empty/whitespace) doc yields no signature row, but it
      // is not a duplicate of anything and must survive the gate.
      // LAZY localCheckpoint, not eager (round 21): the append below is the
      // first action — it materializes the blocks and Spark truncates the
      // lineage at that job's end, so the dedicated per-batch
      // materialization job disappears while the caller still reads
      // executor-pinned blocks with NO live lineage into the state files
      // (an in-stream compact() deletes them; a lazily-persisted plan
      // recomputing through the old listing would FileNotFound — measured
      // in IndexCompactionSpec).
      val kept = batch.select(col(idCol).as("id")).distinct()
        .join(dupIds, Seq("id"), "left_anti")
        .localCheckpoint(false)
      // append ONLY survivors' index entries; state never rewrites
      batchBands.join(kept, Seq("id"), "left_semi")
        .select(col("__bucket"), col("band_hash"), col("id"), col("sig"),
          lit(batchId).as("__batch"))
        .write.partitionBy("__bucket").mode("append").parquet(index)
      // amortized maintenance, same opt-in as the perceptual sinks:
      // foreachBatch executions are serialized, so right after the append
      // IS "between micro-batches" — a long-running text-dedup stream then
      // caps its own file count at O(buckets) with no operator cron
      if (autoCompactEvery > 0 && batchId % autoCompactEvery == autoCompactEvery - 1)
        compact()
      kept
    } finally {
      batchBands.unpersist(blocking = false)
      sigs.unpersist(blocking = false)
    }
  }

  /** Fold the per-batch band-index files to ~one per `__bucket`,
    * preserving the `__batch` replay fence — run between micro-batches
    * (see [[IndexDirs.compact]] for the contract). Probe results and
    * replay fencing are identical before and after.
    */
  def compact(): Unit = IndexDirs.compact(spark, index, Some("__bucket"))

  /** Attach as a foreachBatch sink: `onKept` receives the surviving ids of
    * each micro-batch (join back to the payload stream downstream).
    */
  def attach[T](ds: Dataset[T], idCol: String, textCol: String)
               (onKept: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      onKept(process(batch.toDF(), idCol, textCol, id), id)
      ()
    }
}
