package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared state-directory probing for the append-only parquet index sinks
  * ([[NearDupSink]], [[ImageNearDupSink]], [[AnnIndexSink]],
  * [[Int8IndexSink]]).
  */
private[streaming] object IndexDirs {

  /** True iff `dir` holds parquet DATA Spark's listing would actually
    * read. Two leftovers of a crashed or empty append must NOT count:
    *   - a `_SUCCESS`-only dir (zero-row append) — no partition dir, no
    *     `.parquet` file;
    *   - a `_temporary`-only dir (append crashed before any task
    *     committed) — a DIRECTORY entry, but one Spark's listing hides.
    * The predicate mirrors Spark's hidden-path convention exactly: a name
    * starting with `_` or `.` is hidden UNLESS it contains `=` (partition
    * dirs like `__bucket=3` are data even though they start with `_`).
    * Counting either leftover as state would send the next batch into a
    * schema-less `spark.read.parquet` and kill the stream.
    */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val name = st.getPath.getName
      val hidden = (name.startsWith("_") || name.startsWith(".")) &&
        !name.contains("=")
      (st.isDirectory && !hidden) ||
        (st.isFile && name.endsWith(".parquet"))
    }
  }

  /** Fold an append-only index's per-batch file sets into a compact layout
    * — every row and column preserved byte-for-row, INCLUDING `__batch`
    * (the `__batch < batchId` replay fence filters the same rows after
    * compaction as before). Partitioned indexes (`partitionCol` set, the
    * near-dup chunk/band indexes) land as ~one file per partition value
    * (`repartition(pcol)` puts each value wholly in one task); flat
    * indexes (the ANN code tables) coalesce to `targetFiles`. Without
    * this, an N-batch stream leaves O(N x partitions) files and every
    * probe pays the listing+footer cost — amortized compaction caps it at
    * O(buckets).
    *
    * Concurrency/crash contract: run BETWEEN micro-batches (foreachBatch
    * executions are serialized per query; call from the driver while the
    * stream is idle or from inside the batch hook). The publish is
    * write-to-temp + two renames; a crash between the renames is healed
    * by the recovery step at the next compact() — and the index dir is
    * only ever absent inside that two-rename window.
    */
  def compact(spark: SparkSession, dir: String,
              partitionCol: Option[String],
              targetFiles: Int = 4): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    // recovery: a previous compact that died between its two renames left
    // the live data under __compact_old and no index dir — restore it
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"could not recover $old -> $p")
    fs.delete(tmp, true)
    fs.delete(old, true)
    if (!hasData(spark, dir)) return
    val df = spark.read.parquet(dir)
    partitionCol match {
      case Some(pc) =>
        df.repartition(col(pc))
          .write.partitionBy(pc).mode("overwrite").parquet(tmp.toString)
      case None =>
        df.coalesce(math.max(1, targetFiles))
          .write.mode("overwrite").parquet(tmp.toString)
    }
    require(fs.rename(p, old), s"could not stage $p aside for compaction")
    require(fs.rename(tmp, p), s"could not publish compacted index to $p " +
      s"(live data preserved at $old; the next compact() recovers it)")
    fs.delete(old, true)
  }
}
