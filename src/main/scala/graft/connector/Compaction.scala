package graft.connector

import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the mini-lakehouse (Delta's `OPTIMIZE`
  * contract): every append and every micro-batch MERGE adds one immutable
  * data dir, so a long-lived table — the streaming state table above all —
  * accumulates many small dirs, and both planning cost (one listing + one
  * stats entry per dir) and scan task count grow with commit count instead
  * of data size. `compact` folds the dirs smaller than `smallBytes` into
  * one consolidated dir and CAS-commits the swap with exactly the
  * copy-on-write rules a rewrite uses: a concurrent APPEND survives (its
  * dir is not touched), a concurrent rewrite of a compacted dir conflicts
  * loudly, and readers pinned to older versions keep their snapshot until
  * `vacuum`.
  *
  * Rows are moved verbatim — compaction is pure layout maintenance and
  * commits a new manifest version whose row set is identical. The
  * consolidated dir gets fresh footer-derived [[DirStats]]; its column
  * ranges are the union of its inputs', so dir-granular pruning coarsens
  * for the merged data (the small dirs it replaces were individually
  * cheap to rewrite anyway). `clusterBy` mitigates: rows are sorted within
  * partitions so parquet row-group stats inside the consolidated dir stay
  * tight for row-group pruning, the second pruning layer.
  */
object Compaction {

  /** Compact dirs under `smallBytes` into ~`targetBytes` output partitions.
    * Returns true when a new version was committed (at least two dirs were
    * small enough to merge), false when there was nothing to do.
    */
  def compact(spark: SparkSession, log: TableLog,
              smallBytes: Long = 128L << 20,
              targetBytes: Long = 512L << 20,
              clusterBy: Seq[String] = Nil): Boolean = {
    val base = log.latestVersion.getOrElse(return false)
    val entries = log.entriesAt(base)
    val fs = new Path(log.tableDir).getFileSystem(log.hadoopConf)
    // a manifest entry whose dir is absent on disk: a committed-empty dir
    // from a pre-empty-skip manifest is just dead weight to drop, but an
    // absent dir the stats say held ROWS is corruption — reading through it
    // would already fail, so fail compaction loudly too, never "fix" it
    val (present, absent) = entries.partition(e => fs.exists(new Path(e.dir)))
    val lostRows = absent.filterNot(_.stats.exists(_.rows == 0))
    if (lostRows.nonEmpty)
      throw new IllegalStateException(
        s"manifest of ${log.tableDir} references missing non-empty dirs: " +
          lostRows.map(_.dir).mkString(", "))
    val sized = present.map(e =>
      e -> fs.getContentSummary(new Path(e.dir)).getLength)
    val smallSized = sized.filter(_._2 < smallBytes)
    val small = smallSized.map(_._1)
    if (small.size < 2 && absent.isEmpty) return false

    val stagingEntry =
      if (small.size < 2) None   // only phantom entries to drop
      else {
        val totalBytes = smallSized.map(_._2).sum
        val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
        val staging = log.newDataDir()
        val df = spark.read.schema(log.schema).parquet(small.map(_.dir): _*)
        val laidOut = {
          // coalesce, not repartition: merging small files is a narrow
          // dependency, no shuffle needed
          val c = df.coalesce(nOut)
          if (clusterBy.nonEmpty)
            c.sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
          else c
        }
        laidOut.write.parquet(staging)
        Some(DirEntry(staging, DirStats.collect(staging, log.hadoopConf)))
      }

    val replaced = (if (small.size < 2) Nil else small.map(_.dir)).toSet ++
      absent.map(_.dir)
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(
          s"compaction commit to ${log.tableDir} failed after $attempts " +
            "attempts — manifest rename keeps failing")
      val cur = log.latestVersion
      val curEntries = cur.map(log.entriesAt).getOrElse(Nil)
      // a compacted dir replaced by a concurrent rewrite means our merged
      // copy holds stale rows — identical conflict rule to GraftBatchWrite
      val missing = replaced.filterNot(d => curEntries.exists(_.dir == d))
      if (missing.nonEmpty)
        throw new ConcurrentModificationException(
          s"concurrent rewrite during compaction of ${log.tableDir}: " +
            s"dirs replaced: ${missing.mkString(", ")}")
      val next = curEntries.filterNot(e => replaced.contains(e.dir)) ++ stagingEntry
      done = log.tryCommitEntries(cur, next)
    }
    true
  }
}
