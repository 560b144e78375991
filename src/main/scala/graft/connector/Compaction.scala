package graft.connector

import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col}

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
  * Deletion-vector maintenance (Delta's `REORG ... APPLY (PURGE)` rolled
  * into OPTIMIZE): a dir whose vector hides at least `purgeDeletedFraction`
  * of its rows joins the rewrite set regardless of size; every rewritten
  * dir has its vector APPLIED (deleted rows dropped via an anti-join on
  * the V1 `_metadata` file-path + row-index columns) and the consolidated
  * output is vector-free, restoring the columnar fast path that
  * merge-on-read reads trade away. A concurrent DELETE that lands a new
  * vector on a dir mid-compaction conflicts loudly — the merged copy was
  * built against the old vector.
  *
  * Rows are otherwise moved verbatim — compaction is pure layout
  * maintenance and commits a new manifest version whose LIVE row set is
  * identical. The consolidated dir gets fresh footer-derived [[DirStats]];
  * its column ranges are the union of its inputs', so dir-granular pruning
  * coarsens for the merged data. `clusterBy` mitigates: rows are sorted
  * within partitions so parquet row-group stats inside the consolidated
  * dir stay tight for row-group pruning, the second pruning layer.
  */
object Compaction {

  /** Compact dirs under `smallBytes` (plus vectored dirs at or above
    * `purgeDeletedFraction` deleted) into ~`targetBytes` output partitions.
    * Returns true when a new version was committed, false when there was
    * nothing to do.
    */
  def compact(spark: SparkSession, log: TableLog,
              smallBytes: Long = 128L << 20,
              targetBytes: Long = 512L << 20,
              clusterBy: Seq[String] = Nil,
              purgeDeletedFraction: Double = 0.1,
              zorderBy: Seq[String] = Nil): Boolean = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "clusterBy and zorderBy are exclusive layouts")
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
    val dvCache = scala.collection.mutable.HashMap[String, DeletionVector]()
    def vector(e: DirEntry): DeletionVector =
      e.dv.map(p => dvCache.getOrElseUpdate(p, DeletionVector.read(p, log.hadoopConf)))
        .getOrElse(DeletionVector.empty)
    def deletedFraction(e: DirEntry): Double = e.dv match {
      case None => 0.0
      case Some(_) =>
        val card = vector(e).cardinality
        // a statless vectored dir can't prove its live fraction: rewrite it
        e.stats.map(s => if (s.rows == 0) 1.0 else card.toDouble / s.rows)
          .getOrElse(1.0)
    }
    val purge = present.filter(e =>
      e.dv.isDefined && deletedFraction(e) >= purgeDeletedFraction)
    val small = (sized.filter(_._2 < smallBytes).map(_._1) ++ purge).distinct
    // a lone small dir isn't worth rewriting — unless it carries a vector
    // to purge; phantom (absent-empty) entries can be dropped regardless
    val worthRewriting = small.size >= 2 || purge.nonEmpty
    if (!worthRewriting && absent.isEmpty) return false

    val stagingEntries: Seq[DirEntry] =
      if (!worthRewriting) Nil   // only phantom entries to drop
      else {
        val totalBytes = sized.filter { case (e, _) => small.contains(e) }.map(_._2).sum
        val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
        // read by PHYSICAL column names, rename to logical after the
        // vector subtraction (applyVectors needs the raw file-source
        // frame's `_metadata`); the rewrite below runs on logical names
        // and renames back to physical just before writing
        val df0 = spark.read.schema(ColumnMapping.toPhysical(log.schema))
          .parquet(small.map(_.dir): _*)
        val df = ColumnMapping.renameDf(
          DvReads.applyVectors(spark, df0, small, log.hadoopConf),
          ColumnMapping.inverseMap(log.schema))
        val toPhysicalDf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          ColumnMapping.renameDf(_, ColumnMapping.nameMap(log.schema))
        if (zorderBy.nonEmpty) {
          // each z tile becomes its OWN manifest dir, so its committed
          // stats cover one small multi-column tile and dir-granular
          // pruning works on every z column at planning time; tiles are
          // written under one root then promoted to ordinary top-level
          // data dirs (vacuum's liveness rules key on those names)
          val root = log.newDataDir()
          // z bounds from the committed stats when every rewritten dir has
          // typed numeric stats for the column — skips a second full scan
          // (and a second vector-subtraction pass) over the input dirs
          val physOf = ColumnMapping.nameMap(log.schema)
          val statBounds: Map[String, (Double, Double)] = zorderBy.flatMap { c =>
            // committed stats key PHYSICAL names; zorderBy speaks logical
            val cs = small.map(_.stats.flatMap(_.cols.get(physOf.getOrElse(c, c))))
            val nums = cs.map(_.flatMap(st => (st.min, st.max) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some((mn.toDouble, mx.toDouble))
              case (mn: java.lang.Double, mx: java.lang.Double) => Some((mn.toDouble, mx.toDouble))
              case _ => None
            }))
            if (nums.forall(_.isDefined) && nums.nonEmpty)
              Some(c -> (nums.flatten.map(_._1).min, nums.flatten.map(_._2).max))
            else None
          }.toMap
          toPhysicalDf(ZOrder.layout(spark, df, zorderBy, nOut, statBounds))
            .write.partitionBy(ZOrder.TileCol).parquet(root)
          val rootPath = new Path(root)
          val tiles = fs.listStatus(rootPath).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${ZOrder.TileCol}="))
            .sortBy(_.getPath.getName)
          val promoted = tiles.map { st =>
            val dst = new Path(log.newDataDir())
            if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(s"failed to promote z tile ${st.getPath} to $dst")
            dst.toString
          }
          fs.delete(rootPath, true)   // now-empty tile root
          promoted.map(d => DirEntry(d, DirStats.collect(d, log.hadoopConf)))
            .filterNot(_.stats.exists(_.rows == 0))
        } else {
          val staging = log.newDataDir()
          // coalesce, not repartition: merging small files is a narrow
          // dependency, no shuffle needed (the anti-join broadcasts)
          val c = df.coalesce(nOut)
          val laidOut =
            if (clusterBy.nonEmpty) c.sortWithinPartitions(clusterBy.map(col): _*)
            else c
          toPhysicalDf(laidOut).write.parquet(staging)
          // same empty-output guard as the z-order branch: when every
          // rewritten row was vector-deleted the consolidated dir holds no
          // rows — committing it would just re-create the small-dir problem
          // being solved (the unreferenced staging dir is vacuum's to drop)
          Seq(DirEntry(staging, DirStats.collect(staging, log.hadoopConf)))
            .filterNot(_.stats.exists(_.rows == 0))
        }
      }

    val replaced = (if (worthRewriting) small.map(_.dir) else Nil).toSet ++
      absent.map(_.dir)
    val dvAtSelection: Map[String, Option[String]] =
      entries.map(e => e.dir -> e.dv).toMap
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
      // copy holds stale rows — identical conflict rule to GraftBatchWrite;
      // a changed deletion vector means a concurrent merge-on-read DELETE
      // whose rows our merged copy would resurrect
      val missing = replaced.filterNot(d => curEntries.exists(_.dir == d))
      if (missing.nonEmpty)
        throw new ConcurrentModificationException(
          s"concurrent rewrite during compaction of ${log.tableDir}: " +
            s"dirs replaced: ${missing.mkString(", ")}")
      val dvChanged = replaced.filter(d =>
        curEntries.find(_.dir == d).exists(_.dv != dvAtSelection.getOrElse(d, None)))
      if (dvChanged.nonEmpty)
        throw new ConcurrentModificationException(
          s"concurrent merge-on-read delete during compaction of " +
            s"${log.tableDir}: vectors changed on: ${dvChanged.mkString(", ")}")
      val next = curEntries.filterNot(e => replaced.contains(e.dir)) ++ stagingEntries
      done = log.tryCommitEntriesMeta(cur, next, newMeta = None, op = Some("OPTIMIZE"))
    }
    true
  }
}
