package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.connector.{ColStats, DirEntry, DirStats, TableLog}

/** Manifest-log ceiling probe (test scope): every manifest carries the FULL
  * dir list, so a commit writes O(live dirs) text and every table load
  * parses it back. ManifestHintProbe pinned the VERSION-count dimension
  * (hint-first `latestVersion` stays flat to 10k commits); this probe pins
  * the LIVE-DIR dimension the round-15 verdict called unmeasured:
  *
  *   - append-commit latency vs live-dir count (the full GraftBatchWrite
  *     commit-loop shape: latestVersion + entriesAt(expected) + encode +
  *     CAS publish of an O(dirs) manifest),
  *   - table-load cost (latestVersion + entriesAt) vs live-dir count,
  *   - manifest bytes on disk vs live-dir count,
  *
  * with every entry carrying realistic committed stats (10 columns — the
  * shape a real append writes, ~0.5 KB/entry), at 128 / 1k / 8k dirs, plus
  * the version dimension extended past ManifestHintProbe's 10k (30k).
  *
  * Run: `Test/runMain graft.ManifestScaleProbe [dirCounts...]` (default
  * 128 1024 8192). No Spark session — the log layer is plain Hadoop FS.
  * Results land in PLANS.md; the checkpoint decision hangs off them.
  */
object ManifestScaleProbe {

  private def timeUs(reps: Int)(f: => Unit): Long = {
    val t0 = System.nanoTime()
    (0 until reps).foreach(_ => f)
    (System.nanoTime() - t0) / 1000 / reps
  }

  /** A realistic committed entry: 6 long + 3 string + 1 double columns of
    * stats, distinct per index so nothing compresses away.
    */
  def entry(tableDir: String, i: Int): DirEntry = {
    val longs = (0 until 6).map(c =>
      s"c$c" -> ColStats("long", (i.toLong * 7 + c): Any, (i.toLong * 7 + c + 1000000): Any, c.toLong))
    val strs = (6 until 9).map(c =>
      s"c$c" -> ColStats("string", f"acct-$i%08d-lo": Any, f"acct-$i%08d-zz-hi": Any, 0L))
    val dbl = Seq("c9" -> ColStats("double", (i * 0.5): Any, (i * 0.5 + 42.0): Any, 1L))
    DirEntry(s"$tableDir/data/d-$i",
      Some(DirStats(1000000L + i, (longs ++ strs ++ dbl).toMap)))
  }

  def main(args: Array[String]): Unit = {
    val dirCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(128, 1024, 8192)
    val conf = new Configuration()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))

    println("== live-dir dimension (stats-carrying entries, version count small) ==")
    dirCounts.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scale-$n").toString
      val log = new TableLog(s"$dir/t", conf)
      log.create(schema, Map.empty)
      // one commit installs the n-dir state; the probe then measures the
      // STEADY-STATE append loop at that width
      require(log.tryCommitEntries(None, (0 until n).map(entry(s"$dir/t", _))))
      val reps = 20
      var v = log.latestVersion.get
      val commitUs = timeUs(reps) {
        // the exact sequence GraftBatchWrite.commit pays per attempt
        val expected = log.latestVersion
        val current = expected.map(log.entriesAt).getOrElse(Nil)
        require(log.tryCommitEntries(expected,
          current :+ entry(s"$dir/t", 1000000 + v.toInt)))
        v += 1
      }
      // cold = fresh handle AND purged shared state cache (a new driver
      // process resolving from disk: checkpoint parse + chain walk);
      // warm = fresh handle, shared cache populated (every later query's
      // loadTable in a running driver)
      val loadColdUs = timeUs(reps) {
        graft.connector.TableLog.invalidateCache(s"$dir/t")
        val fresh = new TableLog(s"$dir/t", conf)
        require(fresh.entriesAt(fresh.latestVersion.get).size >= n)
      }
      val loadWarmUs = timeUs(reps) {
        val fresh = new TableLog(s"$dir/t", conf)
        require(fresh.entriesAt(fresh.latestVersion.get).size >= n)
      }
      val bytes = {
        val p = new Path(s"$dir/t/manifest-$v")
        p.getFileSystem(conf).getFileStatus(p).getLen
      }
      println(f"dirs=$n%6d  appendCommit=$commitUs%8d us  loadCold=$loadColdUs%8d us  " +
        f"loadWarm=$loadWarmUs%6d us  manifest=$bytes%10d B")
    }

    println("== version dimension (1-dir manifests; extends ManifestHintProbe past 10k) ==")
    Seq(10000, 30000).foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-vers-$n").toString
      val log = new TableLog(s"$dir/t", conf)
      log.create(schema, Map.empty)
      (0 until n).foreach { i =>
        require(log.tryCommit(if (i == 0) None else Some(i.toLong), Seq(s"$dir/t/data/d-x")))
      }
      val reps = 20
      val latest = timeUs(reps)(require(log.latestVersion.contains(n.toLong)))
      val load = timeUs(reps) {
        val fresh = new TableLog(s"$dir/t", conf)
        require(fresh.entriesAt(fresh.latestVersion.get).nonEmpty)
      }
      var v = n.toLong
      val commitUs = timeUs(reps) {
        val expected = log.latestVersion
        val current = expected.map(log.entriesAt).getOrElse(Nil)
        require(log.tryCommitEntries(expected, current.map(e => DirEntry(e.dir, e.stats))))
        v += 1
      }
      println(f"versions=$n%6d  latest(hint)=$latest%6d us  tableLoad=$load%6d us  appendCommit=$commitUs%8d us")
    }
  }
}
