package graft

import org.apache.hadoop.conf.Configuration

import graft.connector.TableLog

/** Manifest-latest resolution probe (test scope): measures `latestVersion`
  * cost at long commit histories WITH the `_latest` hint vs WITHOUT (the
  * listing fallback), plus the end-to-end table-load-shaped sequence
  * (latestVersion + entriesAt). The claim under test: hint-first
  * resolution stays ~flat as commits accumulate (one small read + two
  * existence probes), while the listing pays O(versions) per call — the
  * cost every table load and every commit CAS attempt used to pay.
  *
  * Run: `Test/runMain graft.ManifestHintProbe [commitCounts...]`
  * (default 1000 10000). No Spark session needed — the log layer is plain
  * Hadoop FS. Results land in PLANS.md.
  */
object ManifestHintProbe {

  private def timeUs(reps: Int)(f: => Unit): Long = {
    val t0 = System.nanoTime()
    (0 until reps).foreach(_ => f)
    (System.nanoTime() - t0) / 1000 / reps
  }

  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000, 10000)
    val conf = new Configuration()
    counts.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-hint-$n").toString
      val log = new TableLog(s"$dir/t", conf)
      log.create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))), Map.empty)
      // n commits of a one-dir manifest (the dir itself need not exist —
      // this probes metadata resolution, not data IO)
      (0 until n).foreach { i =>
        require(log.tryCommit(if (i == 0) None else Some(i.toLong), Seq(s"$dir/t/data/d-x")),
          s"commit $i lost a race in a single-writer probe?")
      }
      val reps = 50
      // fresh TableLog instances per call pattern are irrelevant here:
      // latestVersion is not memoized (it must see concurrent commits)
      val hinted = timeUs(reps)(require(log.latestVersion.contains(n.toLong)))
      val listed = timeUs(reps)(require(log.listedLatestVersion.contains(n.toLong)))
      val load = timeUs(reps) {
        val v = log.latestVersion.get
        require(log.entriesAt(v).nonEmpty)
      }
      println(f"commits=$n%6d  latest(hint)=$hinted%6d us  " +
        f"latest(listing)=$listed%8d us  load(hint+entries)=$load%6d us")
    }
  }
}
