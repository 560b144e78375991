package graft.connector

import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** A REAL kill-mid-commit (complement of CommitCrashSpec, which constructs
  * the post-crash states deterministically): a child JVM commits in a tight
  * loop and is SIGKILLed at an arbitrary instant — whatever step of the
  * commit protocol it happened to be inside. The survivor table must then
  * satisfy every recovery claim at once, with no knowledge of where the
  * bullet landed:
  *
  *  - the manifest chain is contiguous 1..latest and every version parses
  *    with exactly `version` entries (a torn visible manifest is
  *    impossible — the publish is atomic or nothing);
  *  - a new writer commits right past whatever litter remains;
  *  - vacuum reclaims the litter (expired retention) without touching the
  *    committed chain.
  *
  * Repeated a few times so the kill lands in different protocol steps.
  */
class KillMidCommitSpec extends LakeSpec {
  protected def catalogName = "killlake"

  test("SIGKILL during a commit loop never corrupts the table") {
    val javaBin = ChildJvm.javaBin
    val cp = ChildJvm.classpath

    (1 to 3).foreach { round =>
      val dir = s"${tmp(s"kill-commit-$round")}/t"
      val l = new TableLog(dir, spark.sparkContext.hadoopConfiguration)
      l.create(StructType(Seq(StructField("k", LongType))), Map.empty)

      val child = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.connector.CasRaceChild", dir, "w", "-1")
        .redirectErrorStream(true).start()
      // let it get some commits in, then kill it cold at a random instant
      val deadline = System.nanoTime() + 8_000_000_000L
      while (l.latestVersion.forall(_ < 5) && System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(50 + scala.util.Random.nextInt(300))
      child.destroyForcibly()
      assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS),
        "child did not die")

      val latest = l.latestVersion.getOrElse(
        fail(s"round $round: no commit landed before the kill"))
      assert(latest >= 1, s"round $round: child never committed")
      // contiguous, parseable, monotone: version v holds exactly v entries
      (1L to latest).foreach { v =>
        val es = l.entriesAt(v)
        assert(es.size === v.toInt,
          s"round $round: version $v holds ${es.size} entries")
      }
      // a survivor writer commits right past the corpse's litter
      assert(l.tryCommitEntries(Some(latest),
        l.entriesAt(latest) :+ DirEntry(s"$dir/data/survivor", None)),
        s"round $round: survivor commit failed")
      assert(l.latestVersion === Some(latest + 1))

      // the only litter a kill can leave is invisible names; expired
      // retention reclaims it and the chain still reads
      Thread.sleep(50)
      l.vacuum(keepVersions = Int.MaxValue, orphanRetentionMs = 0)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
        .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
      assert(leftovers.isEmpty,
        s"round $round: expired .tmp- staging survived vacuum: $leftovers")
      (1L to latest + 1).foreach(v => l.entriesAt(v))
    }
  }

  test("cross-process vacuum races a committing JVM, then a SIGKILL lands") {
    val javaBin = ChildJvm.javaBin
    val cp = ChildJvm.classpath
    val dir = s"${tmp("vac-race")}/t"
    val l = new TableLog(dir, spark.sparkContext.hadoopConfiguration)
    l.create(StructType(Seq(StructField("k", LongType))), Map.empty)

    val child = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.connector.CasRaceChild", dir, "w", "-1")
      .redirectErrorStream(true).start()
    // parent = the maintenance process: aggressive manifest retention
    // against a live writer in ANOTHER JVM, then the writer dies cold
    val deadline = System.nanoTime() + 10_000_000_000L
    var vacuums = 0
    while (l.latestVersion.forall(_ < 8) && System.nanoTime() < deadline) {
      l.vacuum(keepVersions = 2, orphanRetentionMs = 60L * 60 * 1000)
      vacuums += 1
      Thread.sleep(10)
    }
    child.destroyForcibly()
    assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(vacuums > 0)

    val latest = l.latestVersion.getOrElse(fail("no commit landed"))
    // the kept tail reads; each version's entry count equals its version
    // (one append per commit), proving no vacuum-window commit vanished
    val oldestKept = (1L to latest).find(v =>
      try { l.entriesAt(v); true } catch { case _: Exception => false }).get
    (oldestKept to latest).foreach(v =>
      assert(l.entriesAt(v).size === v.toInt,
        s"version $v holds ${l.entriesAt(v).size} entries"))
    // survivor writer commits past both the vacuum churn and the corpse
    assert(l.tryCommitEntries(Some(latest),
      l.entriesAt(latest) :+ DirEntry(s"$dir/data/survivor", None)))
  }
}
