package graft.connector

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** A Hadoop FileSystem whose `rename` is copy+delete — non-atomic AND
  * overwriting, the worst-case object-store semantics (S3 without a
  * LogStore, GCS compose races, plain HTTP stores). Registered under the
  * `cdrename` scheme purely for [[ObjectStoreRenameSpec]]: it is the
  * README's "object store" row of the CAS deployment matrix made
  * executable. `manifestBarrier` makes the two-committer race
  * deterministic: both writers are held at the top of their manifest
  * rename until both arrive, so both have already observed "destination
  * absent".
  */
class CopyDeleteRenameFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("cdrename:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (dst.getName.startsWith("manifest-")) {
      CopyDeleteRenameFileSystem.manifestBarrier.foreach(_.await(20, TimeUnit.SECONDS))
      val d = CopyDeleteRenameFileSystem.manifestRenameDelayMs
      if (d > 0) Thread.sleep(d)
    }
    // copy bytes to dst (silently REPLACING any existing file), delete src.
    // The copy itself is serialized: an object store's PUT is last-write-
    // wins, not a local unlink/create collision — the race under test is
    // the exists-probe-vs-publish DECISION (held by the barrier above),
    // not byte-level interleaving of the copy.
    CopyDeleteRenameFileSystem.copyMonitor.synchronized {
      val s = pathToFile(src).toPath
      val d = pathToFile(dst).toPath
      Files.copy(s, d, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.delete(s)
    }
    true
  }
}

object CopyDeleteRenameFileSystem {
  @volatile var manifestBarrier: Option[CyclicBarrier] = None
  @volatile var manifestRenameDelayMs: Long = 0L
  private[connector] val copyMonitor = new Object
}

/** Round-16 verdict item 2: convert the object-store multi-writer caveat
  * from README prose into pinned behavior. Without an external lock, two
  * committers racing one version on a copy+delete-rename store BOTH
  * believe they won and one commit is silently destroyed — this spec
  * proves that failure mode is real (and that the engine warns loudly the
  * first time it commits over such a scheme). With a [[TableLog.CommitLock]]
  * registered (the LogStore-shaped seam), the identical race has exactly
  * one winner, every time.
  */
class ObjectStoreRenameSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("k", LongType)))

  private def newConf(): Configuration = {
    val c = new Configuration()
    c.set("fs.cdrename.impl", classOf[CopyDeleteRenameFileSystem].getName)
    c
  }

  private def newTable(conf: Configuration): String = {
    val local = Files.createTempDirectory("graft-objstore").toString
    val tableDir = s"cdrename://$local/t"
    val setup = new TableLog(tableDir, conf)
    setup.create(schema, Map.empty)
    tableDir
  }

  private def race(tableDir: String, conf: Configuration): (Boolean, Boolean) = {
    val results = new Array[Boolean](2)
    val ready = new CountDownLatch(2)
    val threads = Seq("A", "B").zipWithIndex.map { case (tag, i) =>
      new Thread(() => {
        val log = new TableLog(tableDir, conf)
        ready.countDown(); ready.await(20, TimeUnit.SECONDS)
        results(i) = log.tryCommit(None, Seq(s"$tableDir/data/d-$tag"))
      }, s"committer-$tag")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    (results(0), results(1))
  }

  private def committedDirs(tableDir: String, conf: Configuration): Seq[String] =
    new TableLog(tableDir, conf).entriesAt(1L).map(e => new Path(e.dir).getName)

  private def captureStderr[T](body: => T): (T, String) = {
    val buf = new ByteArrayOutputStream()
    val orig = System.err
    System.setErr(new PrintStream(buf, true, "UTF-8"))
    try { val r = body; (r, buf.toString("UTF-8")) }
    finally System.setErr(orig)
  }

  test("copy+delete rename: with the default lease lock disabled, two racing " +
    "committers silently lose a commit, and the scheme warns") {
    val conf = newConf()
    // disable the in-tree default lock to pin the BARE failure mode the
    // lock exists to prevent (the round-16 caveat, kept executable)
    TableLog.defaultLeaseLockEnabled = false
    try {
      val (tableDir, err) = captureStderr(newTable(conf))
      assert(err.contains("not known to rename atomically"),
        s"expected the non-atomic-scheme warning at first commit; got: $err")
      CopyDeleteRenameFileSystem.manifestBarrier = Some(new CyclicBarrier(2))
      try {
        val (a, b) = race(tableDir, conf)
        // the pinned failure mode: both publishes "succeed"...
        assert(a && b, "both committers must believe they won on an overwriting rename")
        // ...but version 1 holds only ONE writer's commit — the other is gone
        val dirs = committedDirs(tableDir, conf)
        assert(dirs.size === 1)
        assert(dirs.head === "d-A" || dirs.head === "d-B")
      } finally CopyDeleteRenameFileSystem.manifestBarrier = None
    } finally TableLog.defaultLeaseLockEnabled = true
  }

  test("the DEFAULT in-tree lease lock restores the CAS with no user-supplied lock") {
    val conf = newConf()
    CopyDeleteRenameFileSystem.manifestRenameDelayMs = 25L
    try {
      (1 to 8).foreach { round =>
        val (tableDir, err) = captureStderr(newTable(conf))
        assert(!err.contains("not known to rename atomically"),
          "the default lease lock must replace the lost-commit warning")
        assert(err.contains("lease-file lock"),
          s"expected the one-time lease-lock note; got: $err")
        val (a, b) = race(tableDir, conf)
        assert(a ^ b, s"round $round: exactly one committer must win under " +
          s"the default lease lock (got $a/$b)")
        assert(committedDirs(tableDir, conf).size === 1)
      }
    } finally CopyDeleteRenameFileSystem.manifestRenameDelayMs = 0L
  }

  test("an expired lease (crashed holder) is reclaimed, not waited on forever") {
    val conf = newConf()
    val tableDir = newTable(conf)
    // plant an abandoned lease whose mtime is far past the TTL
    val fs = new Path(tableDir).getFileSystem(conf)
    val lease = new Path(tableDir, "_commitlock")
    val out = fs.create(lease, false)
    out.write("dead-holder-token".getBytes("UTF-8")); out.close()
    fs.setTimes(lease, System.currentTimeMillis() - 10 * 60 * 1000L, -1)
    val log = new TableLog(tableDir, conf)
    assert(log.tryCommit(None, Seq(s"$tableDir/data/d-after-crash")),
      "a commit must steal a TTL-expired lease and proceed")
    assert(committedDirs(tableDir, conf) === Seq("d-after-crash"))
  }

  test("a registered CommitLock restores the CAS: exactly one winner, no warning") {
    val conf = newConf()
    // the LogStore-shaped seam: a per-table-dir mutual exclusion — here an
    // in-process lock map standing in for DynamoDB/ZooKeeper/advisory files
    val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    TableLog.setCommitLock(new TableLog.CommitLock {
      def withLock[T](tableDir: String)(body: => T): T =
        locks.computeIfAbsent(tableDir, _ => new Object).synchronized(body)
    })
    CopyDeleteRenameFileSystem.manifestRenameDelayMs = 25L
    try {
      (1 to 8).foreach { round =>
        val (tableDir, err) = captureStderr(newTable(conf))
        assert(!err.contains("not known to rename atomically"),
          "a registered CommitLock must suppress the scheme warning")
        val (a, b) = race(tableDir, conf)
        assert(a ^ b, s"round $round: exactly one committer must win under the lock (got $a/$b)")
        assert(committedDirs(tableDir, conf).size === 1)
      }
    } finally {
      TableLog.setCommitLock(null)
      CopyDeleteRenameFileSystem.manifestRenameDelayMs = 0L
    }
  }
}
