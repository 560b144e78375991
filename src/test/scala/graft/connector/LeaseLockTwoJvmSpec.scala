package graft.connector

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Two-PROCESS commit race over a copy+delete-rename store under the
  * DEFAULT [[LeaseFileCommitLock]] (round-17 verdict item 1's second
  * half). [[ObjectStoreRenameSpec]] races threads, where the lock's
  * in-process stripe monitor alone would already serialize them — this
  * spec removes that shortcut: a child JVM and this JVM append to ONE
  * `cdrename://` table concurrently, so mutual exclusion can only come
  * from the lease FILE. Every commit both writers believe they made must
  * be present in the final manifest; a lost commit shows as a missing
  * entry or version gap, exactly like [[CasRaceTwoJvmSpec]] pins for the
  * local link(2) CAS.
  */
class LeaseLockTwoJvmSpec extends AnyFunSuite {

  private val N = 25

  test("two JVMs racing one cdrename table never lose a commit under the default lease lock") {
    val conf = new Configuration()
    conf.set("fs.cdrename.impl", classOf[CopyDeleteRenameFileSystem].getName)
    val local = Files.createTempDirectory("graft-lease2jvm").toString
    val tableDir = s"cdrename://$local/t"
    val setup = new TableLog(tableDir, conf)
    setup.create(StructType(Seq(StructField("k", LongType))), Map.empty)

    // widen each publish so the processes genuinely interleave: the child
    // gets the same delay via its 4th arg
    CopyDeleteRenameFileSystem.manifestRenameDelayMs = 3L
    try {
      val child = new ProcessBuilder(ChildJvm.javaBin, "-cp", ChildJvm.classpath,
        "graft.connector.LeaseRaceChild", tableDir, "w2", N.toString, "3")
        .redirectErrorStream(true).start()

      val log = new TableLog(tableDir, conf)
      var committed = 0
      var attempts = 0
      while (committed < N) {
        attempts += 1
        assert(attempts < N * 1000, "CAS starvation in the parent writer")
        val expected = log.latestVersion
        val entries = log.currentEntries() :+
          DirEntry(s"$tableDir/data/w1-$committed", None)
        if (log.tryCommitEntries(expected, entries)) committed += 1
      }

      val finished = child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) child.destroyForcibly()
      val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
      assert(finished, s"child JVM hung; output so far: $out")
      assert(child.exitValue() === 0, s"child JVM failed: $out")
      assert(out.contains(s"committed=$N"), s"child under-committed: $out")

      val latest = new TableLog(tableDir, conf).latestVersion
      assert(latest === Some(2L * N), s"expected ${2 * N} committed versions")
      val names = new TableLog(tableDir, conf).entriesAt(2L * N)
        .map(e => new Path(e.dir).getName)
      assert(names.length === 2 * N, s"entry count ${names.length} != ${2 * N}")
      val expectedNames =
        (0 until N).map(i => s"w1-$i").toSet ++ (0 until N).map(i => s"w2-$i")
      assert(names.toSet === expectedNames,
        "lost or duplicated commit: " +
          s"missing=${expectedNames -- names.toSet} extra=${names.toSet -- expectedNames}")
    } finally CopyDeleteRenameFileSystem.manifestRenameDelayMs = 0L
  }
}
