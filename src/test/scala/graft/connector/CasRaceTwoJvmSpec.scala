package graft.connector

import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Two-PROCESS manifest-CAS race (round-15 verdict item 7).
  * LakeConcurrencySpec races threads inside one JVM, where JVM-local
  * effects (a shared FileSystem cache entry, lock elision, memory
  * visibility) could in principle mask a filesystem-level race. This spec
  * removes that doubt: a child JVM (separate process, its own Hadoop
  * FileSystem instance) and this JVM append to ONE table dir concurrently
  * through the normal read-CAS-retry loop, and the final manifest must
  * account for EVERY commit both writers believe they made — converge or
  * conflict loudly, never silently lose one.
  *
  * This is exactly the race POSIX rename(2) loses: rename silently
  * replaces an existing destination, so two processes that both observed
  * "manifest-(v+1) absent" would both "win" and the second would destroy
  * the first's commit. The local-FS publish therefore uses link(2)
  * (see TableLog.writeAtomic), which fails atomically with EEXIST.
  */
class CasRaceTwoJvmSpec extends LakeSpec {
  protected def catalogName = "raclake"

  private val N = 40

  test("two JVMs racing one table's CAS never lose a commit") {
    val dir = s"${tmp("cas-race")}/t"
    val l = log0(dir)
    l.create(StructType(Seq(StructField("k", LongType))), Map.empty)

    // child JVM: plain java, no Spark — main classes + test classes +
    // the Spark jar dir (for hadoop-client) are all it needs
    val javaBin = ChildJvm.javaBin
    val cp = ChildJvm.classpath
    val child = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.connector.CasRaceChild", dir, "w2", N.toString)
      .redirectErrorStream(true).start()

    // parent: the identical loop, in-process
    var committed = 0
    var attempts = 0
    while (committed < N) {
      attempts += 1
      assert(attempts < N * 1000, "CAS starvation in the parent writer")
      val expected = l.latestVersion
      val entries = l.currentEntries() :+
        DirEntry(s"$dir/data/w1-$committed", None)
      if (l.tryCommitEntries(expected, entries)) committed += 1
    }

    // waitFor BEFORE draining stdout: readAllBytes blocks until process
    // exit, so the hung-child timeout below would otherwise be unreachable
    // (the one-line output cannot fill the pipe buffer, so not draining
    // first cannot deadlock the child)
    val finished = child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) child.destroyForcibly()
    val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
    assert(finished, s"child JVM hung; output so far: $out")
    assert(child.exitValue() === 0, s"child JVM failed: $out")
    assert(out.contains(s"committed=$N"), s"child under-committed: $out")

    // every commit adds exactly one version and one entry: 2N commits =
    // version 2N holding all 2N uniquely-named entries. A silently lost
    // commit shows as a missing entry (the overwriting winner carried
    // forward a snapshot that never saw it) and/or a version gap.
    val latest = log0(dir).latestVersion
    assert(latest === Some(2L * N), s"expected ${2 * N} committed versions")
    val names = log0(dir).entriesAt(2L * N)
      .map(e => new org.apache.hadoop.fs.Path(e.dir).getName)
    assert(names.length === 2 * N, s"entry count ${names.length} != ${2 * N}")
    val expectedNames =
      (0 until N).map(i => s"w1-$i").toSet ++ (0 until N).map(i => s"w2-$i")
    assert(names.toSet === expectedNames,
      "lost or duplicated commit: " +
        s"missing=${expectedNames -- names.toSet} extra=${names.toSet -- expectedNames}")
    // every intermediate version is readable and monotonically grows by 1
    (1L to 2L * N).foreach(v =>
      assert(log0(dir).entriesAt(v).size === v.toInt,
        s"version $v does not hold exactly $v entries"))
  }

  /** A log handle on an absolute dir (LakeSpec.log is catalog-root-relative). */
  private def log0(dir: String): TableLog =
    new TableLog(dir, spark.sparkContext.hadoopConfiguration)
}
