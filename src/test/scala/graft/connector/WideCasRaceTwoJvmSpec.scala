package graft.connector

import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Two-PROCESS CAS race on a WIDE table (round 16): the same race
  * CasRaceTwoJvmSpec pins for small tables, run against a table already
  * past [[TableLog.FullManifestMaxEntries]] — so every racing commit is a
  * `#delta` manifest computed against whatever head the writer last read,
  * and the periodic `checkpoint-v` publishes are contested BETWEEN
  * processes (fail-if-exists; exactly one writer creates each version, so
  * the checkpoint write is single-owner by construction — this spec makes
  * that claim empirical). A lost or misapplied delta shows as a missing/
  * duplicated entry or a wrong per-version entry count; a torn checkpoint
  * would corrupt some later reader's short-circuited resolution.
  */
class WideCasRaceTwoJvmSpec extends LakeSpec {
  protected def catalogName = "wraclake"

  private val Seeded = TableLog.FullManifestMaxEntries + 6
  private val N = 40

  test("two JVMs racing delta commits on a wide table never lose or misapply one") {
    val dir = s"${tmp("wide-cas-race")}/t"
    val l = log0(dir)
    l.create(StructType(Seq(StructField("k", LongType))), Map.empty)
    // version 1: the wide base — every later commit takes the delta path
    assert(l.tryCommitEntries(None,
      (0 until Seeded).map(i => DirEntry(s"$dir/data/seed-$i", None))))

    val child = new ProcessBuilder(ChildJvm.javaBin, "-cp", ChildJvm.classpath,
      "graft.connector.CasRaceChild", dir, "w2", N.toString)
      .redirectErrorStream(true).start()

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

    val finished = child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) child.destroyForcibly()
    val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
    assert(finished, s"child JVM hung; output so far: $out")
    assert(child.exitValue() === 0, s"child JVM failed: $out")
    assert(out.contains(s"committed=$N"), s"child under-committed: $out")

    // 1 seed commit + 2N racing commits; every version holds the seeded
    // entries plus exactly (v - 1) appended ones, and the final state has
    // every writer's every dir exactly once
    TableLog.invalidateCache(dir)
    val f = log0(dir)
    assert(f.latestVersion === Some(1L + 2 * N))
    val names = f.entriesAt(1L + 2 * N)
      .map(e => new org.apache.hadoop.fs.Path(e.dir).getName)
    assert(names.length === Seeded + 2 * N)
    val expectedNames = (0 until Seeded).map(i => s"seed-$i").toSet ++
      (0 until N).map(i => s"w1-$i") ++ (0 until N).map(i => s"w2-$i")
    assert(names.toSet === expectedNames,
      "lost or duplicated commit: " +
        s"missing=${expectedNames -- names.toSet} extra=${names.toSet -- expectedNames}")
    (1L to 1L + 2 * N).foreach(v =>
      assert(f.entriesAt(v).size === Seeded + v.toInt - 1,
        s"version $v does not hold ${Seeded + v - 1} entries"))
    // checkpoints landed at 16-multiples during the cross-process race,
    // and resolution through them agrees with the chain (the per-version
    // loop above read THROUGH those checkpoints)
    assert((16L to (1 + 2 * N).toLong by 16).exists(v =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"checkpoint-$v"))),
      "no checkpoint landed during the race")
  }

  private def log0(dir: String): TableLog =
    new TableLog(dir, spark.sparkContext.hadoopConfiguration)
}
