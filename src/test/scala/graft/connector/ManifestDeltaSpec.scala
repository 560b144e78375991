package graft.connector

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Delta-manifest + checkpoint behavior (round-16: the manifest-log
  * live-dir ceiling). ManifestScaleProbe measured full-manifest commits at
  * 680 ms / 5.4 MB per append on an 8k-dir table; wide tables therefore
  * commit `#delta` manifests (changes only) with periodic full-state
  * checkpoint files, while small tables keep the audited full-manifest
  * behavior byte-for-byte. These specs pin: the full/delta decision, exact
  * state reproduction through chains (appends, removals, dv replacement),
  * the checkpoint short-circuit, the reorder fallback, vacuum's checkpoint
  * rooting of the oldest kept version, and history() across deltas.
  */
class ManifestDeltaSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val schema = StructType(Seq(StructField("k", LongType)))

  private def newLog(prefix: String): TableLog = {
    val dir = Files.createTempDirectory(prefix).toString
    val log = new TableLog(s"$dir/t", conf)
    log.create(schema, Map.empty)
    log
  }

  private def entry(log: TableLog, i: Int): DirEntry =
    graft.ManifestScaleProbe.entry(log.tableDir, i)

  private def manifestText(log: TableLog, v: Long): String =
    new String(Files.readAllBytes(Paths.get(log.tableDir, s"manifest-$v")), "UTF-8")

  private def checkpointExists(log: TableLog, v: Long): Boolean =
    Files.exists(Paths.get(log.tableDir, s"checkpoint-$v"))

  private def fresh(log: TableLog): TableLog = new TableLog(log.tableDir, conf)

  test("small tables keep committing full manifests") {
    val log = newLog("graft-delta-small")
    val e = (0 until 3).map(entry(log, _))
    assert(log.tryCommitEntries(None, e))
    assert(log.tryCommitEntries(Some(1L), e :+ entry(log, 10)))
    assert(!TableLog.isDelta(manifestText(log, 2)))
    assert(fresh(log).entriesAt(2) === (e :+ entry(log, 10)))
  }

  test("wide tables commit deltas; every state reproduces exactly through the chain") {
    val log = newLog("graft-delta-wide")
    val wide = TableLog.FullManifestMaxEntries + 36
    var state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))   // v1: no predecessor => full
    assert(!TableLog.isDelta(manifestText(log, 1)))

    // v2: plain append
    state = state :+ entry(log, 1000)
    assert(log.tryCommitEntries(Some(1L), state))
    assert(TableLog.isDelta(manifestText(log, 2)))
    // the delta carries one entry, not the whole table
    assert(manifestText(log, 2).length < manifestText(log, 1).length / 10)

    // v3: remove five dirs and append two
    state = state.drop(5) ++ Seq(entry(log, 1001), entry(log, 1002))
    assert(log.tryCommitEntries(Some(2L), state))
    assert(TableLog.isDelta(manifestText(log, 3)))

    // v4: replace one entry in place (a merge-on-read delete swapping the
    // dir's deletion vector) — same dir, new dv/dvRows
    val swapped = state.head.copy(dv = Some(s"${log.tableDir}/dv/v-test"), dvRows = Some(7L))
    state = swapped +: state.tail
    assert(log.tryCommitEntries(Some(3L), state))
    assert(TableLog.isDelta(manifestText(log, 4)))

    // every version, resolved COLD (fresh TableLog, shared state cache
    // purged — a genuine chain walk from disk), is the exact committed
    // list — order included
    TableLog.invalidateCache(log.tableDir)
    val f = fresh(log)
    assert(f.entriesAt(4) === state)
    assert(f.entriesAt(2).size === wide + 1)
    assert(f.entriesAt(3).size === wide - 4 + 2)
    assert(fresh(log).currentEntries() === state)
  }

  test("every CheckpointInterval-th commit publishes a checkpoint that short-circuits the chain") {
    val log = newLog("graft-delta-ckpt")
    val wide = TableLog.FullManifestMaxEntries + 8
    var state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))
    (2L to TableLog.CheckpointInterval + 2).foreach { v =>
      state = state :+ entry(log, 2000 + v.toInt)
      assert(log.tryCommitEntries(Some(v - 1), state))
    }
    val cv = TableLog.CheckpointInterval
    assert(checkpointExists(log, cv), s"no checkpoint at version $cv")
    // prove resolution actually roots at the checkpoint: break the chain
    // BELOW it and the checkpointed version (and its successors) still
    // resolve, byte-exact
    Files.delete(Paths.get(log.tableDir, s"manifest-${cv - 1}"))
    TableLog.invalidateCache(log.tableDir)
    val f = fresh(log)
    assert(f.entriesAt(cv).size === wide + cv - 1)
    assert(f.entriesAt(cv + 2) === state)
    // the version whose chain is genuinely severed fails loudly
    intercept[IllegalArgumentException](fresh(log).entriesAt(cv - 1))
  }

  test("a missing checkpoint only lengthens the walk — resolution falls back to the chain") {
    val log = newLog("graft-delta-nockpt")
    val wide = TableLog.FullManifestMaxEntries + 8
    var state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))
    (2L to TableLog.CheckpointInterval + 2).foreach { v =>
      state = state :+ entry(log, 5000 + v.toInt)
      assert(log.tryCommitEntries(Some(v - 1), state))
    }
    val cv = TableLog.CheckpointInterval
    Files.delete(Paths.get(log.tableDir, s"checkpoint-$cv"))
    TableLog.invalidateCache(log.tableDir)
    // every version still resolves — the chain just walks to the v1 full
    // manifest instead of stopping at the (now missing) checkpoint
    assert(fresh(log).entriesAt(cv + 2) === state)
    assert(fresh(log).entriesAt(cv).size === wide + cv.toInt - 1)
  }

  test("a reordering commit falls back to a full manifest") {
    val log = newLog("graft-delta-reorder")
    val wide = TableLog.FullManifestMaxEntries + 10
    val state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))
    val reordered = state.reverse
    assert(log.tryCommitEntries(Some(1L), reordered))
    assert(!TableLog.isDelta(manifestText(log, 2)),
      "a reordered entry list cannot be expressed as a delta")
    assert(fresh(log).entriesAt(2) === reordered)
  }

  test("vacuum roots the oldest kept delta version in a checkpoint and reclaims stale ones") {
    val log = newLog("graft-delta-vacuum")
    val wide = TableLog.FullManifestMaxEntries + 4
    var state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))
    val states = scala.collection.mutable.Map(1L -> state)
    (2L to 8L).foreach { v =>
      state = state.drop(1) :+ entry(log, 3000 + v.toInt)
      assert(log.tryCommitEntries(Some(v - 1), state))
      states(v) = state
    }
    val stats = log.vacuum(keepVersions = 3)
    assert(stats.manifestsDropped === 5)
    assert(checkpointExists(log, 6), "oldest kept delta version must gain a checkpoint root")
    val f = fresh(log)
    (6L to 8L).foreach(v => assert(f.entriesAt(v) === states(v), s"version $v"))
    intercept[IllegalArgumentException](fresh(log).entriesAt(5))
    // a later vacuum advances the root and reclaims the older checkpoint
    (9L to 10L).foreach { v =>
      state = state :+ entry(log, 3100 + v.toInt)
      assert(log.tryCommitEntries(Some(v - 1), state))
      states(v) = state
    }
    log.vacuum(keepVersions = 2)
    assert(!checkpointExists(log, 6), "stale checkpoint not reclaimed")
    assert(checkpointExists(log, 9))
    assert(fresh(log).entriesAt(9) === states(9L))
    assert(fresh(log).entriesAt(10) === states(10L))
  }

  test("two writers racing appends on a wide table: every commit survives the delta path") {
    val log = newLog("graft-delta-race")
    val wide = TableLog.FullManifestMaxEntries + 16
    assert(log.tryCommitEntries(None, (0 until wide).map(entry(log, _))))
    val perWriter = 24
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def writer(tag: Int): Thread = new Thread(() => {
      try {
        val l = fresh(log)
        var committed = 0
        var attempts = 0
        while (committed < perWriter) {
          attempts += 1
          require(attempts < perWriter * 1000, "CAS starvation in the race spec")
          val expected = l.latestVersion
          val cur = expected.map(l.entriesAt).getOrElse(Nil)
          if (l.tryCommitEntries(expected,
              cur :+ entry(log, 9000 + tag * 1000 + committed)))
            committed += 1
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, s"delta-race-$tag")
    val ts = Seq(writer(1), writer(2))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(ts.forall(!_.isAlive), "a racing writer hung")
    assert(failure.get() === null, s"racing writer failed: ${failure.get()}")
    TableLog.invalidateCache(log.tableDir)
    val f = fresh(log)
    assert(f.latestVersion === Some(1L + 2 * perWriter))
    val dirs = f.currentEntries().map(_.dir)
    assert(dirs.size === wide + 2 * perWriter)
    (1 to 2).foreach { tag =>
      (0 until perWriter).foreach { i =>
        assert(dirs.count(_.endsWith(s"/d-${9000 + tag * 1000 + i}")) === 1,
          s"writer $tag commit $i lost or duplicated")
      }
    }
    // periodic checkpoints landed under contention (single winner per version)
    assert(Files.exists(Paths.get(log.tableDir, s"checkpoint-${TableLog.CheckpointInterval}")) ||
      Files.exists(Paths.get(log.tableDir, s"checkpoint-${2 * TableLog.CheckpointInterval}")),
      "no checkpoint landed during the race")
  }

  test("history() walks delta chains forward with correct per-version accounting") {
    val log = newLog("graft-delta-history")
    val wide = TableLog.FullManifestMaxEntries + 2
    var state = (0 until wide).map(entry(log, _))
    assert(log.tryCommitEntries(None, state))
    state = state :+ entry(log, 4000)
    assert(log.tryCommitEntries(Some(1L), state))
    state = state.drop(2)
    assert(log.tryCommitEntries(Some(2L), state))
    val h = log.history()
    assert(h.map(_.version) === Seq(3L, 2L, 1L))
    assert(h.map(_.dirs) === Seq(wide - 1, wide + 1, wide))
    // physical rows come from the committed stats of each RESOLVED state
    val expectRows = state.flatMap(_.stats).map(_.rows).sum
    assert(h.head.physicalRows === Some(expectRows))
  }
}
