package graft.connector

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row

/** End-to-end SQL integration over a WIDE table — one that crossed
  * [[TableLog.FullManifestMaxEntries]] (64) dirs, so its later commits are
  * `#delta` manifests with checkpoint files. ManifestDeltaSpec pins the log
  * layer in isolation; this suite drives the same machinery through the
  * catalog the way a user would — inserts past the threshold, a
  * group-pruned UPDATE, a merge-on-read DELETE (an entry REPLACED in place
  * through a delta), the change table, time travel onto both full and
  * delta versions, and a vacuum — and checks the data, not the format.
  */
class WideTableSpec extends LakeSpec {
  protected def catalogName = "wlake"

  // past FullManifestMaxEntries (64, so versions 65+ are deltas) AND past
  // the next CheckpointInterval multiple (80, so a periodic checkpoint
  // demonstrably lands)
  private val Dirs = 80

  private lazy val seeded: TableLog = {
    sql("CREATE NAMESPACE IF NOT EXISTS wlake.db")
    sql("CREATE TABLE wlake.db.w (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    (0 until Dirs).foreach { i =>
      sql(s"INSERT INTO wlake.db.w SELECT id, concat('v', id) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    log("db/w")
  }

  test("a table grown past the threshold commits deltas and checkpoints, reads intact") {
    val l = seeded
    assert(l.currentEntries().size === Dirs)
    // the commit that crossed 64 dirs and everything after is a delta
    val last = new String(
      Files.readAllBytes(Paths.get(l.tableDir, s"manifest-$Dirs")), "UTF-8")
    assert(TableLog.isDelta(last))
    // the periodic checkpoint landed at the first 16-multiple delta commit
    assert(Files.exists(Paths.get(l.tableDir, "checkpoint-80")),
      "no periodic checkpoint at version 80")
    // cold, from-disk read of the full table through the chain
    TableLog.invalidateCache(l.tableDir)
    assert(rows("SELECT count(*), sum(k) FROM wlake.db.w") ===
      Seq(Row(Dirs * 100L, (0L until Dirs * 100L).sum)))
  }

  test("UPDATE group-prunes through delta-resolved stats: one dir rewritten") {
    val l = seeded
    val before = l.currentEntries().map(_.dir)
    sql("UPDATE wlake.db.w SET v = 'HIT' WHERE k = 4242")
    val after = l.currentEntries().map(_.dir)
    assert(after.size === Dirs)
    assert(after.count(before.contains) === Dirs - 1,
      "exactly one dir should be rewritten for a point UPDATE")
    assert(rows("SELECT v FROM wlake.db.w WHERE k = 4242") === Seq(Row("HIT")))
    assert(rows("SELECT count(*) FROM wlake.db.w") === Seq(Row(Dirs * 100L)))
  }

  test("merge-on-read DELETE swaps one entry's vector through a delta commit") {
    val l = seeded
    val vBefore = l.latestVersion.get
    sql("DELETE FROM wlake.db.w WHERE k IN (1111, 2222)")
    val vAfter = l.latestVersion.get
    assert(vAfter === vBefore + 1)
    val manifest = new String(
      Files.readAllBytes(Paths.get(l.tableDir, s"manifest-$vAfter")), "UTF-8")
    assert(TableLog.isDelta(manifest), "a 2-row mor delete must not rewrite the manifest")
    assert(l.currentEntries().count(_.dv.isDefined) === 2)
    TableLog.invalidateCache(l.tableDir)
    assert(rows("SELECT count(*) FROM wlake.db.w WHERE k IN (1111, 2222)") ===
      Seq(Row(0L)))
    assert(rows("SELECT count(*) FROM wlake.db.w") === Seq(Row(Dirs * 100L - 2)))
  }

  test("time travel resolves full-manifest and delta versions alike") {
    val l = seeded
    // version 10: still in the full-manifest regime (10 dirs, 1000 rows)
    assert(rows("SELECT count(*) FROM wlake.db.w VERSION AS OF 10") === Seq(Row(1000L)))
    // version 67: a delta version mid-chain (67 dirs, 6700 rows)
    assert(rows("SELECT count(*) FROM wlake.db.w VERSION AS OF 67") === Seq(Row(6700L)))
  }

  test("the change table replays a delta-era append exactly") {
    val l = seeded
    val v0 = l.latestVersion.get
    sql("INSERT INTO wlake.db.w VALUES (999999, 'tail')")
    // startVersion is EXCLUSIVE (changes in (start, end]), like the
    // streaming offsets
    val ch = spark.read.option("startVersion", v0.toString)
      .table("wlake.db.w.changes")
      .select("k", "_change_type").collect().toSeq
    assert(ch === Seq(Row(999999L, "insert")))
  }

  test("compaction collapses the wide table through a full-manifest commit") {
    val l = seeded
    assert(Compaction.compact(spark, l, targetBytes = 512L << 20))
    val after = l.currentEntries()
    assert(after.size < 10, s"expected few merged dirs, got ${after.size}")
    // a compaction reorders/replaces entries wholesale — the replay
    // simulation must have fallen back to a FULL manifest
    val manifest = new String(Files.readAllBytes(
      Paths.get(l.tableDir, s"manifest-${l.latestVersion.get}")), "UTF-8")
    assert(!TableLog.isDelta(manifest))
    // vectors were applied and purged; the two mor-deleted rows stay gone
    assert(after.forall(_.dv.isEmpty))
    TableLog.invalidateCache(l.tableDir)
    assert(rows("SELECT count(*) FROM wlake.db.w") === Seq(Row(Dirs * 100L - 2 + 1)))
  }

  test("vacuum on the wide table keeps every live dir readable") {
    val l = seeded
    val stats = l.vacuum(keepVersions = 2, orphanRetentionMs = 0L)
    assert(stats.manifestsDropped > 0)
    TableLog.invalidateCache(l.tableDir)
    val total = rows("SELECT count(*) FROM wlake.db.w").head.getLong(0)
    assert(total >= Dirs * 100L - 2 && total <= Dirs * 100L + 1,
      s"unexpected row count after vacuum: $total")
    // the oldest kept version is checkpoint-rooted (its chain was dropped)
    val o = l.latestVersion.get - 1
    assert(l.entriesAt(o).nonEmpty)
  }
}
