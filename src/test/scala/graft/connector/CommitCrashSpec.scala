package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row

/** Crash-point fault injection over the commit protocol (round-15 verdict
  * item 6). A writer's commit is four distinct filesystem steps:
  *
  *   1. staged data dirs written (`data/d-*` — parquet files finalized),
  *   2. deletion-vector / pre-post marker vector files written (under
  *      `dv/`),
  *   3. manifest CAS (content staged to `.tmp-*`, then the atomic
  *      fail-if-exists rename to `manifest-(v+1)` — the ONLY visible
  *      mutation),
  *   4. best-effort `_latest` hint overwrite.
  *
  * Every step before the rename only CREATES uniquely-named invisible
  * files, so the exact on-disk state a process killed between steps leaves
  * behind IS "the artifacts of the completed steps, nothing else" — these
  * tests construct each such state with the same allocation APIs the
  * writers use (`newDataDir` / `newDvFile` / the `.tmp-` staging name) and
  * prove the two durability claims the TableLog doc makes:
  *
  *  - READER INVARIANCE: a reader (catalog SQL face and raw log API)
  *    observes the same snapshot before and after the crash litter exists,
  *    and later writers commit right past it;
  *  - VACUUM RECLAMATION: within the orphan retention window the litter is
  *    PROTECTED (it is indistinguishable from an in-flight write's staging
  *    — deleting it would publish a manifest pointing at nothing), and
  *    past the window every class of it (data dir, vector file, torn
  *    `.tmp-` manifest) is reclaimed.
  *
  * Step 4's crash (manifest visible, hint stale) is the one state a reader
  * must actively HEAL, not ignore — covered by the stale-low and garbled
  * hint tests.
  */
class CommitCrashSpec extends LakeSpec {
  protected def catalogName = "crashlake"

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapshot(t: String): Seq[Row] =
    rows(s"SELECT * FROM crashlake.db.$t ORDER BY k")

  test("crash after staging a data dir: invisible, protected, then reclaimed") {
    sql("CREATE NAMESPACE IF NOT EXISTS crashlake.db")
    sql("CREATE TABLE crashlake.db.cd (k BIGINT)")
    sql("INSERT INTO crashlake.db.cd VALUES (1), (2)")                // v1
    val before = snapshot("cd")
    val l = log("db/cd")

    // the crash state: a finished parquet dir that no manifest references
    val orphan = l.newDataDir()
    spark.range(100, 103).selectExpr("id AS k").write.parquet(orphan)
    assert(l.latestVersion === Some(1L))
    assert(snapshot("cd") === before, "reader must not see uncommitted data")

    // within the retention window the orphan is an in-flight write's
    // staging as far as vacuum can know — it must survive
    l.vacuum(keepVersions = 10, orphanRetentionMs = 60L * 60 * 1000)
    assert(fs.exists(new Path(orphan)), "in-flight staging reclaimed early")

    // a later writer commits right past the litter
    sql("INSERT INTO crashlake.db.cd VALUES (3)")                     // v2
    assert(l.latestVersion === Some(2L))
    assert(snapshot("cd") === Seq(Row(1L), Row(2L), Row(3L)))

    // past the window the orphan is reclaimed, readers unaffected
    Thread.sleep(50)
    val stats = l.vacuum(keepVersions = 10, orphanRetentionMs = 0)
    assert(!fs.exists(new Path(orphan)), "orphan dir survived vacuum")
    assert(stats.pathsReclaimed >= 1)
    assert(snapshot("cd") === Seq(Row(1L), Row(2L), Row(3L)))
  }

  test("crash after writing vector files: invisible, protected, then reclaimed") {
    sql("CREATE TABLE crashlake.db.cv (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO crashlake.db.cv SELECT id FROM range(0, 10)")    // v1
    sql("DELETE FROM crashlake.db.cv WHERE k = 0")                    // v2 (live dv)
    val l = log("db/cv")
    val before = snapshot("cv")

    // the crash state: a mor writer died after step 2 — entry vector and
    // a pre-image marker vector written, manifest never renamed
    val orphanDv = l.newDvFile()
    val orphanPre = l.newPreDvFile()
    DeletionVector.write(orphanDv, l.hadoopConf,
      DeletionVector(Map("part-00000" -> Array(1L, 2L))))
    DeletionVector.write(orphanPre, l.hadoopConf,
      DeletionVector(Map("part-00000" -> Array(1L))))
    assert(l.latestVersion === Some(2L))
    assert(snapshot("cv") === before, "uncommitted vectors must not apply")

    l.vacuum(keepVersions = 10, orphanRetentionMs = 60L * 60 * 1000)
    assert(fs.exists(new Path(orphanDv)) && fs.exists(new Path(orphanPre)),
      "in-flight vector files reclaimed early")

    Thread.sleep(50)
    l.vacuum(keepVersions = 10, orphanRetentionMs = 0)
    assert(!fs.exists(new Path(orphanDv)), "orphan entry vector survived")
    assert(!fs.exists(new Path(orphanPre)), "orphan pre-image vector survived")
    // the LIVE vector (referenced by the kept head) survives retention 0
    assert(snapshot("cv") === before)
    assert(l.currentEntries().exists(_.dv.isDefined),
      "live vector reclaimed by the orphan sweep")
  }

  test("crash mid-manifest-write: a torn .tmp- file never becomes a version") {
    sql("CREATE TABLE crashlake.db.ct (k BIGINT)")
    sql("INSERT INTO crashlake.db.ct VALUES (7)")                     // v1
    val l = log("db/ct")

    // the crash state: writeAtomic's staging file with PARTIAL content
    // (the process died mid-write — rename never ran)
    val torn = new Path(s"$root/db/ct", ".tmp-crash-spec")
    val out = fs.create(torn, true)
    out.write("data/d-abc\tgarbage-trunc".getBytes("UTF-8"))
    out.close()

    assert(l.latestVersion === Some(1L), "a .tmp- file must never count as a version")
    assert(snapshot("ct") === Seq(Row(7L)))
    // a later commit CASes past it normally
    sql("INSERT INTO crashlake.db.ct VALUES (8)")                     // v2
    assert(l.latestVersion === Some(2L))

    l.vacuum(keepVersions = 10, orphanRetentionMs = 60L * 60 * 1000)
    assert(fs.exists(torn), "a young .tmp- could be a racing writer's staging")
    Thread.sleep(50)
    l.vacuum(keepVersions = 10, orphanRetentionMs = 0)
    assert(!fs.exists(torn), "expired .tmp- staging survived vacuum")
    assert(snapshot("ct") === Seq(Row(7L), Row(8L)))
  }

  test("crash between manifest rename and hint update: readers heal forward") {
    sql("CREATE TABLE crashlake.db.ch (k BIGINT)")
    sql("INSERT INTO crashlake.db.ch VALUES (1)")                     // v1
    sql("INSERT INTO crashlake.db.ch VALUES (2)")                     // v2
    val l = log("db/ch")
    assert(l.latestVersion === Some(2L))

    // the crash state: manifest-2 visible but the writer died before the
    // hint overwrite — the hint reads stale-LOW
    val hint = new Path(s"$root/db/ch", "_latest")
    val out = fs.create(hint, true); out.write("1".getBytes("UTF-8")); out.close()
    // a FRESH log handle (no memoized state) must probe forward to v2
    val l2 = log("db/ch")
    assert(l2.latestVersion === Some(2L), "stale-low hint not healed")
    assert(snapshot("ch") === Seq(Row(1L), Row(2L)))

    // torn hint content (crash mid-overwrite): fall back to the listing
    val out2 = fs.create(hint, true); out2.write("13xq".getBytes("UTF-8")); out2.close()
    assert(log("db/ch").latestVersion === Some(2L), "garbled hint not healed")

    // and the next successful commit repairs the hint for good
    sql("INSERT INTO crashlake.db.ch VALUES (3)")                     // v3
    assert(log("db/ch").latestVersion === Some(3L))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/db/ch/_latest")), "UTF-8").trim === "3")
  }

  test("vacuum racing live appends never loses a commit or a referenced dir") {
    sql("CREATE TABLE crashlake.db.vw (k BIGINT)")
    sql("INSERT INTO crashlake.db.vw VALUES (-1)")   // v1 so vacuum has work
    val l = log("db/vw")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vacuumErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    // maintenance thread: aggressive version retention, but the orphan
    // window open (in-flight staging of the racing writer must survive)
    val vac = new Thread(() => {
      while (!stop.get()) {
        try l.vacuum(keepVersions = 2, orphanRetentionMs = 60L * 60 * 1000)
        catch { case t: Throwable => vacuumErr.compareAndSet(null, t) }
        Thread.sleep(5)
      }
    })
    vac.start()
    val n = 25
    try (0 until n).foreach(i =>
      sql(s"INSERT INTO crashlake.db.vw VALUES ($i)"))
    finally { stop.set(true); vac.join() }
    assert(vacuumErr.get() === null,
      s"vacuum must tolerate live writers: ${vacuumErr.get()}")
    // every commit survived: the seed row plus all n appends
    assert(rows("SELECT count(*) FROM crashlake.db.vw") === Seq(Row(n + 1L)))
    assert(snapshot("vw").map(_.getLong(0)) === (-1L until n.toLong))
    // the kept tail of history still reads (vacuum kept >= 2 versions)
    val latest = l.latestVersion.get
    assert(l.entriesAt(latest).nonEmpty && l.entriesAt(latest - 1).nonEmpty)
  }

  test("schema-evolving ALTERs racing live appends serialize through the CAS") {
    // ALTER commits its meta header through the same manifest CAS as data
    // writes; racing the two must (a) never lose an append, (b) leave one
    // coherent head schema, and (c) read pre-ALTER files as NULL for the
    // added column — whichever side of each ALTER an append's files landed.
    sql("CREATE TABLE crashlake.db.ar (k BIGINT)")
    val appenderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appender = new Thread(() => {
      var i = 0
      try while (!stop.get() && i < 200) {
        sql(s"INSERT INTO crashlake.db.ar(k) VALUES ($i)")
        i += 1
      } catch { case t: Throwable => appenderErr.set(t) }
    })
    appender.start()
    try {
      Thread.sleep(50)
      sql("ALTER TABLE crashlake.db.ar ADD COLUMNS (tag STRING)")
      Thread.sleep(50)
      sql("ALTER TABLE crashlake.db.ar RENAME COLUMN tag TO label")
      Thread.sleep(50)
    } finally { stop.set(true); appender.join() }
    assert(appenderErr.get() === null, s"appender died: ${appenderErr.get()}")
    assert(sql("SELECT * FROM crashlake.db.ar").schema.fieldNames.toSeq ===
      Seq("k", "label"))
    // no append lost: k values are the contiguous prefix the appender got to
    val ks = rows("SELECT k FROM crashlake.db.ar ORDER BY k").map(_.getLong(0))
    assert(ks === (0L until ks.size.toLong), s"lost or duplicated appends: $ks")
    assert(ks.nonEmpty)
    // the added-then-renamed column reads NULL everywhere (no file has it)
    assert(rows("SELECT count(*) FROM crashlake.db.ar WHERE label IS NOT NULL")
      === Seq(Row(0L)))
  }

  test("combined mid-MERGE crash litter does not block or corrupt later commits") {
    sql("CREATE TABLE crashlake.db.cm (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO crashlake.db.cm SELECT id, 0 FROM range(0, 6)")  // v1
    val l = log("db/cm")

    // the crash state after steps 1+2 of a mor MERGE: staged insert dir,
    // grown entry vector, pre/post marker vectors — manifest never renamed
    val staged = l.newDataDir()
    spark.range(100, 104).selectExpr("id AS k", "id AS v").write.parquet(staged)
    Seq(l.newDvFile(), l.newPreDvFile()).foreach(p =>
      DeletionVector.write(p, l.hadoopConf,
        DeletionVector(Map("part-00000" -> Array(0L)))))

    // a REAL MERGE now runs against the same table and must be oblivious
    sql("MERGE INTO crashlake.db.cm t USING (SELECT id k, 9 v FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                               // v2
    assert(rows("SELECT count(*) c, sum(v) s FROM crashlake.db.cm") ===
      Seq(Row(8L, 36L)))
    // the change feed over the REAL commit is exact — the litter's marker
    // vectors must not leak into classification
    val f = ChangeFeed.between(spark, l, 1, 2)
      .select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(f === Set(("update_preimage", 4L), ("update_preimage", 5L),
      ("update_postimage", 4L), ("update_postimage", 5L),
      ("insert", 6L), ("insert", 7L)))

    Thread.sleep(50)
    l.vacuum(keepVersions = 10, orphanRetentionMs = 0)
    assert(!fs.exists(new Path(staged)), "crashed staged dir survived vacuum")
    assert(rows("SELECT count(*) c, sum(v) s FROM crashlake.db.cm") ===
      Seq(Row(8L, 36L)))
  }
}
