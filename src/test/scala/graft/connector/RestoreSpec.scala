package graft.connector

import org.apache.spark.sql.Row

/** `CALL lake.system.restore(table, version)` — version rollback as a new
  * commit reinstating the target version's entries + meta header. The
  * headline scenario is the operational one: undo a bad MERGE without
  * rewriting data, with history/time-travel intact and vacuum still safe.
  */
class RestoreSpec extends LakeSpec {
  protected def catalogName = "rstlake"

  test("restore undoes a bad MERGE; history and time travel stay intact") {
    sql("CREATE NAMESPACE IF NOT EXISTS rstlake.db")
    sql("CREATE TABLE rstlake.db.t (k BIGINT, v BIGINT)")
    sql("INSERT INTO rstlake.db.t SELECT id, id * 10 FROM range(0, 10)")    // v1
    sql("INSERT INTO rstlake.db.t SELECT id, id * 10 FROM range(10, 20)")   // v2
    // the "bad MERGE": zeroes every even key and deletes every k >= 15
    sql("MERGE INTO rstlake.db.t t USING (SELECT id k FROM range(0, 20)) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND t.k >= 15 THEN DELETE " +
      "WHEN MATCHED AND t.k % 2 = 0 THEN UPDATE SET v = 0")                 // v3
    assert(rows("SELECT count(*) FROM rstlake.db.t WHERE v = 0").head.getLong(0) === 8L)

    val r = rows("CALL rstlake.system.restore(`table` => 'db.t', version => 2)")
    assert(r === Seq(Row(2L, 4L, 2)), s"restored_to=2, new_version=4, 2 dirs: $r")
    // content is exactly v2's again
    assert(rows("SELECT count(*) c, sum(v) s FROM rstlake.db.t") ===
      Seq(Row(20L, (0 until 20).map(_ * 10L).sum)))
    // nothing rewritten: every historical version still reads
    assert(rows("SELECT count(*) FROM rstlake.db.t VERSION AS OF 1").head.getLong(0) === 10L)
    assert(rows("SELECT count(*) FROM rstlake.db.t VERSION AS OF 3").head.getLong(0) === 15L)
    // history records the rollback as its own operation
    val ops = log("db/t").history().map(_.operation)
    assert(ops.exists(_.contains("RESTORE (to version 2)")), s"ops: $ops")
  }

  test("restore past a bad ALTER also reinstates the schema") {
    sql("CREATE TABLE rstlake.db.s (k BIGINT, v STRING)")
    sql("INSERT INTO rstlake.db.s VALUES (1, 'a')")                          // v1
    sql("ALTER TABLE rstlake.db.s DROP COLUMN v")                            // v2
    assert(sql("SELECT * FROM rstlake.db.s").schema.fieldNames.toSeq === Seq("k"))
    sql("CALL rstlake.system.restore(`table` => 'db.s', version => 1)")     // v3
    assert(sql("SELECT * FROM rstlake.db.s").schema.fieldNames.toSeq === Seq("k", "v"))
    assert(rows("SELECT k, v FROM rstlake.db.s") === Seq(Row(1L, "a")))
  }

  test("vacuum after restore keeps the reinstated dirs alive") {
    sql("CREATE TABLE rstlake.db.vac (k BIGINT)")
    sql("INSERT INTO rstlake.db.vac VALUES (1)")                             // v1
    sql("INSERT INTO rstlake.db.vac VALUES (2)")                             // v2
    sql("DELETE FROM rstlake.db.vac WHERE k = 1")                            // v3 (cow rewrite)
    sql("CALL rstlake.system.restore(`table` => 'db.vac', version => 2)")   // v4
    // keep only the restored head: its dirs are v1+v2's originals and MUST
    // survive reclamation because the head manifest references them
    sql("CALL rstlake.system.vacuum(`table` => 'db.vac', keep_versions => 1, " +
      "orphan_retention_ms => 0)")
    assert(rows("SELECT k FROM rstlake.db.vac ORDER BY k") ===
      Seq(Row(1L), Row(2L)))
  }

  test("restore to a vacuumed version fails loudly; restore to 0 empties") {
    sql("CREATE TABLE rstlake.db.gone (k BIGINT)")
    sql("INSERT INTO rstlake.db.gone VALUES (1)")                            // v1
    sql("INSERT INTO rstlake.db.gone VALUES (2)")                            // v2
    sql("INSERT INTO rstlake.db.gone VALUES (3)")                            // v3
    sql("CALL rstlake.system.vacuum(`table` => 'db.gone', keep_versions => 1, " +
      "orphan_retention_ms => 0)")
    val e = intercept[Exception](
      rows("CALL rstlake.system.restore(`table` => 'db.gone', version => 1)"))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // out-of-range target is refused up front
    val oor = intercept[Exception](
      rows("CALL rstlake.system.restore(`table` => 'db.gone', version => 99)"))
    assert(oor.getMessage.contains("out of range"), oor.getMessage)

    sql("CREATE TABLE rstlake.db.zero (k BIGINT)")
    sql("INSERT INTO rstlake.db.zero VALUES (7)")                            // v1
    val r = rows("CALL rstlake.system.restore(`table` => 'db.zero', version => 0)")
    assert(r === Seq(Row(0L, 2L, 0)))
    assert(rows("SELECT count(*) FROM rstlake.db.zero") === Seq(Row(0L)))
    // the rollback itself is restorable: back to v1's single row
    sql("CALL rstlake.system.restore(`table` => 'db.zero', version => 1)")
    assert(rows("SELECT k FROM rstlake.db.zero") === Seq(Row(7L)))
  }

  test("mor restore across vector changes keeps the change feed replayable") {
    sql("CREATE TABLE rstlake.db.mcf (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO rstlake.db.mcf SELECT id FROM range(0, 10, 1, 1)")  // v1
    sql("DELETE FROM rstlake.db.mcf WHERE k = 0")                        // v2: dv{0}
    sql("DELETE FROM rstlake.db.mcf WHERE k = 1")                        // v3: dv{0,1}
    // restore to v2: the surviving dir's vector would SHRINK, which the
    // feed's diff invariant forbids — the procedure rewrites that dir
    // instead, and k=1 resurrects
    sql("CALL rstlake.system.restore(`table` => 'db.mcf', version => 2)") // v4
    assert(rows("SELECT k FROM rstlake.db.mcf ORDER BY k") ===
      (1L until 10L).map(Row(_)))
    // the feed replays across the restore without crashing, and its net
    // effect reconstructs the live snapshot (the resurrection included)
    val l = log("db/mcf")
    val f = ChangeFeed.between(spark, l, 0L, l.latestVersion.get)
    val net = f.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col(ChangeFeed.TypeCol)
            .isin("insert", "update_postimage"), 1).otherwise(-1)).as("n"))
      .where("n != 0").select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(net === (1L until 10L).toSeq)
    // restore to v1 (vector VANISHES on the current head's surviving
    // entry... which was already rewritten, so now it's a plain re-add):
    // k=0 resurrects too and the feed still replays
    sql("CALL rstlake.system.restore(`table` => 'db.mcf', version => 1)") // v5
    assert(rows("SELECT count(*) FROM rstlake.db.mcf") === Seq(Row(10L)))
    val f2 = ChangeFeed.between(spark, l, 0L, l.latestVersion.get)
    assert(f2.count() > 0)   // replay spans both restores without the require trip
  }

  test("restore racing concurrent appends converges without losing either side") {
    // RESTORE commits through the normal CAS with a retry loop that
    // re-diffs the conflict set against the moving head (Procedures.scala
    // rewrittenFor memoization) — race it against a live appender: the
    // restore must land, and every append committed AFTER the restore's
    // winning version must survive in the final state (appends the restore
    // raced past are legitimately rolled back — that is what restore is).
    sql("CREATE TABLE rstlake.db.race (k BIGINT)")
    sql("INSERT INTO rstlake.db.race VALUES (-1)")                       // v1
    sql("INSERT INTO rstlake.db.race VALUES (-2)")                       // v2
    val l = log("db/race")
    val appenderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appender = new Thread(() => {
      var i = 0
      try while (!stop.get() && i < 200) {
        sql(s"INSERT INTO rstlake.db.race VALUES ($i)")
        i += 1
      } catch { case t: Throwable => appenderErr.set(t) }
    })
    appender.start()
    try {
      Thread.sleep(100)   // let some appends land so the restore races real traffic
      val r = rows("CALL rstlake.system.restore(`table` => 'db.race', version => 1)")
      val restoredVersion = r.head.getLong(1)
      stop.set(true); appender.join()
      assert(appenderErr.get() === null, s"appender died: ${appenderErr.get()}")
      // invariant: the final state = v1's row plus exactly the appends
      // whose commit version is AFTER the restore's
      val latest = l.latestVersion.get
      val after = (restoredVersion + 1 to latest).map(v =>
        l.entriesAt(v).size - l.entriesAt(v - 1).size).sum
      val ks = rows("SELECT k FROM rstlake.db.race ORDER BY k").map(_.getLong(0))
      assert(ks.contains(-1L), "the restored version's row vanished")
      assert(!ks.contains(-2L), "a rolled-back pre-restore append survived")
      assert(ks.size === 1 + after,
        s"final rows $ks vs restored-base 1 + $after post-restore appends")
    } finally { stop.set(true); appender.join() }
  }

  test("restored mor version keeps its deletion vector") {
    sql("CREATE TABLE rstlake.db.mor (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO rstlake.db.mor SELECT id FROM range(0, 10)")            // v1
    sql("DELETE FROM rstlake.db.mor WHERE k % 2 = 0")                        // v2 (vector)
    sql("INSERT INTO rstlake.db.mor VALUES (100)")                           // v3
    sql("CALL rstlake.system.restore(`table` => 'db.mor', version => 2)")   // v4
    // the reinstated entry carries v2's vector: deleted evens stay deleted
    assert(rows("SELECT k FROM rstlake.db.mor ORDER BY k") ===
      Seq(Row(1L), Row(3L), Row(5L), Row(7L), Row(9L)))
  }
}
