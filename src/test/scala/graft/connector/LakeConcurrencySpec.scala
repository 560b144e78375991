package graft.connector

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row

/** Randomized interleaving of the catalog's committers — concurrent
  * appends, merge-on-read deletes, and compaction racing on ONE table.
  * The contract under test: appends always converge (CAS retry), a
  * conflicted delete retries to success, a conflicted compaction skips,
  * and the final state equals the serial accounting of the operations
  * that reported success — no lost rows, no resurrections, no torn
  * manifests.
  */
class LakeConcurrencySpec extends LakeSpec {
  protected def catalogName = "conclake"

  test("appends, mor deletes, and compaction race to a consistent state") {
    sql("CREATE NAMESPACE IF NOT EXISTS conclake.db")
    sql("CREATE TABLE conclake.db.race (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    // seed: 2 dirs of 100 rows each (keys 0..199)
    sql("INSERT INTO conclake.db.race SELECT id, 'seed' FROM range(0, 100)")
    sql("INSERT INTO conclake.db.race SELECT id, 'seed' FROM range(100, 200)")
    val l = log("db/race")

    val appended = new AtomicInteger(0)
    val deleted = new AtomicInteger(0)
    val compactions = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def isConflict(t: Throwable): Boolean = {
      var c = t
      while (c != null) {
        if (c.isInstanceOf[java.util.ConcurrentModificationException]) return true
        c = c.getCause
      }
      false
    }

    val appender = new Thread(() => {
      try {
        (0 until 8).foreach { i =>
          val lo = 1000 + i * 10
          sql(s"INSERT INTO conclake.db.race SELECT id, 'app' FROM range($lo, ${lo + 10})")
          appended.addAndGet(10)
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val deleter = new Thread(() => {
      try {
        (0 until 12).foreach { i =>
          var done = false
          while (!done) {
            try {
              sql(s"DELETE FROM conclake.db.race WHERE k = $i")
              done = true
              deleted.incrementAndGet()
            } catch {
              case t: Throwable if isConflict(t) => ()   // retry the statement
            }
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val compactor = new Thread(() => {
      try {
        (0 until 6).foreach { _ =>
          try { if (Compaction.compact(spark, l)) compactions.incrementAndGet() }
          catch { case t: Throwable if isConflict(t) => () }   // lost the race: skip
          Thread.sleep(30)
        }
      } catch { case t: Throwable => failures.add(t) }
    })

    Seq(appender, deleter, compactor).foreach(_.start())
    Seq(appender, deleter, compactor).foreach(_.join(120000))
    assert(failures.isEmpty, s"unexpected failures: ${failures.toArray.mkString("; ")}")
    assert(appended.get() === 80)
    assert(deleted.get() === 12)

    // serial accounting: 200 seeded + 80 appended - 12 deleted
    assert(rows("SELECT count(*) c FROM conclake.db.race") === Seq(Row(268L)))
    assert(rows("SELECT count(*) c FROM conclake.db.race WHERE k < 12") === Seq(Row(0L)))
    assert(rows("SELECT count(*) c FROM conclake.db.race WHERE v = 'app'") === Seq(Row(80L)))
    // manifest sanity: no duplicate dirs, strictly increasing history
    val entries = l.currentEntries()
    assert(entries.map(_.dir).distinct.size === entries.size)
    val hist = l.history()
    assert(hist.map(_.version) === hist.map(_.version).sorted.reverse)
    assert(hist.head.liveRows === Some(268L))
    // and a final full maintenance pass leaves the same rows
    Compaction.compact(spark, l)
    l.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    val expectedSum = (0L until 200L).filter(_ >= 12).sum +
      (0 until 8).map(i => (1000L + i * 10 until 1010L + i * 10).sum).sum
    val finalRow = rows("SELECT count(*) c, sum(k) s FROM conclake.db.race").head
    assert(finalRow.getLong(0) === 268L)
    assert(finalRow.getLong(1) === expectedSum)
  }

  test("materialized MERGE and concurrent appends converge unaided") {
    sql("CREATE TABLE conclake.db.mz (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize')")
    sql("INSERT INTO conclake.db.mz SELECT id, 'seed' FROM range(0, 100)")
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // appends touch no replaced dir, so the materialized commit's CAS loop
    // must absorb them (re-read, re-merge, commit) — no statement retry
    val appender = new Thread(() => {
      try (0 until 6).foreach { i =>
        sql(s"INSERT INTO conclake.db.mz SELECT id, 'app' FROM " +
          s"range(${1000 + i * 10}, ${1010 + i * 10})")
      } catch { case t: Throwable => failures.add(t) }
    })
    val merger = new Thread(() => {
      try sql("MERGE INTO conclake.db.mz t USING " +
        "(SELECT id k, 'upd' v FROM range(0, 50)) s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
      catch { case t: Throwable => failures.add(t) }
    })
    Seq(appender, merger).foreach(_.start())
    Seq(appender, merger).foreach(_.join(120000))
    assert(failures.isEmpty, s"unexpected: ${failures.toArray.mkString("; ")}")
    assert(rows("SELECT count(*) FROM conclake.db.mz") === Seq(Row(160L)))
    assert(rows("SELECT count(*) FROM conclake.db.mz WHERE v = 'upd'") ===
      Seq(Row(50L)))
    assert(log("db/mz").currentEntries().forall(_.dv.isEmpty))
  }

  test("history reports versions, rows, and live rows through deletes") {
    sql("CREATE TABLE conclake.db.h (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO conclake.db.h SELECT id FROM range(0, 50)")
    sql("DELETE FROM conclake.db.h WHERE k < 10")
    val hist = log("db/h").history()
    assert(hist.map(_.version) === Seq(2L, 1L))
    assert(hist.find(_.version == 1L).get.physicalRows === Some(50L))
    assert(hist.find(_.version == 1L).get.liveRows === Some(50L))
    assert(hist.find(_.version == 2L).get.physicalRows === Some(50L))
    assert(hist.find(_.version == 2L).get.liveRows === Some(40L))
  }
}
