package graft.connector

import org.apache.spark.sql.Row

/** APPLY CHANGES INTO ([[CdcApply]]): a replica maintained from the
  * `db.t.changes` stream tracks the source through every commit kind,
  * including the ones that fold to several versions of one key inside a
  * single micro-batch.
  */
class CdcApplySpec extends LakeSpec {
  protected def catalogName = "cdclake"

  private def assertReplicaMatches(src: String, dst: String): Unit =
    assert(rows(s"SELECT * FROM $src ORDER BY k") ===
      rows(s"SELECT * FROM $dst ORDER BY k"))

  test("replica tracks appends, mor deletes, cow updates, and re-inserts") {
    sql("CREATE NAMESPACE IF NOT EXISTS cdclake.db")
    sql("CREATE TABLE cdclake.db.src (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.dst (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdclake.db.src SELECT id, 0 FROM range(0, 8)")  // pre-stream
    val q = CdcApply.applyChanges(
      spark.readStream.option("startVersion", "0").table("cdclake.db.src.changes"),
      "cdclake.db.dst", Seq("k"), tmp("cdc-ckpt"))
    q.processAllAvailable()
    assertReplicaMatches("cdclake.db.src", "cdclake.db.dst")  // replayed history
    sql("INSERT INTO cdclake.db.src VALUES (100, 1)")
    q.processAllAvailable()
    assertReplicaMatches("cdclake.db.src", "cdclake.db.dst")
    sql("DELETE FROM cdclake.db.src WHERE k % 3 = 1")          // vector growth
    q.processAllAvailable()
    assertReplicaMatches("cdclake.db.src", "cdclake.db.dst")
    sql("UPDATE cdclake.db.src SET v = 7 WHERE k < 3")         // cow churn
    q.processAllAvailable()
    assertReplicaMatches("cdclake.db.src", "cdclake.db.dst")
    // delete + re-insert of one key lands in ONE batch: terminal change wins
    sql("DELETE FROM cdclake.db.src WHERE k = 100")
    sql("INSERT INTO cdclake.db.src VALUES (100, 2)")
    q.processAllAvailable()
    q.stop()
    assertReplicaMatches("cdclake.db.src", "cdclake.db.dst")
    assert(rows("SELECT v FROM cdclake.db.dst WHERE k = 100") === Seq(Row(2L)))
  }

  test("one-batch full-history replay folds every key to its terminal state") {
    sql("CREATE TABLE cdclake.db.s2 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.d2 (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdclake.db.s2 SELECT id, 0 FROM range(0, 10)")
    sql("UPDATE cdclake.db.s2 SET v = 1 WHERE k < 4")
    sql("DELETE FROM cdclake.db.s2 WHERE k % 4 = 2")
    assert(Compaction.compact(spark, log("db/s2")))
    // batch backfill through the same reduction+merge the stream uses
    CdcApply.applyBatch(
      spark.read.table("cdclake.db.s2.changes"),
      "cdclake.db.d2", Seq("k"), Seq("k", "v"))
    assertReplicaMatches("cdclake.db.s2", "cdclake.db.d2")
    // idempotence: re-applying the same changes converges, never duplicates
    CdcApply.applyBatch(
      spark.read.table("cdclake.db.s2.changes"),
      "cdclake.db.d2", Seq("k"), Seq("k", "v"))
    assertReplicaMatches("cdclake.db.s2", "cdclake.db.d2")
  }
}
