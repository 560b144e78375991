package graft.connector

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.write.{RowLevelOperation, WriterCommitMessage}

/** CAS auto-merge for provably-disjoint merge-on-read rewrites: two
  * writers pinning ONE snapshot and deleting from ONE dir used to make the
  * loser throw ConcurrentModificationException even when their position
  * sets could not interact. The commit loop now merges when the current
  * vector still extends the pinned one AND the concurrent additions miss
  * our fresh deletions; overlap (or a rewrite) still fails.
  */
class DisjointRewriteSpec extends LakeSpec {
  protected def catalogName = "djlake"

  /** One-file dir: range(..., numSlices = 1) writes one task's parquet, so
    * position i within the file is the row with k = i.
    */
  private def seed(name: String, n: Int): String = {
    sql(s"CREATE TABLE djlake.db.$name (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql(s"INSERT INTO djlake.db.$name SELECT id FROM range(0, $n, 1, 1)")
    val dir = log(s"db/$name").currentDirs().head
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get.toString
  }

  private def deleteMsg(file: String, pos: Long*): Array[WriterCommitMessage] =
    Array(DvDeltaMessage(Map(file -> pos.toArray), Map.empty, 0,
      Array.emptyLongArray, 0L, 0L, null))

  test("disjoint same-dir deletes from one pinned snapshot both succeed") {
    sql("CREATE NAMESPACE IF NOT EXISTS djlake.db")
    val file = seed("t", 10)
    val l = log("db/t")
    val pinned = l.currentEntries()
    // both writers pin version 1; B commits first, A's precomputed
    // replacement is stale but position-disjoint -> the loop merges
    val b = new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE)
    b.commit(deleteMsg(file, 0L, 2L))                                  // v2
    val a = new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE)
    a.commit(deleteMsg(file, 1L, 3L))                                  // v3, unaided
    assert(l.latestVersion.contains(3L))
    assert(rows("SELECT k FROM djlake.db.t ORDER BY k") ===
      (4 until 10).map(i => Row(i.toLong)))
  }

  test("overlapping deletes from a stale snapshot still conflict") {
    val file = seed("o", 10)
    val l = log("db/o")
    val pinned = l.currentEntries()
    new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE).commit(deleteMsg(file, 3L))    // v2
    val loser = new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE)
    val e = intercept[java.util.ConcurrentModificationException](
      loser.commit(deleteMsg(file, 3L, 5L)))
    assert(e.getMessage.contains("overlap"), e.getMessage)
    // the survivor's state is intact: only position 3 deleted
    assert(rows("SELECT count(*) FROM djlake.db.o") === Seq(Row(9L)))
  }

  test("a fully-deleting concurrent writer still conflicts (dir collapsed)") {
    val file = seed("fd", 4)
    val l = log("db/fd")
    val pinned = l.currentEntries()
    new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE)
      .commit(deleteMsg(file, 0L, 1L, 2L, 3L))                         // v2: dir gone
    val loser = new GraftDvBatchWrite(l, pinned, None, None,
      RowLevelOperation.Command.DELETE)
    intercept[java.util.ConcurrentModificationException](
      loser.commit(deleteMsg(file, 1L)))
  }

  test("SQL: disjoint mor UPDATE and DELETE race to success unaided") {
    sql("CREATE TABLE djlake.db.race (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read', " +
      "'graft.update.mode'='merge-on-read')")
    sql("INSERT INTO djlake.db.race SELECT id, 'seed' FROM range(0, 100)")
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val updater = new Thread(() => {
      try sql("UPDATE djlake.db.race SET v = 'u' WHERE k % 2 = 0")
      catch { case t: Throwable => failures.add(t) }
    })
    val deleter = new Thread(() => {
      try sql("DELETE FROM djlake.db.race WHERE k % 2 = 1")
      catch { case t: Throwable => failures.add(t) }
    })
    Seq(updater, deleter).foreach(_.start())
    Seq(updater, deleter).foreach(_.join(120000))
    // ONE attempt each, NO statement-level retry: position-disjoint
    // rewrites must converge inside the commit loop
    assert(failures.isEmpty, s"unexpected: ${failures.toArray.mkString("; ")}")
    assert(rows("SELECT count(*) c, count(distinct v) dv FROM djlake.db.race") ===
      Seq(Row(50L, 1L)))
    assert(rows("SELECT count(*) FROM djlake.db.race WHERE v = 'u'") ===
      Seq(Row(50L)))
  }
}
