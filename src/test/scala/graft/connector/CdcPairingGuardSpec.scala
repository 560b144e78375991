package graft.connector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.unsafe.types.UTF8String

/** The mor MERGE exact update-pair attribution rides on an UNSPECIFIED
  * Spark physical-plan property: MergeRowsExec emits a split update's
  * delete half immediately followed by its reinsert half within one task.
  * These tests pin the runtime guard that keeps a future plan shape from
  * silently FABRICATING update pairs: the writer counts total reinserts
  * alongside paired ones, and the driver commit fails loudly on a gap —
  * unless `graft.cdc.exactPairing=false` opts the table into net-effect
  * change rows.
  */
class CdcPairingGuardSpec extends LakeSpec {
  protected def catalogName = "pairlake"

  private def feed(table: String, s: Long, e: Long): DataFrame =
    ChangeFeed.between(spark, log(table), s, e)

  /** Stub for the staged-row writer: rows vanish, calls are counted. */
  private class NullWriter extends DataWriter[InternalRow] {
    var written = 0L
    override def write(r: InternalRow): Unit = written += 1
    override def commit(): WriterCommitMessage = null
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }

  private def id(file: String, pos: Long): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(file), pos))

  private val row: InternalRow = new GenericInternalRow(Array[Any](1L))

  test("writer counts unpaired reinserts when the halves arrive torn apart") {
    val w = new DvDeltaWriter(0, Some(new NullWriter))
    // expected adjacency: delete immediately followed by its reinsert
    w.delete(null, id("f1", 3)); w.reinsert(null, row)
    // torn order (what a batched-per-side plan would deliver): two deletes,
    // then two reinserts — only the first reinsert finds a pending delete
    w.delete(null, id("f1", 5)); w.delete(null, id("f1", 7))
    w.reinsert(null, row); w.reinsert(null, row)
    val m = w.commit().asInstanceOf[DvDeltaMessage]
    assert(m.reinserts === 3)
    assert(m.postRows.length === 2, "the third reinsert found no pending delete")
    assert(m.deletes("f1").toSeq === Seq(3L, 5L, 7L))
    // the surviving pair is even attributed to the WRONG delete (the most
    // recent one, 7, not the reinsert's true half, 5) — which is exactly
    // why the count gap must fail the commit rather than ship
    assert(m.updateDeletes("f1").toSeq === Seq(3L, 7L))
  }

  test("driver commit fails loudly on a reinsert/pair count gap") {
    sql("CREATE NAMESPACE IF NOT EXISTS pairlake.db")
    sql("CREATE TABLE pairlake.db.guard (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO pairlake.db.guard SELECT id, 0 FROM range(0, 4)")
    val l = log("db/guard")
    val write = new GraftDvBatchWrite(l, l.currentEntries(), None, None,
      RowLevelOperation.Command.MERGE)
    // a task message a reordered plan would produce: 2 reinserted rows,
    // only 1 paired with an adjacent delete
    val torn = DvDeltaMessage(
      deletes = Map("f" -> Array(1L, 2L)),
      updateDeletes = Map("f" -> Array(1L)),
      partitionId = 0, postRows = Array(0L), stagedRows = 2L,
      reinserts = 2L, inserts = null)
    val e = intercept[IllegalStateException] {
      write.commit(Array[WriterCommitMessage](torn))
    }
    assert(e.getMessage.contains("update-pair attribution broke"))
    assert(e.getMessage.contains("graft.cdc.exactPairing"))
    // nothing committed: the table is still at the insert version
    assert(l.latestVersion.contains(1L))
  }

  test("exactPairing=false degrades a mor MERGE to net-effect change rows") {
    sql("CREATE TABLE pairlake.db.net (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read', " +
      "'graft.cdc.exactPairing'='false')")
    sql("INSERT INTO pairlake.db.net SELECT id, 0 FROM range(0, 6)")   // v1
    sql("MERGE INTO pairlake.db.net t USING (SELECT id k, 9 v FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                                // v2
    // no #cdc markers recorded -> the feed classifies net-effect: plain
    // delete + insert instead of update_pre/postimage pairs
    assert(log("db/net").cdcAt(2).isEmpty, "no pairing markers recorded")
    val f = feed("db/net", 1, 2).select("k", "v", "_change_type")
    assert(f.collect().toSet === Set(
      Row(4L, 0L, "delete"), Row(5L, 0L, "delete"),
      Row(4L, 9L, "insert"), Row(5L, 9L, "insert"),
      Row(6L, 9L, "insert"), Row(7L, 9L, "insert")))
    // the snapshot itself is unaffected by the lineage downgrade
    assert(sql("SELECT count(*) FROM pairlake.db.net").head().getLong(0) === 8L)
  }

  test("materialize + exactPairing=false: net-effect types, still churn-free") {
    sql("CREATE TABLE pairlake.db.mznet (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize', " +
      "'graft.cdc.exactPairing'='false')")
    sql("INSERT INTO pairlake.db.mznet SELECT id, 0 FROM range(0, 6)")   // v1
    sql("MERGE INTO pairlake.db.mznet t USING (SELECT id k, 9 v FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                                  // v2
    // pairing off drops only the pre/post SPLIT; the #cdcdel/#cdcadd
    // markers still carry exact positions, so the feed emits the 6 real
    // changes as plain delete+insert — never the 4 carryover rows
    val m = log("db/mznet").cdcAt(2).get
    assert(m.preImageDvByDir.isEmpty && m.postImageDvByDir.isEmpty)
    assert(m.deleteDvByDir.nonEmpty && m.addDirs.nonEmpty)
    val f = ChangeFeed.between(spark, log("db/mznet"), 1, 2)
      .select("k", "v", ChangeFeed.TypeCol)
    assert(f.collect().toSet === Set(
      Row(4L, 0L, "delete"), Row(5L, 0L, "delete"),
      Row(4L, 9L, "insert"), Row(5L, 9L, "insert"),
      Row(6L, 9L, "insert"), Row(7L, 9L, "insert")))
    assert(log("db/mznet").currentEntries().forall(_.dv.isEmpty))
  }

  test("mode and pairing property values are validated loudly, not routed to cow") {
    // CREATE: a typo'd mode would silently mean copy-on-write — refuse it
    val e1 = intercept[Exception](
      sql("CREATE TABLE pairlake.db.badmode (k BIGINT) " +
        "TBLPROPERTIES ('graft.merge.mode'='materialise')"))
    assert(e1.getMessage.contains("graft.merge.mode"), e1.getMessage)
    val e2 = intercept[Exception](
      sql("CREATE TABLE pairlake.db.badpair (k BIGINT) " +
        "TBLPROPERTIES ('graft.cdc.exactPairing'='yes')"))
    assert(e2.getMessage.contains("exactPairing"), e2.getMessage)
    // ALTER SET gets the same gate
    sql("CREATE TABLE pairlake.db.okmode (k BIGINT)")
    val e3 = intercept[Exception](
      sql("ALTER TABLE pairlake.db.okmode SET TBLPROPERTIES " +
        "('graft.delete.mode'='mor')"))
    assert(e3.getMessage.contains("graft.delete.mode"), e3.getMessage)
    // every legal spelling passes
    sql("ALTER TABLE pairlake.db.okmode SET TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read', " +
      "'graft.update.mode'='materialize', " +
      "'graft.merge.mode'='copy-on-write', " +
      "'graft.cdc.exactPairing'='false')")
  }

  test("unrelated ALTER succeeds on a table carrying a legacy invalid property") {
    // validation scope is the keys THE STATEMENT sets: a pre-gate manifest
    // (committed before the validators existed) may carry an invalid
    // graft.* value, and an unrelated ADD COLUMNS must not be held hostage
    // to it — only touching that property re-validates it
    sql("CREATE TABLE pairlake.db.legacy (k BIGINT)")
    val l = log("db/legacy")
    val (sch, props) = l.latestVersion.map(l.metaAt).getOrElse(l.baseMetaPublic)
    assert(l.tryCommitEntriesMeta(l.latestVersion, l.currentEntries(),
      Some((sch, props + ("graft.merge.mode" -> "mor"))),
      op = Some("legacy prop injection")))
    sql("ALTER TABLE pairlake.db.legacy ADD COLUMNS (v STRING)")   // must pass
    assert(sql("SELECT * FROM pairlake.db.legacy").schema.fieldNames.toSeq ===
      Seq("k", "v"))
    // touching the bad key re-validates it...
    val e = intercept[Exception](
      sql("ALTER TABLE pairlake.db.legacy SET TBLPROPERTIES " +
        "('graft.merge.mode'='also-bad')"))
    assert(e.getMessage.contains("graft.merge.mode"), e.getMessage)
    // ...and a valid SET repairs the legacy value
    sql("ALTER TABLE pairlake.db.legacy SET TBLPROPERTIES " +
      "('graft.merge.mode'='merge-on-read')")
  }
}
