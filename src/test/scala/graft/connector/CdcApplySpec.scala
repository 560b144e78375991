package graft.connector

import org.apache.spark.sql.{Dataset, Row}

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

  test("update pre/post-image pairs fold to the post-image") {
    // a mor-UPDATE source's feed carries update_preimage/update_postimage
    // in the SAME commit version: the reduction must pick the post-image
    // (a lexical max over the type string would pick the PRE-image)
    sql("CREATE TABLE cdclake.db.s3 (k BIGINT, v BIGINT) TBLPROPERTIES " +
      "('graft.update.mode'='merge-on-read','graft.delete.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.d3 (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdclake.db.s3 SELECT id, 0 FROM range(0, 6)")
    sql("UPDATE cdclake.db.s3 SET v = 5 WHERE k IN (1, 3)")
    sql("DELETE FROM cdclake.db.s3 WHERE k = 4")
    val feed = spark.read.table("cdclake.db.s3.changes")
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet ===
      Set("insert", "update_preimage", "update_postimage", "delete"),
      "precondition: the feed actually carries update types")
    CdcApply.applyBatch(feed, "cdclake.db.d3", Seq("k"), Seq("k", "v"))
    assertReplicaMatches("cdclake.db.s3", "cdclake.db.d3")
    assert(rows("SELECT v FROM cdclake.db.d3 WHERE k = 1") === Seq(Row(5L)))
  }

  test("a mor MERGE feeds APPLY CHANGES with exact pre/post pairs") {
    // the upstream table replicates via MERGE (mixed update/delete/insert
    // in one commit); its row-lineage markers classify the feed into exact
    // update pairs + plain deletes/inserts, and APPLY CHANGES folds them
    // into a converged replica through a live stream
    sql("CREATE TABLE cdclake.db.sm9 (k BIGINT, v BIGINT) TBLPROPERTIES " +
      "('graft.merge.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.dm9 (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdclake.db.sm9 SELECT id, 0 FROM range(0, 8)")
    val src = spark.readStream.option("startVersion", "0")
      .table("cdclake.db.sm9.changes")
    val q = CdcApply.applyChanges(src, "cdclake.db.dm9", Seq("k"),
      tmp("cdc-merge-ckpt"))
    try {
      q.processAllAvailable()
      sql("MERGE INTO cdclake.db.sm9 t USING (SELECT id k, 9 v FROM range(2, 10)) s " +
        "ON t.k = s.k " +
        "WHEN MATCHED AND t.k < 4 THEN UPDATE SET v = s.v " +
        "WHEN MATCHED AND t.k < 6 THEN DELETE " +
        "WHEN NOT MATCHED AND s.k >= 8 THEN INSERT *")
      q.processAllAvailable()
      // the stream saw exact pairs, not the old net-effect mix
      val v2 = spark.read.option("startVersion", "1").option("endVersion", "2")
        .table("cdclake.db.sm9.changes")
        .select("_change_type", "k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(v2 === Set(
        ("update_preimage", 2L), ("update_preimage", 3L),
        ("update_postimage", 2L), ("update_postimage", 3L),
        ("delete", 4L), ("delete", 5L),
        ("insert", 8L), ("insert", 9L)))
      assertReplicaMatches("cdclake.db.sm9", "cdclake.db.dm9")
      assert(rows("SELECT v FROM cdclake.db.dm9 WHERE k = 2") === Seq(Row(9L)))
    } finally q.stop()
  }

  // ---- SEQUENCE BY -----------------------------------------------------------

  /** A synthetic change frame (no source table needed): rows of
    * (k, v, seq, _change_type, _commit_version).
    */
  private def feed(rows: Seq[(Long, String, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v", "seq", ChangeFeed.TypeCol, ChangeFeed.VersionCol)
  }

  private val seqDataCols = Seq("k", "v", "seq")

  test("SEQUENCE BY orders a batch by the user column, not commit order") {
    sql("CREATE NAMESPACE IF NOT EXISTS cdclake.db")
    sql("CREATE TABLE cdclake.db.sq (k BIGINT, v STRING, seq BIGINT)")
    // commit order says 'old' wins; the sequence column says 'new' does
    CdcApply.applyBatch(feed(Seq(
      (1L, "new", 20L, "insert", 1L),
      (1L, "old", 10L, "insert", 2L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    assert(rows("SELECT v FROM cdclake.db.sq WHERE k = 1") === Seq(Row("new")))
    // a LATER batch carrying only stale events must not roll the row back
    CdcApply.applyBatch(feed(Seq((1L, "stale", 5L, "insert", 3L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    assert(rows("SELECT v FROM cdclake.db.sq WHERE k = 1") === Seq(Row("new")))
    // a stale delete is refused too
    CdcApply.applyBatch(feed(Seq((1L, "x", 6L, "delete", 4L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    assert(rows("SELECT v FROM cdclake.db.sq WHERE k = 1") === Seq(Row("new")))
    // a genuinely newer delete lands
    CdcApply.applyBatch(feed(Seq((1L, "x", 30L, "delete", 5L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    assert(rows("SELECT count(*) c FROM cdclake.db.sq") === Seq(Row(0L)))
    // equal sequence re-applies: at-least-once replay converges
    CdcApply.applyBatch(feed(Seq((2L, "a", 1L, "insert", 6L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    CdcApply.applyBatch(feed(Seq((2L, "a", 1L, "insert", 6L))),
      "cdclake.db.sq", Seq("k"), seqDataCols, sequenceBy = Some("seq"))
    assert(rows("SELECT v FROM cdclake.db.sq") === Seq(Row("a")))
  }

  // ---- SCD TYPE 2 ------------------------------------------------------------

  test("SCD2 maintains validity intervals across batches; replay is idempotent") {
    sql("CREATE TABLE cdclake.db.hist (k BIGINT, v STRING, " +
      "__start_at BIGINT, __end_at BIGINT)")
    def hist() = rows("SELECT k, v, __start_at, __end_at FROM cdclake.db.hist " +
      "ORDER BY k, __start_at")
    // batch 1: out-of-order WITHIN the batch is fine
    val b1 = feed(Seq(
      (1L, "b", 20L, "insert", 2L),
      (1L, "a", 10L, "insert", 1L),
      (2L, "x", 5L, "insert", 1L)))
    CdcApply.applyBatchScd2(b1, "cdclake.db.hist", Seq("k"), seqDataCols, "seq")
    assert(hist() === Seq(
      Row(1L, "a", 10L, 20L), Row(1L, "b", 20L, null),
      Row(2L, "x", 5L, null)))
    // at-least-once replay of the SAME batch converges
    CdcApply.applyBatchScd2(b1, "cdclake.db.hist", Seq("k"), seqDataCols, "seq")
    assert(hist() === Seq(
      Row(1L, "a", 10L, 20L), Row(1L, "b", 20L, null),
      Row(2L, "x", 5L, null)))
    // batch 2: closes k=1's open row, delete ends k=2 without a new row
    CdcApply.applyBatchScd2(feed(Seq(
      (1L, "c", 30L, "insert", 3L),
      (2L, "x", 9L, "delete", 3L))),
      "cdclake.db.hist", Seq("k"), seqDataCols, "seq")
    assert(hist() === Seq(
      Row(1L, "a", 10L, 20L), Row(1L, "b", 20L, 30L), Row(1L, "c", 30L, null),
      Row(2L, "x", 5L, 9L)))
    // update pre/post-image pairs: the post-image opens the interval, the
    // pre-image (old sequence value) must NOT fabricate one
    CdcApply.applyBatchScd2(feed(Seq(
      (1L, "c", 30L, "update_preimage", 4L),
      (1L, "d", 40L, "update_postimage", 4L))),
      "cdclake.db.hist", Seq("k"), seqDataCols, "seq")
    assert(hist() === Seq(
      Row(1L, "a", 10L, 20L), Row(1L, "b", 20L, 30L), Row(1L, "c", 30L, 40L),
      Row(1L, "d", 40L, null), Row(2L, "x", 5L, 9L)))
  }

  test("SCD2 streams from a mor-update source end-to-end") {
    sql("CREATE TABLE cdclake.db.s4 (k BIGINT, v STRING, seq BIGINT) " +
      "TBLPROPERTIES ('graft.update.mode'='merge-on-read'," +
      "'graft.delete.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.h4 (k BIGINT, v STRING, " +
      "__start_at BIGINT, __end_at BIGINT)")
    val q = CdcApply.applyChangesScd2(
      spark.readStream.option("startVersion", "0").table("cdclake.db.s4.changes"),
      "cdclake.db.h4", Seq("k"), "seq", tmp("scd2-ckpt"))
    sql("INSERT INTO cdclake.db.s4 VALUES (1, 'a', 100)")
    q.processAllAvailable()
    sql("UPDATE cdclake.db.s4 SET v = 'b', seq = 200 WHERE k = 1")
    q.processAllAvailable()
    sql("DELETE FROM cdclake.db.s4 WHERE k = 1")
    // the mor DELETE's change row carries seq=200 (the row's value): the
    // interval closes at the deleted row's sequence
    q.processAllAvailable()
    q.stop()
    assert(rows("SELECT k, v, __start_at, __end_at FROM cdclake.db.h4 " +
      "ORDER BY __start_at") === Seq(
      Row(1L, "a", 100L, 200L), Row(1L, "b", 200L, 200L)))
  }

  test("a key-column mor UPDATE retracts the old key instead of upserting its pre-image") {
    sql("CREATE TABLE cdclake.db.s5 (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.update.mode'='merge-on-read')")
    sql("CREATE TABLE cdclake.db.d5 (k BIGINT, v STRING)")
    sql("INSERT INTO cdclake.db.s5 VALUES (1, 'a'), (9, 'z')")
    sql("UPDATE cdclake.db.s5 SET k = 2 WHERE k = 1")   // key MOVES: 1 -> 2
    val feed = spark.read.table("cdclake.db.s5.changes")
    // the pre-image (k=1) and post-image (k=2) reduce under DIFFERENT
    // keys: k=1's terminal change is the pre-image, which must DELETE
    CdcApply.applyBatch(feed, "cdclake.db.d5", Seq("k"), Seq("k", "v"))
    assertReplicaMatches("cdclake.db.s5", "cdclake.db.d5")
    assert(rows("SELECT count(*) c FROM cdclake.db.d5 WHERE k = 1") === Seq(Row(0L)))
    // and a mid-history bootstrap (replica starts empty at a range whose
    // terminal for k=1 is the pre-image) must not re-insert the dead row
    sql("CREATE TABLE cdclake.db.d5b (k BIGINT, v STRING)")
    CdcApply.applyBatch(feed, "cdclake.db.d5b", Seq("k"), Seq("k", "v"))
    assertReplicaMatches("cdclake.db.s5", "cdclake.db.d5b")
  }

  test("SCD2 rejects null sequence values loudly") {
    sql("CREATE TABLE cdclake.db.h6 (k BIGINT, v STRING, " +
      "__start_at BIGINT, __end_at BIGINT)")
    val e = intercept[Exception] {
      CdcApply.applyBatchScd2(feed(Seq((1L, "a", 0L, "insert", 1L)))
        .withColumn("seq", org.apache.spark.sql.functions.lit(null).cast("bigint")),
        "cdclake.db.h6", Seq("k"), seqDataCols, "seq")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => String.valueOf(c.getMessage)
      .contains("non-null sequence column")), e.getMessage)
    assert(rows("SELECT count(*) c FROM cdclake.db.h6") === Seq(Row(0L)))
  }

  test("columns option rejects duplicates; sequenceBy=key fails at stream start") {
    sql("CREATE TABLE cdclake.db.s7 (k BIGINT, v STRING)")
    val dup = intercept[Exception](
      spark.read.format("graft-changes").option("path", s"$root/db/s7")
        .option("columns", "k,K").load())
    assert(dup.getMessage.contains("duplicate columns"))
    val seqKey = intercept[IllegalArgumentException](
      CdcApply.applyChanges(
        spark.readStream.option("startVersion", "0").table("cdclake.db.s7.changes"),
        "cdclake.db.s7", Seq("k"), tmp("sk-ckpt"), sequenceBy = Some("K")))
    assert(seqKey.getMessage.contains("cannot be a key column"))
  }

  test("SCD2 out-of-order across batches: un-spliced, never corrupting closed history") {
    // documented contract: per-key sequences must not decrease ACROSS
    // batches; a violation leaves the late interval un-spliced (open) and
    // all previously closed intervals untouched — no exception, no rewrite
    sql("CREATE TABLE cdclake.db.h7 (k BIGINT, v STRING, " +
      "__start_at BIGINT, __end_at BIGINT)")
    CdcApply.applyBatchScd2(feed(Seq((1L, "a", 10L, "insert", 1L))),
      "cdclake.db.h7", Seq("k"), seqDataCols, "seq")
    CdcApply.applyBatchScd2(feed(Seq((1L, "b", 30L, "insert", 2L))),
      "cdclake.db.h7", Seq("k"), seqDataCols, "seq")
    // LATE batch: seq 20 arrives after 30 was applied
    CdcApply.applyBatchScd2(feed(Seq((1L, "late", 20L, "insert", 3L))),
      "cdclake.db.h7", Seq("k"), seqDataCols, "seq")
    val h = rows("SELECT v, __start_at, __end_at FROM cdclake.db.h7 " +
      "ORDER BY __start_at")
    // closed history intact; the open row untouched; the late interval
    // lands un-spliced (its end unknown to this batch)
    assert(h === Seq(Row("a", 10L, 30L), Row("late", 20L, null),
      Row("b", 30L, null)))
  }

  test("changes STREAM over a materialized source: exact rows, no carryover churn") {
    sql("CREATE TABLE cdclake.db.ms (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize', " +
      "'graft.update.mode'='materialize', 'graft.delete.mode'='materialize')")
    sql("CREATE TABLE cdclake.db.md (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdclake.db.ms SELECT id, 0 FROM range(0, 10)")   // v1
    val batchRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val changes = spark.readStream.option("startVersion", "0")
      .table("cdclake.db.ms.changes")
    val q = CdcApply.applyChanges(changes, "cdclake.db.md", Seq("k"),
      tmp("cdc-mz-ckpt"))
    // count the raw change rows per batch via a second stream on the same
    // face (carryover churn would inflate them)
    val q2 = spark.readStream.option("startVersion", "0")
      .table("cdclake.db.ms.changes").writeStream
      .option("checkpointLocation", tmp("cdc-mz-tap"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        batchRows.add(b.count()); ()
      }
      .start()
    q.processAllAvailable(); q2.processAllAvailable()
    assertReplicaMatches("cdclake.db.ms", "cdclake.db.md")
    assert(batchRows.toArray.map(_.asInstanceOf[Long]).sum === 10L)   // v1 inserts
    batchRows.clear()
    // materialized MERGE touching 4 keys of 10: exactly 6 change rows
    // (2 pre + 2 post + 2 insert) — a cow rewrite would emit 10+ churn rows
    sql("MERGE INTO cdclake.db.ms t USING (SELECT id k, 9 v FROM range(8, 12)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                               // v2
    q.processAllAvailable(); q2.processAllAvailable()
    assertReplicaMatches("cdclake.db.ms", "cdclake.db.md")
    assert(batchRows.toArray.map(_.asInstanceOf[Long]).sum === 6L,
      s"materialized MERGE must stream exactly its changes: $batchRows")
    batchRows.clear()
    // materialized UPDATE + DELETE keep the replica exact too
    sql("UPDATE cdclake.db.ms SET v = 5 WHERE k = 0")                 // v3
    sql("DELETE FROM cdclake.db.ms WHERE k = 1")                      // v4
    q.processAllAvailable(); q2.processAllAvailable()
    q.stop(); q2.stop()
    assertReplicaMatches("cdclake.db.ms", "cdclake.db.md")
    assert(batchRows.toArray.map(_.asInstanceOf[Long]).sum === 3L,
      s"one update pair + one delete: $batchRows")
  }
}
