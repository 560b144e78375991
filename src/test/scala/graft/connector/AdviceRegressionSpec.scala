package graft.connector

import org.apache.spark.sql.Row

/** Regressions for the round-9 review findings:
  *  1. scan equality must include deletion-vector IDENTITY (vector file
  *     paths), not just which dirs carry one — otherwise the planner's
  *     scan/exchange reuse can serve one snapshot's rows for both sides of
  *     a cross-version join/union when only the vectors differ;
  *  2. data columns may not shadow the reserved lineage / z-layout names
  *     (`__graft_file`, `__graft_pos`, `__graft_z`, `__graft_ztile`) — the
  *     merge-on-read scan strips those from the parquet read schema, so a
  *     real column so named would silently read as file path / row index;
  *  3. the coalesce compaction branch must not commit an all-rows-deleted
  *     (0-row) staging dir, mirroring the z-order branch's empty-tile
  *     filter.
  */
class AdviceRegressionSpec extends LakeSpec {
  protected def catalogName = "advlake"

  test("cross-version reads differ when only the deletion vector differs") {
    sql("CREATE NAMESPACE IF NOT EXISTS advlake.db")
    sql("CREATE TABLE advlake.db.xv (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO advlake.db.xv SELECT id FROM range(0, 100)")   // v1
    sql("DELETE FROM advlake.db.xv WHERE k < 40")                   // v2: vector only
    val entries = log("db/xv").currentEntries()
    assert(log("db/xv").entriesAt(1).map(_.dir) === entries.map(_.dir),
      "precondition: the MOR delete must keep the data dirs identical")
    assert(entries.exists(_.dv.isDefined),
      "precondition: the live snapshot must carry a deletion vector")
    // both versions in ONE query, so planner-level scan/subquery reuse has
    // the chance to (wrongly, pre-fix) unify the two snapshots' scans
    assert(rows("SELECT (SELECT count(*) FROM advlake.db.xv) cur, " +
      "(SELECT count(*) FROM advlake.db.xv VERSION AS OF 1) old") ===
      Seq(Row(60L, 100L)))
    assert(rows("SELECT src, count(*) c FROM (" +
      "SELECT 'cur' src, k FROM advlake.db.xv UNION ALL " +
      "SELECT 'old' src, k FROM advlake.db.xv VERSION AS OF 1) " +
      "GROUP BY src ORDER BY src") === Seq(Row("cur", 60L), Row("old", 100L)))
  }

  test("two vectored snapshots of the same dirs compare unequal") {
    sql("CREATE TABLE advlake.db.eq (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO advlake.db.eq SELECT id FROM range(0, 50)")    // v1
    sql("DELETE FROM advlake.db.eq WHERE k = 0")                    // v2
    sql("DELETE FROM advlake.db.eq WHERE k = 1")                    // v3
    val l = log("db/eq")
    assert(l.entriesAt(2).map(_.dir) === l.entriesAt(3).map(_.dir))
    def dvs(v: Long) = GraftDvRead.dvByDir(l.entriesAt(v), l.hadoopConf)
    assert(dvs(2).keySet === dvs(3).keySet,
      "precondition: same dirs carry a vector at v2 and v3")
    // the fixed equality keys on the immutable vector FILE PATHS
    assert(dvs(2).map { case (d, r) => d -> r.path } !==
      dvs(3).map { case (d, r) => d -> r.path })
  }

  test("reserved internal column names are rejected at CREATE and ALTER") {
    Seq("__graft_file", "__GRAFT_POS", "__graft_z", "__graft_ztile").foreach { c =>
      val e = intercept[Exception](
        sql(s"CREATE TABLE advlake.db.bad (k BIGINT, `$c` STRING)"))
      assert(e.getMessage.contains("reserved"), s"create with $c: ${e.getMessage}")
      assert(!log("db/bad").exists)
    }
    sql("CREATE TABLE advlake.db.alt (k BIGINT)")
    val e = intercept[Exception](
      sql("ALTER TABLE advlake.db.alt ADD COLUMNS (`__Graft_File` STRING)"))
    assert(e.getMessage.contains("reserved"))
    assert(sql("SELECT * FROM advlake.db.alt").schema.fieldNames === Array("k"))
  }

  // ---- round-10 findings ---------------------------------------------------

  test("CDC output column names are rejected at CREATE and ALTER") {
    Seq("_change_type", "_COMMIT_VERSION", "_commit_timestamp").foreach { c =>
      val e = intercept[Exception](
        sql(s"CREATE TABLE advlake.db.cdc_bad (k BIGINT, `$c` STRING)"))
      assert(e.getMessage.contains("reserved"), s"create with $c: ${e.getMessage}")
      assert(!log("db/cdc_bad").exists)
    }
    sql("CREATE TABLE advlake.db.cdc_alt (k BIGINT)")
    val e = intercept[Exception](
      sql("ALTER TABLE advlake.db.cdc_alt ADD COLUMNS (`_Change_Type` STRING)"))
    assert(e.getMessage.contains("reserved"))
  }

  test("APPLY CHANGES is idempotent for null-keyed rows (null-safe merge keys)") {
    import org.apache.spark.sql.functions.{col, lit}
    sql("CREATE TABLE advlake.db.nk (k BIGINT, v STRING)")
    val batch = spark.range(1).select(
      lit(null).cast("bigint").as("k"), lit("x").as("v"),
      lit("insert").as(ChangeFeed.TypeCol), lit(1L).as(ChangeFeed.VersionCol))
    CdcApply.applyBatch(batch, "advlake.db.nk", Seq("k"), Seq("k", "v"))
    // at-least-once replay of the same batch must converge, not duplicate
    CdcApply.applyBatch(batch, "advlake.db.nk", Seq("k"), Seq("k", "v"))
    assert(rows("SELECT count(*) c FROM advlake.db.nk") === Seq(Row(1L)))
    // and a null-keyed delete removes the row
    CdcApply.applyBatch(
      batch.withColumn(ChangeFeed.TypeCol, lit("delete"))
        .withColumn(ChangeFeed.VersionCol, lit(2L)),
      "advlake.db.nk", Seq("k"), Seq("k", "v"))
    assert(rows("SELECT count(*) c FROM advlake.db.nk") === Seq(Row(0L)))
  }

  test("a change stream with startVersion past latest fails at query start") {
    sql("CREATE TABLE advlake.db.sv (k BIGINT)")
    sql("INSERT INTO advlake.db.sv VALUES (1)")   // v1
    val e = intercept[Exception] {
      spark.readStream.option("startVersion", "9")
        .table("advlake.db.sv.changes")
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("adv-sv-ckpt"))
        .start().processAllAvailable()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => String.valueOf(c.getMessage)
        .contains("startVersion <= endVersion <= 1")),
      s"expected the batch-shaped range error, got: ${e.getMessage}")
  }

  test("unknown CALL procedure raises ROUTINE_NOT_FOUND, not a bare RuntimeException") {
    val e = intercept[org.apache.spark.sql.AnalysisException](
      sql("CALL advlake.system.nonexistent()"))
    assert(e.getCondition === "ROUTINE_NOT_FOUND", e.getMessage)
    assert(e.getMessage.contains("nonexistent"))
  }

  test("coalesce compaction drops an all-rows-deleted staging entry") {
    // a DELETE whose vector reaches full coverage drops the dir entry
    // outright, so the 0-row-rewrite case needs the one shape that
    // survives to compaction: a STATLESS vectored dir (deletedFraction is
    // unprovable, so compaction must rewrite it — and the rewrite yields
    // zero rows). Build it through the log API: same dir, stats stripped,
    // a hand-written vector covering every row of every file.
    sql("CREATE TABLE advlake.db.em (k BIGINT)")
    sql("INSERT INTO advlake.db.em SELECT id FROM range(0, 20)")
    val l = log("db/em")
    val entry = l.currentEntries().head
    val perFile = spark.read.parquet(entry.dir)
      .select(org.apache.spark.sql.functions.col("_metadata.file_name"))
      .groupBy("file_name").count().collect()
      .map(r => r.getString(0) -> Array.tabulate(r.getLong(1).toInt)(_.toLong))
      .toMap
    val dvPath = l.newDvFile()
    DeletionVector.write(dvPath, l.hadoopConf, DeletionVector(perFile))
    assert(l.tryCommitEntries(l.latestVersion,
      Seq(DirEntry(entry.dir, stats = None, dv = Some(dvPath)))))
    assert(rows("SELECT count(*) c FROM advlake.db.em") === Seq(Row(0L)))
    assert(Compaction.compact(spark, l), "statless-vectored rewrite must commit")
    assert(l.currentEntries().isEmpty,
      "an all-deleted rewrite must not commit a 0-row dir entry")
    // and the table keeps working after the empty-commit
    sql("INSERT INTO advlake.db.em VALUES (7)")
    assert(rows("SELECT k FROM advlake.db.em") === Seq(Row(7L)))
  }
}
