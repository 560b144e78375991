package graft.connector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, sum, when}

/** Batch change-data-feed ([[ChangeFeed.between]]): per-version
  * insert/delete rows reconstructed from the manifest log, covering the
  * commit kinds the append-only STREAM refuses — merge-on-read deletes,
  * metadata-only deletes, copy-on-write rewrites, compaction.
  */
class ChangeFeedSpec extends LakeSpec {
  protected def catalogName = "cdflake"

  private def feed(table: String, s: Long, e: Long): DataFrame =
    ChangeFeed.between(spark, log(table), s, e)

  /** Net effect of the feed: per distinct row, additions (inserts and
    * update post-images) minus retractions (deletes and pre-images).
    */
  private def net(df: DataFrame, keyCols: String*): Seq[Row] =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(when(col(ChangeFeed.TypeCol).isin("insert", "update_postimage"), 1)
        .otherwise(-1)).as("n"))
      .where(col("n") =!= 0)
      .orderBy(keyCols.map(col): _*)
      .collect().toSeq

  test("appends emit inserts with their commit versions") {
    sql("CREATE NAMESPACE IF NOT EXISTS cdflake.db")
    sql("CREATE TABLE cdflake.db.a (k BIGINT)")
    sql("INSERT INTO cdflake.db.a VALUES (1), (2)")   // v1
    sql("INSERT INTO cdflake.db.a VALUES (3)")        // v2
    val f = feed("db/a", 0, 2)
    assert(f.schema.fieldNames.toSeq ===
      Seq("k", "_change_type", "_commit_version", "_commit_timestamp"))
    assert(f.select("k", "_change_type", "_commit_version").collect().toSet ===
      Set(Row(1L, "insert", 1L), Row(2L, "insert", 1L), Row(3L, "insert", 2L)))
    assert(f.where(col(ChangeFeed.TimestampCol).isNull).count() === 0)
    // exclusive start: only v2's commit
    assert(feed("db/a", 1, 2).select("k").collect().toSeq === Seq(Row(3L)))
    assert(feed("db/a", 2, 2).count() === 0)
    intercept[IllegalArgumentException](feed("db/a", 1, 99))
  }

  test("merge-on-read DELETE emits exactly the newly-deleted rows") {
    sql("CREATE TABLE cdflake.db.m (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO cdflake.db.m SELECT id FROM range(0, 10)")  // v1
    sql("DELETE FROM cdflake.db.m WHERE k % 3 = 0")              // v2: dv
    sql("DELETE FROM cdflake.db.m WHERE k % 3 = 1")              // v3: dv grows
    val f = feed("db/m", 1, 3)
    assert(f.where(col(ChangeFeed.TypeCol) === "insert").count() === 0)
    assert(f.select("k", "_change_type", "_commit_version").collect().toSet ===
      Set(Row(0L, "delete", 2L), Row(3L, "delete", 2L), Row(6L, "delete", 2L),
        Row(9L, "delete", 2L),
        Row(1L, "delete", 3L), Row(4L, "delete", 3L), Row(7L, "delete", 3L)))
    // replay from scratch matches the live snapshot
    assert(net(feed("db/m", 0, 3), "k").map(_.getLong(0)).toSet === Set(2L, 5L, 8L))
  }

  test("metadata-only DELETE (dropped dirs) emits the dropped rows") {
    sql("CREATE TABLE cdflake.db.d (k BIGINT)")
    sql("INSERT INTO cdflake.db.d SELECT id FROM range(0, 5)")    // v1
    sql("INSERT INTO cdflake.db.d SELECT id FROM range(10, 15)")  // v2
    sql("DELETE FROM cdflake.db.d WHERE k >= 10")                 // v3: dir dropped
    assert(log("db/d").entriesAt(3).size === 1, "precondition: metadata-only drop")
    val f = feed("db/d", 2, 3)
    assert(f.select("k", "_change_type").collect().toSet ===
      (10L until 15L).map(Row(_, "delete")).toSet)
  }

  test("copy-on-write UPDATE nets to the updated state") {
    sql("CREATE TABLE cdflake.db.u (k BIGINT, v BIGINT)")
    sql("INSERT INTO cdflake.db.u SELECT id, 0 FROM range(0, 6)")  // v1
    sql("UPDATE cdflake.db.u SET v = 1 WHERE k < 2")               // v2: rewrite
    val f = feed("db/u", 1, 2)
    // rewrite churn: the dir's untouched rows appear as delete+insert pairs
    // that cancel; the net is exactly the logical update
    assert(net(f, "k", "v").toSet ===
      Set(Row(0L, 0L, -1L), Row(1L, 0L, -1L), Row(0L, 1L, 1L), Row(1L, 1L, 1L)))
    assert(net(feed("db/u", 0, 2), "k", "v").size === 6)
  }

  test("compaction churn nets to zero") {
    sql("CREATE TABLE cdflake.db.c (k BIGINT)")
    sql("INSERT INTO cdflake.db.c VALUES (1)")
    sql("INSERT INTO cdflake.db.c VALUES (2)")
    sql("INSERT INTO cdflake.db.c VALUES (3)")
    assert(Compaction.compact(spark, log("db/c")))   // v4: pure layout
    val f = feed("db/c", 3, 4)
    assert(f.count() === 6, "3 deletes + 3 inserts of churn")
    assert(net(f, "k").isEmpty, "layout maintenance must net to zero")
  }

  test("schema evolution: pre-ALTER dirs feed NULL for added columns") {
    sql("CREATE TABLE cdflake.db.s (k BIGINT)")
    sql("INSERT INTO cdflake.db.s VALUES (1)")                    // v1
    sql("ALTER TABLE cdflake.db.s ADD COLUMNS (tag STRING)")      // v2
    sql("INSERT INTO cdflake.db.s VALUES (2, 't')")               // v3
    val f = feed("db/s", 0, 3)
    assert(f.select("k", "tag", "_commit_version").collect().toSet ===
      Set(Row(1L, null, 1L), Row(2L, "t", 3L)))
  }

  test("scale shape: one scan serves every append version in the range") {
    sql("CREATE TABLE cdflake.db.w (k BIGINT)")
    (0 until 24).foreach(i => sql(s"INSERT INTO cdflake.db.w VALUES ($i)"))
    val f = feed("db/w", 0, 24)
    assert(f.select("k", "_commit_version").collect().toSet ===
      (0 until 24).map(i => Row(i.toLong, i + 1L)).toSet)
    // the claim in the ChangeFeed docstring: scans don't grow with version
    // count — 24 append commits still plan ONE file scan (joined against
    // the broadcast dir→commit table)
    // between() reads through the DSv2 changes table: the whole range is
    // ONE scan node (partitions per version inside it), never a union
    // that grows with commit count
    val scans = f.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scans.size === 1, s"expected 1 scan for 24 append versions, got ${scans.size}")
    assert(scans.head.scan.isInstanceOf[GraftChangesScan])
  }

  test("a range past the retention window fails loudly, never under-reports") {
    sql("CREATE TABLE cdflake.db.v (k BIGINT)")
    sql("INSERT INTO cdflake.db.v VALUES (1)")
    sql("INSERT INTO cdflake.db.v VALUES (2)")
    sql("INSERT INTO cdflake.db.v VALUES (3)")
    log("db/v").vacuum(keepVersions = 2)   // manifests 2 and 3 survive
    // the kept tail still reads ((2, 3] needs version 2 as its start state)
    assert(feed("db/v", 2, 3).select("k").collect().toSeq === Seq(Row(3L)))
    // a replay from before the window hits the vacuumed manifest
    val e = intercept[Exception](feed("db/v", 0, 3).collect())
    assert(e.getMessage.contains("no version"))
  }

  test("mor MERGE feeds exact update pairs plus plain inserts") {
    sql("CREATE TABLE cdflake.db.g (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO cdflake.db.g SELECT id, 0 FROM range(0, 6)")   // v1
    sql("MERGE INTO cdflake.db.g t USING (SELECT id k, 9 v FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                             // v2
    // row lineage through the commit's #cdc markers: updated rows emit as
    // exact pre/post-image pairs, NOT MATCHED inserts stay plain inserts
    val f = feed("db/g", 1, 2).select("k", "v", "_change_type")
    assert(f.collect().toSet === Set(
      Row(4L, 0L, "update_preimage"), Row(5L, 0L, "update_preimage"),
      Row(4L, 9L, "update_postimage"), Row(5L, 9L, "update_postimage"),
      Row(6L, 9L, "insert"), Row(7L, 9L, "insert")))  // new keys
    assert(net(feed("db/g", 0, 2), "k", "v").size === 8)
  }

  test("mor MERGE splits DELETE-action rows from update pre-images per position") {
    sql("CREATE TABLE cdflake.db.gm (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO cdflake.db.gm SELECT id, 0 FROM range(0, 8)")  // v1
    // one MERGE mixing all three actions: k in 2,3 updated, k in 4,5
    // deleted, k in 8,9 inserted — one growth vector, two staged dirs
    sql("MERGE INTO cdflake.db.gm t USING (SELECT id k, 9 v FROM range(2, 10)) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND t.k < 4 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED AND t.k < 6 THEN DELETE " +
      "WHEN NOT MATCHED AND s.k >= 8 THEN INSERT *")                // v2
    assert(log("db/gm").opAt(2).contains("MERGE (merge-on-read)"))
    assert(log("db/gm").cdcAt(2).isDefined, "MERGE records #cdc markers")
    val f = feed("db/gm", 1, 2).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === Set(
      ("update_preimage", 2L, 0L), ("update_preimage", 3L, 0L),
      ("update_postimage", 2L, 9L), ("update_postimage", 3L, 9L),
      ("delete", 4L, 0L), ("delete", 5L, 0L),
      ("insert", 8L, 9L), ("insert", 9L, 9L)))
    // full replay still reconstructs the live snapshot
    assert(net(feed("db/gm", 0, 2), "k", "v").map(r => (r.getLong(0), r.getLong(1))).toSet ===
      sql("SELECT k, v FROM cdflake.db.gm").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("mor MERGE classification survives the fully-deleted-dir collapse") {
    sql("CREATE TABLE cdflake.db.gf (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO cdflake.db.gf SELECT id, 0 FROM range(0, 4)")  // v1: one dir
    // every row of the dir is touched: k 0,1 updated + k 2,3 deleted ->
    // the dir collapses out of the manifest; classification must come
    // from the pre-image vector on the REMOVED dir's then-live rows
    sql("MERGE INTO cdflake.db.gf t USING (SELECT id k, 9 v FROM range(0, 4)) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND t.k < 2 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED THEN DELETE")                                   // v2
    assert(log("db/gf").latestVersion.contains(2L))
    val f = feed("db/gf", 1, 2).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === Set(
      ("update_preimage", 0L, 0L), ("update_preimage", 1L, 0L),
      ("update_postimage", 0L, 9L), ("update_postimage", 1L, 9L),
      ("delete", 2L, 0L), ("delete", 3L, 0L)))
    assert(sql("SELECT k, v FROM cdflake.db.gf").collect().toSet ===
      Set(Row(0L, 9L), Row(1L, 9L)))
  }

  test("vacuum keeps pre-image vectors of kept versions, reclaims dropped ones") {
    sql("CREATE TABLE cdflake.db.gv (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO cdflake.db.gv SELECT id, 0 FROM range(0, 6)")  // v1
    sql("INSERT INTO cdflake.db.gv VALUES (100, 0)")                // v2
    sql("MERGE INTO cdflake.db.gv t USING (SELECT id k, 9 v FROM range(0, 2)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")          // v3: pre vector
    // keep v2+v3: v3's #cdcpre vector must survive (its change rows are
    // still replayable), and the (2, 3] replay still classifies
    log("db/gv").vacuum(keepVersions = 2, orphanRetentionMs = 0)
    val f = feed("db/gv", 2, 3).select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(f === Set(
      ("update_preimage", 0L), ("update_preimage", 1L),
      ("update_postimage", 0L), ("update_postimage", 1L)))
    // another MERGE + vacuum down to the last version: the OLD pre vector
    // is referenced only by dropped manifests now and is reclaimed
    val preOf3 = log("db/gv").cdcAt(3).get.preImageDvByDir.values.head
    sql("MERGE INTO cdflake.db.gv t USING (SELECT id k, 8 v FROM range(2, 4)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")          // v4
    log("db/gv").vacuum(keepVersions = 1, orphanRetentionMs = 0)
    val fs = new org.apache.hadoop.fs.Path(preOf3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(preOf3)),
      "superseded pre-image vector reclaimed")
    val preOf4 = log("db/gv").cdcAt(4).get.preImageDvByDir.values.head
    assert(fs.exists(new org.apache.hadoop.fs.Path(preOf4)),
      "live pre-image vector kept")
  }

  // ---- materialized (copy-on-write-exact) commands: cow storage, exact
  // lineage. The command runs on the delta plan (the only shape with
  // per-row identity), the commit rewrites touched dirs vector-free, and
  // #cdcdel/#cdcadd markers give the feed exact positions — no carryover
  // churn, no net-effect downgrade. ----

  test("materialized MERGE: exact update pairs, carryover silent, snapshot vector-free") {
    sql("CREATE TABLE cdflake.db.mz (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize')")
    sql("INSERT INTO cdflake.db.mz SELECT id, 0 FROM range(0, 6)")   // v1
    sql("MERGE INTO cdflake.db.mz t USING (SELECT id k, 9 v FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")                              // v2
    assert(log("db/mz").opAt(2).contains("MERGE (materialized)"))
    // exact pairs AND NOT A SINGLE carryover row (k 0..3 moved dirs but
    // did not change — a cow rewrite used to emit them as delete+insert)
    val f = feed("db/mz", 1, 2).select("k", "v", "_change_type")
    assert(f.collect().toSet === Set(
      Row(4L, 0L, "update_preimage"), Row(5L, 0L, "update_preimage"),
      Row(4L, 9L, "update_postimage"), Row(5L, 9L, "update_postimage"),
      Row(6L, 9L, "insert"), Row(7L, 9L, "insert")))
    // cow storage: no deletion vector anywhere in the committed snapshot
    assert(log("db/mz").currentEntries().forall(_.dv.isEmpty),
      "materialized snapshot must be vector-free")
    assert(rows("SELECT count(*) c, sum(v) s FROM cdflake.db.mz") ===
      Seq(Row(8L, 36L)))
    assert(net(feed("db/mz", 0, 2), "k", "v").size === 8)
  }

  test("materialized MERGE mixing update, delete, and insert actions") {
    sql("CREATE TABLE cdflake.db.mzm (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize')")
    sql("INSERT INTO cdflake.db.mzm SELECT id, 0 FROM range(0, 8)")  // v1
    sql("MERGE INTO cdflake.db.mzm t USING (SELECT id k, 9 v FROM range(2, 10)) s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND t.k < 4 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED AND t.k < 6 THEN DELETE " +
      "WHEN NOT MATCHED AND s.k >= 8 THEN INSERT *")                 // v2
    val f = feed("db/mzm", 1, 2).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === Set(
      ("update_preimage", 2L, 0L), ("update_preimage", 3L, 0L),
      ("update_postimage", 2L, 9L), ("update_postimage", 3L, 9L),
      ("delete", 4L, 0L), ("delete", 5L, 0L),
      ("insert", 8L, 9L), ("insert", 9L, 9L)))
    assert(net(feed("db/mzm", 0, 2), "k", "v").map(r => (r.getLong(0), r.getLong(1))).toSet ===
      sql("SELECT k, v FROM cdflake.db.mzm").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("vacuum keeps a kept materialized version's #cdcdel vectors and old dirs") {
    sql("CREATE TABLE cdflake.db.mzv (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize')")
    sql("INSERT INTO cdflake.db.mzv SELECT id, 0 FROM range(0, 6)")  // v1
    sql("MERGE INTO cdflake.db.mzv t USING (SELECT id k, 9 v FROM range(0, 2)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")           // v2
    // keep v1+v2: v2's CDF reads the REMOVED v1 dir at its #cdcdel
    // positions — both the old dir (reachable through v1's kept manifest)
    // and the del/pre vectors (marker references of kept v2) must survive
    log("db/mzv").vacuum(keepVersions = 2, orphanRetentionMs = 0)
    val f = feed("db/mzv", 1, 2).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f === Set(
      ("update_preimage", 0L, 0L), ("update_preimage", 1L, 0L),
      ("update_postimage", 0L, 9L), ("update_postimage", 1L, 9L)))
    // vacuum to the head only: the v2 markers' vectors are referenced only
    // by a dropped-version diff now... but v2 itself is the kept head, so
    // its marker vectors stay; only v1's superseded dir may go
    val delOf2 = log("db/mzv").cdcAt(2).get.deleteDvByDir.values.head
    log("db/mzv").vacuum(keepVersions = 1, orphanRetentionMs = 0)
    val fs = new org.apache.hadoop.fs.Path(delOf2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(delOf2)),
      "kept head's #cdcdel vector survives")
    assert(rows("SELECT count(*) FROM cdflake.db.mzv") === Seq(Row(6L)))
  }

  test("materialized MERGE works across a column-mapping rename") {
    sql("CREATE TABLE cdflake.db.mzr (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.merge.mode'='materialize')")
    sql("INSERT INTO cdflake.db.mzr SELECT id, 0 FROM range(0, 6)")  // v1
    sql("ALTER TABLE cdflake.db.mzr RENAME COLUMN v TO score")       // v2
    sql("MERGE INTO cdflake.db.mzr t USING (SELECT id k, 9 score FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET score = s.score " +
      "WHEN NOT MATCHED THEN INSERT *")                              // v3
    assert(feed("db/mzr", 2, 3).select("_change_type", "k", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === Set(
      ("update_preimage", 4L, 0L), ("update_preimage", 5L, 0L),
      ("update_postimage", 4L, 9L), ("update_postimage", 5L, 9L),
      ("insert", 6L, 9L), ("insert", 7L, 9L)))
    // the combined rewrite wrote PHYSICAL names: the snapshot reads whole
    assert(rows("SELECT count(*) c, sum(score) s FROM cdflake.db.mzr") ===
      Seq(Row(8L, 36L)))
    assert(log("db/mzr").currentEntries().forall(_.dv.isEmpty))
  }

  test("materialized UPDATE and DELETE: exact rows, vector-free dirs") {
    sql("CREATE TABLE cdflake.db.mzu (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.update.mode'='materialize', " +
      "'graft.delete.mode'='materialize')")
    sql("INSERT INTO cdflake.db.mzu SELECT id, 0 FROM range(0, 6)")  // v1
    sql("UPDATE cdflake.db.mzu SET v = 9 WHERE k = 2")               // v2
    assert(log("db/mzu").opAt(2).contains("UPDATE (materialized)"))
    assert(feed("db/mzu", 1, 2).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ===
      Set(("update_preimage", 2L, 0L), ("update_postimage", 2L, 9L)))
    sql("DELETE FROM cdflake.db.mzu WHERE k = 3")                    // v3
    assert(log("db/mzu").opAt(3).contains("DELETE (materialized)"))
    assert(feed("db/mzu", 2, 3).select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ===
      Set(("delete", 3L, 0L)))
    assert(log("db/mzu").currentEntries().forall(_.dv.isEmpty))
    assert(rows("SELECT count(*) FROM cdflake.db.mzu") === Seq(Row(5L)))
    // full-history net replay reconstructs the live snapshot
    assert(net(feed("db/mzu", 0, 3), "k", "v").map(r => (r.getLong(0), r.getLong(1))).toSet ===
      sql("SELECT k, v FROM cdflake.db.mzu").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
