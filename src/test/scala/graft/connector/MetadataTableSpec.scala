package graft.connector

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, sum, when}

/** Derived metadata tables (`db.t.changes`, `db.t.history`): the CDF as a
  * batch/streaming DSv2 table — equivalence with [[ChangeFeed.between]],
  * version-range options, a stream that survives the commit kinds the
  * plain changefeed refuses — and DESCRIBE HISTORY as a queryable table.
  */
class MetadataTableSpec extends LakeSpec {
  protected def catalogName = "mdlake"

  /** A table with every commit kind in its history: appends, a COW
    * update, a MOR delete, and a compaction.
    */
  private def buildMixed(name: String): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS mdlake.db")
    sql(s"CREATE TABLE mdlake.db.$name (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql(s"INSERT INTO mdlake.db.$name SELECT id, 0 FROM range(0, 8)")   // v1
    sql(s"INSERT INTO mdlake.db.$name SELECT id, 0 FROM range(8, 12)")  // v2
    sql(s"UPDATE mdlake.db.$name SET v = 1 WHERE k < 2")                // v3 cow
    sql(s"DELETE FROM mdlake.db.$name WHERE k % 5 = 4")                 // v4 mor
    assert(Compaction.compact(spark, log(s"db/$name")))                 // v5
  }

  test("batch changes table matches ChangeFeed.between on a mixed history") {
    buildMixed("mx")
    val viaTable = sql("SELECT * FROM mdlake.db.mx.changes")
    val viaApi = ChangeFeed.between(spark, log("db/mx"), 0, 5)
    assert(viaTable.schema.fieldNames === viaApi.schema.fieldNames)
    val cols = Seq("k", "v", "_change_type", "_commit_version")
    assert(viaTable.select(cols.map(col): _*).collect().sortBy(_.toString) ===
      viaApi.select(cols.map(col): _*).collect().sortBy(_.toString))
    // net effect replays to the live snapshot
    val net = viaTable.groupBy("k", "v")
      .agg(sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("n"))
      .where(col("n") =!= 0)
    assert(net.select("k", "v").collect().toSet ===
      sql("SELECT k, v FROM mdlake.db.mx").collect().toSet)
  }

  test("startVersion/endVersion options bound the batch range") {
    sql("CREATE TABLE mdlake.db.rg (k BIGINT)")
    sql("INSERT INTO mdlake.db.rg VALUES (1)")
    sql("INSERT INTO mdlake.db.rg VALUES (2)")
    sql("INSERT INTO mdlake.db.rg VALUES (3)")
    def range(opts: (String, String)*): Seq[Long] = {
      var r = spark.read
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.table("mdlake.db.rg.changes").select("k")
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(range() === Seq(1L, 2L, 3L))
    assert(range("startVersion" -> "1") === Seq(2L, 3L))
    assert(range("startVersion" -> "1", "endVersion" -> "2") === Seq(2L))
    intercept[Exception](range("startVersion" -> "9"))
  }

  test("streaming changes: future-only by default, survives mor deletes and rewrites") {
    sql("CREATE TABLE mdlake.db.st (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.st SELECT id, 0 FROM range(0, 6)")   // pre-stream
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val q = spark.readStream.table("mdlake.db.st.changes").writeStream
      .option("checkpointLocation", tmp("md-st-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("_change_type", "k", "_commit_version").collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1), r.getLong(2)))); ()
      }
      .start()
    q.processAllAvailable()
    assert(got.isEmpty, "default stream starts AFTER the current version")
    sql("INSERT INTO mdlake.db.st VALUES (100, 0)")       // append
    q.processAllAvailable()
    assert(got.toArray.toSet === Set(("insert", 100L, 2L)))
    sql("DELETE FROM mdlake.db.st WHERE k % 3 = 1")       // mor: vector growth
    q.processAllAvailable()
    assert(got.toArray.toSet === Set(("insert", 100L, 2L),
      ("delete", 1L, 3L), ("delete", 4L, 3L), ("delete", 100L, 3L)))
    sql("UPDATE mdlake.db.st SET v = 9 WHERE k = 0")      // cow rewrite churn
    q.processAllAvailable()
    q.stop()
    val after = got.toArray.map(_.asInstanceOf[(String, Long, Long)]).toSeq
      .filter(_._3 == 4L)
    // the rewritten dir retracts its live rows and re-inserts the new copy
    assert(after.count(_._1 == "delete") === after.count(_._1 == "insert"))
    assert(after.filter(_._1 == "insert").map(_._2).toSet ===
      after.filter(_._1 == "delete").map(_._2).toSet)
  }

  test("streaming replay from startVersion 0 reconstructs the table") {
    buildMixed("rp")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val q = spark.readStream.option("startVersion", "0")
      .table("mdlake.db.rp.changes").writeStream
      .option("checkpointLocation", tmp("md-rp-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("_change_type", "k", "v").collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1), r.getLong(2)))); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val counts = got.toArray.map(_.asInstanceOf[(String, Long, Long)]).toSeq
      .groupBy(t => (t._2, t._3))
      .map { case (kv, ts) =>
        kv -> ts.map(t => if (t._1 == "insert") 1 else -1).sum
      }
      .filter(_._2 != 0).keySet
    assert(counts === sql("SELECT k, v FROM mdlake.db.rp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("timestamp range options resolve through manifest mtimes") {
    sql("CREATE TABLE mdlake.db.ts (k BIGINT)")
    sql("INSERT INTO mdlake.db.ts VALUES (1)")
    sql("INSERT INTO mdlake.db.ts VALUES (2)")
    sql("INSERT INTO mdlake.db.ts VALUES (3)")
    // space the commit instants a second apart (same-ms commits are
    // indistinguishable by mtime)
    val base = (System.currentTimeMillis() / 1000) * 1000 - 60000
    (1 to 3).foreach(v => assert(
      new java.io.File(s"$root/db/ts/manifest-$v").setLastModified(base + v * 1000)))
    val l = log("db/ts")
    def keys(opts: (String, String)*): Seq[Long] = {
      var r = spark.read
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.table("mdlake.db.ts.changes").select("k")
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    // start is the exclusive start STATE: v1's own changes excluded
    assert(keys("startTimestamp" -> l.commitTimestamp(1).toString) === Seq(2L, 3L))
    assert(keys("startTimestamp" -> l.commitTimestamp(1).toString,
      "endTimestamp" -> l.commitTimestamp(2).toString) === Seq(2L))
    // ISO / Timestamp-literal form works too
    assert(keys("endTimestamp" ->
      new java.sql.Timestamp(l.commitTimestamp(2)).toString) === Seq(1L, 2L))
    val early = intercept[Exception](keys("startTimestamp" -> (base - 5000).toString))
    assert(early.getMessage.contains("predates"))
    intercept[Exception](keys("startVersion" -> "1", "startTimestamp" -> "123"))
  }

  test("files table exposes the live manifest entries with their stats") {
    sql("CREATE TABLE mdlake.db.fl (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.fl SELECT id FROM range(0, 10)")
    sql("INSERT INTO mdlake.db.fl SELECT id FROM range(10, 20)")
    sql("DELETE FROM mdlake.db.fl WHERE k % 7 = 1")   // vectors on both dirs
    val f = sql("SELECT * FROM mdlake.db.fl.files ORDER BY dir")
    assert(f.schema.fieldNames ===
      Array("dir", "rows", "deleted_rows", "deletion_vector", "column_stats"))
    val rs = f.collect()
    assert(rs.length === 2)
    assert(rs.map(_.getLong(1)).sum === 20L, "physical rows")
    assert(rs.map(_.getLong(2)).sum === 3L, "1,8,15 deleted")
    assert(rs.forall(r => r.getString(3) != null))
    // the k column's committed range is queryable
    val kstats = sql("SELECT dir, s.min, s.max FROM " +
      "(SELECT dir, explode(column_stats) s FROM mdlake.db.fl.files) " +
      "WHERE s.column = 'k' ORDER BY cast(s.min AS BIGINT)").collect()
    assert(kstats.map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("0", "9"), ("10", "19")))
  }

  test("history table serves DESCRIBE HISTORY queries") {
    buildMixed("hi")
    val h = sql("SELECT * FROM mdlake.db.hi.history ORDER BY version")
    assert(h.schema.fieldNames ===
      Array("version", "committed_at", "operation", "dirs", "physical_rows", "live_rows"))
    val rows = h.collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 5L))
    // every writer stamps its operation
    assert(rows.map(r => r.getLong(0) -> r.getString(2)).toMap === Map(
      1L -> "WRITE", 2L -> "WRITE", 3L -> "UPDATE",
      4L -> "DELETE (merge-on-read)", 5L -> "OPTIMIZE"))
    // v4's mor delete: physical unchanged from v3, live shrinks; v5's
    // compaction: physical falls to live
    val byV = rows.map(r => r.getLong(0) ->
      (r.getLong(4), r.getLong(5))).toMap
    assert(byV(3)._1 === byV(4)._1)
    assert(byV(4)._2 < byV(4)._1)
    assert(byV(5)._1 === byV(4)._2 && byV(5)._2 === byV(4)._2)
    assert(h.where(col("committed_at").isNull).count() === 0)
  }

  test("a changes stream fails loudly when the schema evolves mid-stream") {
    sql("CREATE TABLE mdlake.db.ev (k BIGINT)")
    sql("INSERT INTO mdlake.db.ev VALUES (1)")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table("mdlake.db.ev.changes").writeStream
      .option("checkpointLocation", tmp("md-ev-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    q.processAllAvailable()
    sql("INSERT INTO mdlake.db.ev VALUES (2)")
    q.processAllAvailable()
    assert(got.toArray.toSet === Set(2L))
    // widening the schema mid-stream must fail the query, not silently
    // drop the new column from subsequent change rows
    sql("ALTER TABLE mdlake.db.ev ADD COLUMNS (tag STRING)")
    sql("INSERT INTO mdlake.db.ev VALUES (3, 't')")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getCause.getMessage.contains("evolved mid-stream"))
    q.stop()
  }

  test("a stream with endVersion drains the bound and then idles") {
    sql("CREATE TABLE mdlake.db.bd (k BIGINT)")
    sql("INSERT INTO mdlake.db.bd VALUES (1)")   // v1
    sql("INSERT INTO mdlake.db.bd VALUES (2)")   // v2
    sql("INSERT INTO mdlake.db.bd VALUES (3)")   // v3
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .option("startVersion", "0").option("endVersion", "2")
      .table("mdlake.db.bd.changes").writeStream
      .option("checkpointLocation", tmp("md-bd-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    q.processAllAvailable()
    assert(got.toArray.toSet === Set(1L, 2L), "only versions <= endVersion")
    sql("INSERT INTO mdlake.db.bd VALUES (4)")   // v4: past the bound
    q.processAllAvailable()
    q.stop()
    assert(got.toArray.toSet === Set(1L, 2L),
      "versions past endVersion must never be emitted")
  }

  test("batch changes reads are column-pruned; count(*) works") {
    sql("CREATE TABLE mdlake.db.pr (k BIGINT, v BIGINT, pad STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.pr SELECT id, id * 2, repeat('x', 50) FROM range(0, 10)")
    sql("DELETE FROM mdlake.db.pr WHERE k % 4 = 1")
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan.description()
      }.mkString
    val narrow = sql("SELECT k, _change_type FROM mdlake.db.pr.changes")
    assert(scanDesc(narrow).contains("ReadSchema: k") &&
      !scanDesc(narrow).contains("pad"),
      s"expected a k-only read, got: ${scanDesc(narrow)}")
    assert(narrow.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      ((0L until 10L).map(k => (k, "insert")) ++
        Seq(1L, 5L, 9L).map(k => (k, "delete"))).toSet)
    // no data columns at all (count(*)) still counts every change row
    assert(sql("SELECT count(*) c FROM mdlake.db.pr.changes").collect()
      === Array(Row(13L)))
  }

  test("unknown suffixes and missing parents still resolve to no table") {
    buildMixed("nx")
    intercept[Exception](sql("SELECT * FROM mdlake.db.nx.snapshots"))
    intercept[Exception](sql("SELECT * FROM mdlake.db.nope.changes"))
    intercept[Exception](sql("INSERT INTO mdlake.db.nx.changes VALUES (1, 1, 'insert', 1, now())"))
    // nothing may nest under a table dir: a metadata-suffix name is taken
    // (tableExists says so, so CREATE fails as already-exists), and any
    // OTHER nested name trips the table-not-namespace guard
    val shadow = intercept[Exception](sql("CREATE TABLE mdlake.db.nx.changes (x BIGINT)"))
    assert(shadow.getMessage.contains("already exists"))
    val nested = intercept[Exception](sql("CREATE TABLE mdlake.db.nx.other (x BIGINT)"))
    assert(nested.getMessage.contains("is a table, not a namespace"))
    // renames and namespaces may not nest under a table dir either
    sql("CREATE TABLE mdlake.db.mv (x BIGINT)")
    val ren = intercept[Exception](
      sql("ALTER TABLE mdlake.db.mv RENAME TO mdlake.db.nx.sub"))
    assert(ren.getMessage.contains("is a table, not a namespace"))
    val ns = intercept[Exception](sql("CREATE NAMESPACE mdlake.db.nx.ns"))
    assert(ns.getMessage.contains("is a table, not a namespace"))
    // tableExists agrees with loadTable on metadata idents
    assert(spark.catalog.tableExists("mdlake.db.nx.changes"))
    assert(spark.catalog.tableExists("mdlake.db.nx.history"))
    assert(!spark.catalog.tableExists("mdlake.db.nx.snapshots"))
    // and a nonsense stream range fails at query START (scan-builder
    // validation), before any batch tries to read manifest -3
    val q = spark.readStream.option("startVersion", "-3")
      .table("mdlake.db.nx.changes").writeStream
      .option("checkpointLocation", tmp("md-neg-ckpt"))
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .start()
    val se = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(se.getCause.getMessage.contains("startVersion must be >= 0"))
    q.stop()
  }

  // ---- update pre/post-image change types (mor UPDATE commits) -------------

  test("a mor UPDATE emits update_preimage/update_postimage pairs") {
    sql("CREATE NAMESPACE IF NOT EXISTS mdlake.db")
    sql("CREATE TABLE mdlake.db.up (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.update.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.up SELECT id, 0 FROM range(0, 8)")   // v1
    sql("UPDATE mdlake.db.up SET v = 7 WHERE k IN (2, 5)")          // v2 mor
    assert(log("db/up").opAt(2).contains("UPDATE (merge-on-read)"), "commit op marker")
    val v2 = sql("SELECT _change_type, k, v FROM mdlake.db.up.changes " +
      "WHERE _commit_version = 2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v2 === Set(
      ("update_preimage", 2L, 0L), ("update_preimage", 5L, 0L),
      ("update_postimage", 2L, 7L), ("update_postimage", 5L, 7L)))
    // pairing: same key appears exactly once as pre- and once as post-image
    // within the commit; everything else in the feed is plain inserts
    val types = sql("SELECT DISTINCT _change_type FROM mdlake.db.up.changes")
      .collect().map(_.getString(0)).toSet
    assert(types === Set("insert", "update_preimage", "update_postimage"))
  }

  test("a cow UPDATE stays net-effect delete+insert") {
    sql("CREATE TABLE mdlake.db.upc (k BIGINT, v BIGINT)")
    sql("INSERT INTO mdlake.db.upc SELECT id, 0 FROM range(0, 8)")  // v1
    sql("UPDATE mdlake.db.upc SET v = 7 WHERE k = 3")               // v2 cow
    assert(log("db/upc").opAt(2).contains("UPDATE"),
      "a cow UPDATE records its operation but NOT the merge-on-read marker")
    val types = sql("SELECT DISTINCT _change_type FROM mdlake.db.upc.changes " +
      "WHERE _commit_version = 2").collect().map(_.getString(0)).toSet
    assert(types === Set("insert", "delete"),
      "no row lineage on a cow rewrite: unmatched rows re-insert verbatim")
  }

  test("a growth chain mixes delete and update_preimage per commit") {
    sql("CREATE TABLE mdlake.db.gc (k BIGINT, v BIGINT) TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read','graft.update.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.gc SELECT id, 0 FROM range(0, 10)")  // v1
    sql("DELETE FROM mdlake.db.gc WHERE k = 1")                     // v2: dv grows
    sql("UPDATE mdlake.db.gc SET v = 9 WHERE k = 2")                // v3: dv grows again
    val ch = sql("SELECT _change_type, k, v, _commit_version " +
      "FROM mdlake.db.gc.changes WHERE _commit_version > 1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // ONE scan of the dir serves both growth steps, each row stamped with
    // its own commit's version AND change type
    assert(ch === Set(
      ("delete", 1L, 0L, 2L),
      ("update_preimage", 2L, 0L, 3L),
      ("update_postimage", 2L, 9L, 3L)))
    // a mor DELETE records its op too, but keeps the plain delete type
    assert(log("db/gc").opAt(2).contains("DELETE (merge-on-read)"))
  }

  test("replaying a history with update types reconstructs the snapshot") {
    sql("CREATE TABLE mdlake.db.rp2 (k BIGINT, v BIGINT) TBLPROPERTIES " +
      "('graft.update.mode'='merge-on-read','graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.rp2 SELECT id, 0 FROM range(0, 10)")
    sql("UPDATE mdlake.db.rp2 SET v = 1 WHERE k < 4")
    sql("DELETE FROM mdlake.db.rp2 WHERE k IN (0, 8)")
    sql("UPDATE mdlake.db.rp2 SET v = 2 WHERE k = 1")
    val l = log("db/rp2")
    val net = ChangeFeed.between(spark, l, 0, l.latestVersion.get)
      .groupBy("k", "v")
      .agg(sum(when(col("_change_type").isin("insert", "update_postimage"), 1)
        .otherwise(-1)).as("n"))
      .where(col("n") =!= 0)
    assert(net.select("k", "v").collect().toSet ===
      sql("SELECT k, v FROM mdlake.db.rp2").collect().toSet)
  }

  // ---- explicit read-schema override (streams are never planner-pruned) ----

  test("format face streams a COLUMN-PROJECTED change feed") {
    sql("CREATE TABLE mdlake.db.pj (k BIGINT, a STRING, b STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.pj SELECT id, concat('a', id), concat('b', id) " +
      "FROM range(0, 5)")
    val schemas = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = spark.readStream.format("graft-changes")
      .option("path", s"$root/db/pj")
      .option("startVersion", "0").option("columns", "k")
      .load().writeStream
      .option("checkpointLocation", tmp("md-pj-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        schemas.add(b.schema.fieldNames.toSeq)
        b.collect().foreach(r => got.add((r.getLong(r.fieldIndex("k")),
          r.getString(r.fieldIndex("_change_type")),
          r.getLong(r.fieldIndex("_commit_version"))))); ()
      }
      .start()
    q.processAllAvailable()
    sql("DELETE FROM mdlake.db.pj WHERE k = 3")
    q.processAllAvailable()
    q.stop()
    assert(schemas.toArray.head === Seq("k",
      "_change_type", "_commit_version", "_commit_timestamp"))
    assert(got.toArray.toSet === Set(
      (0L, "insert", 1L), (1L, "insert", 1L), (2L, "insert", 1L),
      (3L, "insert", 1L), (4L, "insert", 1L), (3L, "delete", 2L)))
    // the catalog face cannot legally project a stream (the planner pins
    // the table's full schema) — it must refuse, pointing at this face
    val bad = spark.readStream
      .option("startVersion", "0").option("columns", "k")
      .table("mdlake.db.pj.changes").writeStream
      .option("checkpointLocation", tmp("md-pjx-ckpt"))
      .foreachBatch { (_: Dataset[Row], _: Long) => () }
      .start()
    val se = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      bad.processAllAvailable())
    assert(se.getCause.getMessage.contains("format face"))
    bad.stop()
    // batch through the format face matches the catalog face
    val viaFormat = spark.read.format("graft-changes")
      .option("path", s"$root/db/pj").load()
    assert(viaFormat.collect().toSet ===
      sql("SELECT * FROM mdlake.db.pj.changes").collect().toSet)
  }

  test("columns option on the batch face defers to planner pruning; unknown names fail") {
    sql("CREATE TABLE mdlake.db.pj2 (k BIGINT, a STRING)")
    sql("INSERT INTO mdlake.db.pj2 VALUES (1, 'x')")
    // batch: the relation keeps the table schema and the planner's own
    // pruning (what the query actually selects) wins over the option
    val d = spark.read.option("columns", "k").table("mdlake.db.pj2.changes")
    assert(d.select("a").collect().map(_.getString(0)).toSeq === Seq("x"))
    assert(d.select("k").collect().map(_.getLong(0)).toSeq === Seq(1L))
    val e = intercept[Exception](
      spark.read.option("columns", "nope").table("mdlake.db.pj2.changes").collect())
    assert(e.getMessage.contains("unknown column 'nope'"))
  }

  // ---- manifest-cached deletion-vector cardinality -------------------------

  test("dv cardinality is manifest-cached and served without vector reads") {
    sql("CREATE TABLE mdlake.db.card (k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO mdlake.db.card SELECT id FROM range(0, 100)")  // v1
    sql("DELETE FROM mdlake.db.card WHERE k % 4 = 0")               // v2: 25 rows
    val l = log("db/card")
    val e = l.currentEntries().find(_.dv.isDefined).get
    assert(e.dvRows === Some(25L), "commit caches the union's cardinality")
    assert(e.dvRows.get ===
      DeletionVector.read(e.dv.get, l.hadoopConf).cardinality)
    assert(rows("SELECT deleted_rows FROM mdlake.db.card.files " +
      "WHERE deletion_vector IS NOT NULL") === Seq(Row(25L)))
    // a second delete re-caches the grown union's count
    sql("DELETE FROM mdlake.db.card WHERE k = 1")                   // v3: 26
    assert(l.currentEntries().find(_.dv.isDefined).get.dvRows === Some(26L))
    // legacy manifest lines (no cached count) still parse and degrade to
    // one read of the immutable vector file
    val legacy = l.currentEntries().map(en => en.copy(dvRows = None))
    assert(l.tryCommitEntries(l.latestVersion, legacy))
    val reread = l.currentEntries().find(_.dv.isDefined).get
    assert(reread.dvRows === None)
    assert(l.deletedRows(reread) === 26L)
    assert(rows("SELECT deleted_rows FROM mdlake.db.card.files " +
      "WHERE deletion_vector IS NOT NULL") === Seq(Row(26L)))
  }
}
