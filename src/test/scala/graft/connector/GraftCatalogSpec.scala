package graft.connector

import org.apache.spark.sql.Row

/** The mini-lakehouse catalog end-to-end through plain SQL: DDL, INSERT,
  * UPDATE/DELETE/MERGE via the DSv2 row-level operation API, time travel,
  * snapshot isolation, and optimistic-concurrency conflicts.
  */
class GraftCatalogSpec extends LakeSpec {
  protected def catalogName = "lake"

  test("create, insert, select round-trip") {
    sql("CREATE NAMESPACE lake.db")
    sql("CREATE TABLE lake.db.t (k BIGINT, v STRING)")
    sql("INSERT INTO lake.db.t VALUES (1, 'a'), (2, 'b')")
    assert(rows("SELECT k, v FROM lake.db.t ORDER BY k") ===
      Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("append is a new snapshot; time travel reads the old one") {
    sql("CREATE TABLE lake.db.tt (k BIGINT)")
    sql("INSERT INTO lake.db.tt VALUES (1)")
    sql("INSERT INTO lake.db.tt VALUES (2)")
    assert(rows("SELECT count(*) c FROM lake.db.tt") === Seq(Row(2L)))
    assert(rows("SELECT k FROM lake.db.tt VERSION AS OF 1") === Seq(Row(1L)))
  }

  test("UPDATE rewrites matching rows in place") {
    sql("CREATE TABLE lake.db.u (k BIGINT, v STRING)")
    sql("INSERT INTO lake.db.u VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql("UPDATE lake.db.u SET v = 'B' WHERE k = 2")
    assert(rows("SELECT v FROM lake.db.u ORDER BY k") ===
      Seq(Row("a"), Row("B"), Row("c")))
  }

  test("DELETE removes matching rows") {
    sql("CREATE TABLE lake.db.d (k BIGINT)")
    sql("INSERT INTO lake.db.d VALUES (1), (2), (3), (4)")
    sql("DELETE FROM lake.db.d WHERE k % 2 = 0")
    assert(rows("SELECT k FROM lake.db.d ORDER BY k") === Seq(Row(1L), Row(3L)))
  }

  test("MERGE INTO: update + insert + delete clauses") {
    sql("CREATE TABLE lake.db.m (k BIGINT, v STRING)")
    sql("INSERT INTO lake.db.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    import spark.implicits._
    Seq((2L, "B", "upsert"), (3L, null.asInstanceOf[String], "delete"),
      (4L, "d", "upsert"))
      .toDF("k", "v", "op").createOrReplaceTempView("m_updates")
    sql("""MERGE INTO lake.db.m t USING m_updates s ON t.k = s.k
          |WHEN MATCHED AND s.op = 'delete' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
    assert(rows("SELECT k, v FROM lake.db.m ORDER BY k") ===
      Seq(Row(1L, "a"), Row(2L, "B"), Row(4L, "d")))
  }

  test("INSERT OVERWRITE replaces the table content") {
    sql("CREATE TABLE lake.db.o (k BIGINT)")
    sql("INSERT INTO lake.db.o VALUES (1), (2)")
    sql("INSERT OVERWRITE lake.db.o VALUES (9)")
    assert(rows("SELECT k FROM lake.db.o") === Seq(Row(9L)))
  }

  test("snapshot isolation: a pinned read survives a concurrent rewrite + vacuum-free window") {
    sql("CREATE TABLE lake.db.si (k BIGINT)")
    sql("INSERT INTO lake.db.si VALUES (1), (2)")
    val before = sql("SELECT k FROM lake.db.si")   // plans against snapshot v2
    sql("DELETE FROM lake.db.si WHERE k = 1")      // commits v3, v2 dirs remain
    assert(before.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(rows("SELECT k FROM lake.db.si") === Seq(Row(2L)))
  }

  test("concurrent rewrite of the same snapshot conflicts loudly") {
    sql("CREATE TABLE lake.db.cc (k BIGINT, v STRING)")
    sql("INSERT INTO lake.db.cc VALUES (1, 'a'), (2, 'b')")
    val log = new TableLog(s"$root/db/cc",
      spark.sparkContext.hadoopConfiguration)
    val pinnedBefore = log.currentDirs()
    // a rewrite lands between this op's snapshot pin and its commit:
    sql("UPDATE lake.db.cc SET v = 'X' WHERE k = 1")   // replaces the pinned dir
    assert(log.currentDirs() !== pinnedBefore)
    // second rewrite based on the stale snapshot must refuse to commit —
    // exercised through the real GraftBatchWrite commit path
    val stale = new GraftBatchWrite(NoopBatchWrite, log, log.newDataDir(),
      ReplacePinned(() => pinnedBefore, _ => None, "UPDATE"))
    val ex = intercept[java.util.ConcurrentModificationException](
      stale.commit(Array.empty))
    assert(ex.getMessage.contains("concurrent rewrite"))
  }

  test("concurrent append survives a rewrite (dir not pinned is kept)") {
    sql("CREATE TABLE lake.db.ca (k BIGINT)")
    sql("INSERT INTO lake.db.ca VALUES (1)")
    val log = new TableLog(s"$root/db/ca", spark.sparkContext.hadoopConfiguration)
    val pinned = log.currentDirs()
    sql("INSERT INTO lake.db.ca VALUES (2)")   // append lands after the pin
    // rewrite that pinned only the first dir: replaces it, keeps the append
    import spark.implicits._
    val staging = log.newDataDir()
    Seq(10L).toDF("k").write.parquet(staging)
    var done = false
    while (!done) {
      val expected = log.latestVersion
      val current = expected.map(log.dirsAt).getOrElse(Nil)
      assert(pinned.forall(current.contains))
      done = log.tryCommit(expected, current.filterNot(pinned.contains) :+ staging)
    }
    assert(rows("SELECT k FROM lake.db.ca ORDER BY k") === Seq(Row(2L), Row(10L)))
  }

  test("vacuum drops unreferenced dirs but keeps recent versions") {
    sql("CREATE TABLE lake.db.vc (k BIGINT)")
    sql("INSERT INTO lake.db.vc VALUES (1)")
    sql("INSERT OVERWRITE lake.db.vc VALUES (2)")
    sql("INSERT OVERWRITE lake.db.vc VALUES (3)")
    val log = new TableLog(s"$root/db/vc", spark.sparkContext.hadoopConfiguration)
    assert(log.latestVersion === Some(3L))
    log.vacuum(keepVersions = 1)
    assert(rows("SELECT k FROM lake.db.vc") === Seq(Row(3L)))
    intercept[Exception](rows("SELECT k FROM lake.db.vc VERSION AS OF 1"))
  }

  test("schema and properties persist through the catalog") {
    sql("CREATE TABLE lake.db.p (k BIGINT, v STRING) TBLPROPERTIES ('team'='graft')")
    val t = sql("SELECT * FROM lake.db.p")
    assert(t.schema.fieldNames.toSeq === Seq("k", "v"))
    val desc = rows("SHOW TBLPROPERTIES lake.db.p").map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("team") === Some("graft"))
  }

  test("filters push down to the parquet scan through the catalog") {
    sql("CREATE TABLE lake.db.f (k BIGINT, v STRING)")
    sql("INSERT INTO lake.db.f VALUES (1, 'a'), (2, 'b')")
    val plan = sql("SELECT v FROM lake.db.f WHERE k = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(k)"),
      s"expected parquet pushdown in:\n$plan")
  }
}

/** Inner write whose commit/abort do nothing — lets the spec drive the
  * wrapper's manifest CAS in isolation.
  */
private object NoopBatchWrite extends org.apache.spark.sql.connector.write.BatchWrite {
  def createBatchWriterFactory(info: org.apache.spark.sql.connector.write.PhysicalWriteInfo) =
    throw new UnsupportedOperationException("commit-path probe only")
  def commit(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
  def abort(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
}
