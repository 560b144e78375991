package graft.connector

import org.apache.spark.sql.Row

/** Merge-on-read DELETE (deletion vectors) end to end: SQL DELETE on a
  * `graft.delete.mode=merge-on-read` table writes a [[DeletionVector]]
  * instead of rewriting dirs, reads subtract it, time travel sees through
  * it, unions accumulate, the fully-deleted dir collapses, and the
  * copy-on-write / compaction / changefeed / vacuum surfaces all honor it.
  */
class MorDeleteSpec extends LakeSpec {
  protected def catalogName = "morlake"

  private def mkTable(name: String): Unit = {
    sql(s"CREATE TABLE morlake.db.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
  }

  test("DELETE writes a deletion vector instead of rewriting dirs") {
    sql("CREATE NAMESPACE IF NOT EXISTS morlake.db")
    mkTable("t")
    sql("INSERT INTO morlake.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    sql("INSERT INTO morlake.db.t SELECT id, concat('v', id) FROM range(100, 200)")
    val dirsBefore = log("db/t").currentDirs()
    assert(dirsBefore.size === 2)

    sql("DELETE FROM morlake.db.t WHERE k % 10 = 3")

    // same data dirs, new version, vectors attached
    val entries = log("db/t").currentEntries()
    assert(entries.map(_.dir).toSet === dirsBefore.toSet)
    assert(entries.forall(_.dv.isDefined))
    assert(rows("SELECT count(*) c FROM morlake.db.t") === Seq(Row(180L)))
    assert(rows("SELECT count(*) c FROM morlake.db.t WHERE k % 10 = 3") === Seq(Row(0L)))
    // filters behave on the surviving rows
    assert(rows("SELECT v FROM morlake.db.t WHERE k = 42") === Seq(Row("v42")))
    // time travel reads the pre-delete snapshot
    assert(rows("SELECT count(*) c FROM morlake.db.t VERSION AS OF 2") === Seq(Row(200L)))
  }

  test("second DELETE unions with the existing vector") {
    mkTable("u")
    sql("INSERT INTO morlake.db.u SELECT id, concat('v', id) FROM range(0, 100)")
    sql("DELETE FROM morlake.db.u WHERE k < 10")
    sql("DELETE FROM morlake.db.u WHERE k >= 90")
    assert(rows("SELECT count(*) c, min(k) mn, max(k) mx FROM morlake.db.u") ===
      Seq(Row(80L, 10L, 89L)))
    // one dir, one (fresh) vector holding the union
    val entries = log("db/u").currentEntries()
    assert(entries.size === 1 && entries.head.dv.isDefined)
    val dv = DeletionVector.read(entries.head.dv.get,
      spark.sparkContext.hadoopConfiguration)
    assert(dv.cardinality === 20L)
  }

  test("a fully-deleted dir collapses out of the manifest") {
    mkTable("f")
    sql("INSERT INTO morlake.db.f SELECT id, 'a' FROM range(0, 50)")
    sql("INSERT INTO morlake.db.f SELECT id, 'b' FROM range(50, 100)")
    sql("DELETE FROM morlake.db.f WHERE k < 50")
    val entries = log("db/f").currentEntries()
    assert(entries.size === 1, "the all-deleted dir should be dropped")
    assert(entries.head.dv.isEmpty, "the surviving dir was not touched")
    assert(rows("SELECT count(*) c, min(k) mn FROM morlake.db.f") === Seq(Row(50L, 50L)))
  }

  test("lineage metadata columns are selectable and deletes key on them") {
    mkTable("l")
    sql("INSERT INTO morlake.db.l SELECT id, 'x' FROM range(0, 10)")
    val lineage = rows(
      "SELECT __graft_file f, __graft_pos p, k FROM morlake.db.l ORDER BY f, p")
    assert(lineage.size === 10)
    assert(lineage.forall(_.getString(0).endsWith(".parquet")))
    // positions are per FILE: within each file they run 0..count-1
    lineage.groupBy(_.getString(0)).values.foreach { inFile =>
      assert(inFile.map(_.getLong(1)).sorted === (0L until inFile.size.toLong))
    }
    val deletedId = lineage.find(_.getLong(2) == 7L).get
    sql("DELETE FROM morlake.db.l WHERE k = 7")
    val after = rows("SELECT __graft_file f, __graft_pos p FROM morlake.db.l")
    assert(after.size === 9)
    // exactly the (file, pos) pair of k=7 disappeared; all others unchanged
    assert(!after.exists(r => r.getString(0) == deletedId.getString(0) &&
      r.getLong(1) == deletedId.getLong(1)))
    val beforePairs = lineage.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after.map(r => (r.getString(0), r.getLong(1))).toSet ===
      beforePairs - ((deletedId.getString(0), deletedId.getLong(1))))
  }

  test("copy-on-write UPDATE after a mor DELETE does not resurrect deleted rows") {
    mkTable("cw")
    sql("INSERT INTO morlake.db.cw SELECT id, 'old' FROM range(0, 100)")
    sql("DELETE FROM morlake.db.cw WHERE k < 20")
    // UPDATE stays copy-on-write even in merge-on-read delete mode; its
    // rewrite scan must apply the vector, and the rewritten dir is clean
    sql("UPDATE morlake.db.cw SET v = 'new' WHERE k >= 50")
    assert(rows("SELECT count(*) c, min(k) mn FROM morlake.db.cw") === Seq(Row(80L, 20L)))
    assert(rows("SELECT count(*) c FROM morlake.db.cw WHERE v = 'new'") === Seq(Row(50L)))
    val entries = log("db/cw").currentEntries()
    assert(entries.forall(_.dv.isEmpty), "rewrite output must be vector-free")
  }

  test("filters and grouping behave identically to an eager delete") {
    mkTable("q")
    sql("INSERT INTO morlake.db.q SELECT id, concat('g', id % 7) FROM range(0, 1000)")
    sql("DELETE FROM morlake.db.q WHERE k % 3 = 0")
    val expect = (0L until 1000L).filterNot(_ % 3 == 0)
    assert(rows("SELECT count(*) c FROM morlake.db.q") === Seq(Row(expect.size.toLong)))
    assert(rows("SELECT sum(k) s FROM morlake.db.q") === Seq(Row(expect.sum)))
    val grouped = rows(
      "SELECT v, count(*) c FROM morlake.db.q GROUP BY v ORDER BY v")
    val expectGroups = expect.groupBy(k => s"g${k % 7}").view.mapValues(_.size.toLong)
    assert(grouped.map(r => r.getString(0) -> r.getLong(1)).toMap === expectGroups.toMap)
    // point lookup through pushed filters on a vectored file
    assert(rows("SELECT v FROM morlake.db.q WHERE k = 500") === Seq(Row("g3")))
    assert(rows("SELECT v FROM morlake.db.q WHERE k = 501") === Seq.empty)
  }

  test("compaction applies and purges vectors") {
    mkTable("cp")
    sql("INSERT INTO morlake.db.cp SELECT id, 'a' FROM range(0, 500)")
    sql("INSERT INTO morlake.db.cp SELECT id, 'b' FROM range(500, 1000)")
    sql("DELETE FROM morlake.db.cp WHERE k % 5 = 1")
    val l = log("db/cp")
    assert(l.currentEntries().forall(_.dv.isDefined))
    assert(Compaction.compact(spark, l, clusterBy = Seq("k")))
    val after = l.currentEntries()
    assert(after.forall(_.dv.isEmpty), "compaction must purge vectors")
    assert(rows("SELECT count(*) c FROM morlake.db.cp") === Seq(Row(800L)))
    assert(rows("SELECT count(*) c FROM morlake.db.cp WHERE k % 5 = 1") === Seq(Row(0L)))
    // and the surviving rows are exactly the live set
    assert(rows("SELECT sum(k) s FROM morlake.db.cp") ===
      Seq(Row((0L until 1000L).filterNot(_ % 5 == 1).sum)))
  }

  test("a lone vectored dir compacts even when large enough to keep") {
    mkTable("cl")
    sql("INSERT INTO morlake.db.cl SELECT id, 'x' FROM range(0, 100)")
    sql("DELETE FROM morlake.db.cl WHERE k < 50")
    val l = log("db/cl")
    // smallBytes=0: nothing qualifies as small, but the vectored dir is
    // 50% deleted >= purge fraction, so it rewrites alone
    assert(Compaction.compact(spark, l, smallBytes = 0L))
    assert(l.currentEntries().forall(_.dv.isEmpty))
    assert(rows("SELECT count(*) c, min(k) mn FROM morlake.db.cl") === Seq(Row(50L, 50L)))
  }

  test("changefeed refuses a merge-on-read delete in its range") {
    mkTable("cf")
    sql("INSERT INTO morlake.db.cf SELECT id, 'x' FROM range(0, 10)")
    sql("DELETE FROM morlake.db.cf WHERE k = 3")
    val stream = new GraftMicroBatchStream(log("db/cf"), null, null)
    val ex = intercept[UnsupportedOperationException](
      stream.planInputPartitions(GraftVersionOffset(1L), GraftVersionOffset(2L)))
    assert(ex.getMessage.contains("merge-on-read DELETE"))
  }

  test("vacuum keeps live vectors, reclaims superseded ones") {
    mkTable("vc")
    sql("INSERT INTO morlake.db.vc SELECT id, 'x' FROM range(0, 100)")
    sql("DELETE FROM morlake.db.vc WHERE k < 10")   // dv A
    sql("DELETE FROM morlake.db.vc WHERE k < 20")   // dv B (A superseded)
    val l = log("db/vc")
    val liveDv = l.currentEntries().flatMap(_.dv)
    assert(liveDv.size === 1)
    l.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(l.tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvFiles = fs.listStatus(new org.apache.hadoop.fs.Path(l.tableDir, "dv"))
      .map(_.getPath.getName).toSet
    assert(dvFiles === liveDv.map(p => new org.apache.hadoop.fs.Path(p).getName).toSet,
      "only the live vector survives vacuum")
    // reads still correct after vacuum
    assert(rows("SELECT count(*) c, min(k) mn FROM morlake.db.vc") === Seq(Row(80L, 20L)))
  }

  test("aggregate pushdown is refused on vectored snapshots") {
    mkTable("ag")
    sql("INSERT INTO morlake.db.ag SELECT id, 'x' FROM range(0, 100)")
    sql("DELETE FROM morlake.db.ag WHERE k < 40")
    // with spark.sql.parquet.aggregatePushdown on, a footer-served count
    // would report 100; the vectored scan must refuse and count rows
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try assert(rows("SELECT count(*) c FROM morlake.db.ag") === Seq(Row(60L)))
    finally spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
  }

  test("concurrent OVERLAPPING mor deletes on the same dir conflict; stale vector loses") {
    mkTable("cc")
    sql("INSERT INTO morlake.db.cc SELECT id, 'x' FROM range(0, 100)")
    val l = log("db/cc")
    val pinned = l.currentEntries()
    val fs = new org.apache.hadoop.fs.Path(pinned.head.dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(pinned.head.dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    def deleter(pos: Long*) = {
      val w = new GraftDvBatchWrite(l, pinned, None, None,
        org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
      () => w.commit(Array(DvDeltaMessage(Map(file.toString -> pos.toArray),
        Map.empty, 0, Array.emptyLongArray, 0L, 0L, null)))
    }
    // vector changes under the pin, AT the position the stale writer also
    // deletes — position-disjoint stale deletes now auto-merge
    // (DisjointRewriteSpec), so the conflict contract is about OVERLAP
    val winner = deleter(0L)
    val loser = deleter(0L, 2L)
    winner()
    val ex = intercept[java.util.ConcurrentModificationException](loser())
    assert(ex.getMessage.contains("deletion vector changed"))
    assert(ex.getMessage.contains("overlap"))
  }

  test("merge-on-read UPDATE: delete+reinsert, original dirs untouched") {
    sql("CREATE TABLE morlake.db.mu (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.update.mode'='merge-on-read')")
    sql("INSERT INTO morlake.db.mu SELECT id, 'old' FROM range(0, 100)")
    val dirsBefore = log("db/mu").currentDirs()
    sql("UPDATE morlake.db.mu SET v = 'new' WHERE k % 10 = 0")
    val entries = log("db/mu").currentEntries()
    // original dir survives with a vector; updated rows live in a new dir
    assert(entries.map(_.dir).toSet.intersect(dirsBefore.toSet) === dirsBefore.toSet)
    assert(entries.size === dirsBefore.size + 1)
    assert(entries.count(_.dv.isDefined) >= 1)
    assert(rows("SELECT count(*) c FROM morlake.db.mu") === Seq(Row(100L)))
    assert(rows("SELECT count(*) c FROM morlake.db.mu WHERE v = 'new'") === Seq(Row(10L)))
    assert(rows("SELECT v FROM morlake.db.mu WHERE k = 50") === Seq(Row("new")))
    assert(rows("SELECT v FROM morlake.db.mu WHERE k = 51") === Seq(Row("old")))
    // time travel still shows pre-update rows
    assert(rows("SELECT count(*) c FROM morlake.db.mu VERSION AS OF 1 WHERE v = 'old'") ===
      Seq(Row(100L)))
  }

  test("merge-on-read MERGE: update + insert + delete clauses") {
    sql("CREATE TABLE morlake.db.mm (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO morlake.db.mm VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val dirsBefore = log("db/mm").currentDirs()
    import spark.implicits._
    Seq((2L, "B", "upsert"), (3L, null.asInstanceOf[String], "delete"),
      (4L, "d", "upsert"))
      .toDF("k", "v", "op").createOrReplaceTempView("mm_updates")
    sql("""MERGE INTO morlake.db.mm t USING mm_updates s ON t.k = s.k
          |WHEN MATCHED AND s.op = 'delete' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
    assert(rows("SELECT k, v FROM morlake.db.mm ORDER BY k") ===
      Seq(Row(1L, "a"), Row(2L, "B"), Row(4L, "d")))
    val entries = log("db/mm").currentEntries()
    assert(dirsBefore.toSet.subsetOf(entries.map(_.dir).toSet),
      "merge-on-read MERGE must keep the original dirs")
  }

  test("mor MERGE through a sort-merge join delivers unordered positions safely") {
    sql("CREATE TABLE morlake.db.smj (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.merge.mode'='merge-on-read')")
    sql("INSERT INTO morlake.db.smj SELECT id, 'old' FROM range(0, 2000)")
    // forbid broadcast: the matched target rows then arrive at the delta
    // writer ordered by JOIN KEY, not by row index — the driver merge must
    // normalize before encoding (review finding: the arrival-order
    // assumption aborted legitimate shuffled MERGEs)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("SELECT id AS k, concat('new', id) AS v FROM range(0, 2000) " +
        "WHERE id % 3 = 0").createOrReplaceTempView("smj_src")
      sql("""MERGE INTO morlake.db.smj t USING smj_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v
            |""".stripMargin)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert(rows("SELECT count(*) c FROM morlake.db.smj") === Seq(Row(2000L)))
    assert(rows("SELECT count(*) c FROM morlake.db.smj WHERE v LIKE 'new%'") ===
      Seq(Row(667L)))
    assert(rows("SELECT v FROM morlake.db.smj WHERE k = 9") === Seq(Row("new9")))
    assert(rows("SELECT v FROM morlake.db.smj WHERE k = 10") === Seq(Row("old")))
  }

  test("a past-envelope mor DELETE fails loudly instead of ballooning the driver") {
    sql("CREATE NAMESPACE IF NOT EXISTS morlake.db")
    sql("CREATE TABLE morlake.db.budget (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read', 'graft.mor.maxDeleteRows'='100')")
    sql("INSERT INTO morlake.db.budget SELECT id, 'x' FROM range(0, 500)")

    // 250 matched rows > budget 100: the command must raise the funnel
    // guard (task- or driver-side depending on partitioning), naming the
    // budget property and the copy-on-write escape
    val e = intercept[Exception](sql("DELETE FROM morlake.db.budget WHERE k % 2 = 0"))
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("graft.mor.maxDeleteRows"), s"got: $msg")
    assert(msg.contains("copy-on-write"), s"got: $msg")

    // nothing committed: the table still reads its full pre-delete state
    assert(rows("SELECT count(*) c FROM morlake.db.budget") === Seq(Row(500L)))

    // under-budget commands still work; raising the budget unblocks
    sql("DELETE FROM morlake.db.budget WHERE k < 50")
    assert(rows("SELECT count(*) c FROM morlake.db.budget") === Seq(Row(450L)))
    sql("ALTER TABLE morlake.db.budget SET TBLPROPERTIES " +
      "('graft.mor.maxDeleteRows'='1000000')")
    sql("DELETE FROM morlake.db.budget WHERE k % 2 = 0")
    assert(rows("SELECT count(*) c FROM morlake.db.budget") === Seq(Row(225L)))
  }

  test("mor UPDATE then mor DELETE then compaction converge") {
    sql("CREATE TABLE morlake.db.mx (k BIGINT, v STRING) TBLPROPERTIES " +
      "('graft.update.mode'='merge-on-read', 'graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO morlake.db.mx SELECT id, 'x' FROM range(0, 200)")
    sql("UPDATE morlake.db.mx SET v = 'y' WHERE k < 50")
    sql("DELETE FROM morlake.db.mx WHERE k % 2 = 0")
    assert(rows("SELECT count(*) c FROM morlake.db.mx") === Seq(Row(100L)))
    assert(rows("SELECT count(*) c FROM morlake.db.mx WHERE v = 'y'") === Seq(Row(25L)))
    assert(Compaction.compact(spark, log("db/mx")))
    assert(log("db/mx").currentEntries().forall(_.dv.isEmpty))
    assert(rows("SELECT count(*) c FROM morlake.db.mx") === Seq(Row(100L)))
    assert(rows("SELECT sum(k) s FROM morlake.db.mx") ===
      Seq(Row((0L until 200L).filter(_ % 2 == 1).sum)))
  }
}
