package graft.connector

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._

/** Dir-granular copy-on-write for the mini-lakehouse: committed per-dir
  * column stats ([[DirStats]]), group pruning of MERGE/UPDATE/DELETE
  * rewrites, and the two contracts whose silent violation loses data (the
  * rewritten dir keeps its unmatched rows; stats are never row filters).
  */
class GroupPruningSpec extends LakeSpec {
  protected def catalogName = "plake"

  private lazy val ns: Unit = { super.sql("CREATE NAMESPACE IF NOT EXISTS plake.db"); () }
  override protected def sql(q: String): org.apache.spark.sql.DataFrame = { ns; super.sql(q) }
  private def tlog(t: String) = log(s"db/$t")

  /** Three disjoint-key-range data dirs: [1,10], [11,20], [21,30]. */
  private def threeDirTable(t: String): TableLog = {
    sql(s"CREATE TABLE plake.db.$t (k BIGINT, v STRING)")
    sql(s"INSERT INTO plake.db.$t SELECT id, concat('a', id) FROM range(1, 11)")
    sql(s"INSERT INTO plake.db.$t SELECT id, concat('b', id) FROM range(11, 21)")
    sql(s"INSERT INTO plake.db.$t SELECT id, concat('c', id) FROM range(21, 31)")
    val l = tlog(t)
    assert(l.currentEntries().size === 3)
    l
  }

  test("commits record per-dir column stats in the manifest") {
    sql("CREATE TABLE plake.db.st (k BIGINT, v STRING)")
    sql("INSERT INTO plake.db.st VALUES (5, 'mm'), (9, 'zz'), (2, NULL)")
    val entries = tlog("st").currentEntries()
    assert(entries.size === 1)
    val stats = entries.head.stats.getOrElse(fail("no stats recorded"))
    assert(stats.rows === 3)
    assert(stats.cols("k") === ColStats("long", 2L, 9L, 0L))
    assert(stats.cols("v") === ColStats("string", "mm", "zz", 1L))
  }

  test("UPDATE rewrites only the dir that can match; every other row survives untouched") {
    val l = threeDirTable("u3")
    val before = l.currentEntries().map(_.dir)
    sql("UPDATE plake.db.u3 SET v = 'HIT' WHERE k = 25")
    val after = l.currentEntries().map(_.dir)
    // dirs [1,10] and [11,20] are carried over byte-identical, [21,30] replaced
    assert(after.count(before.contains) === 2)
    assert(after.size === 3)
    // full content check: the unmatched rows of the REWRITTEN dir survive too
    assert(rows("SELECT count(*) FROM plake.db.u3") === Seq(Row(30L)))
    assert(rows("SELECT v FROM plake.db.u3 WHERE k = 25") === Seq(Row("HIT")))
    assert(rows("SELECT count(*) FROM plake.db.u3 WHERE v LIKE 'c%'") === Seq(Row(9L)))
    // carried dirs keep their stats through the rewrite commit
    val carried = l.currentEntries().filter(e => before.contains(e.dir))
    assert(carried.forall(_.stats.isDefined))
  }

  test("DELETE that empties its whole group removes the dir; pruned dirs untouched") {
    val l = threeDirTable("d3")
    val before = l.currentEntries().map(_.dir)
    sql("DELETE FROM plake.db.d3 WHERE k <= 10")
    val after = l.currentEntries().map(_.dir)
    assert(after.size === 2, "emptied dir should vanish, not become an empty dir")
    assert(after.forall(before.contains))
    assert(rows("SELECT min(k), count(*) FROM plake.db.d3") === Seq(Row(11L, 20L)))
  }

  test("a whole-dir DELETE is metadata-only: manifest commit, zero data IO") {
    val l = threeDirTable("md3")
    val before = l.currentEntries().map(_.dir)
    val d = sql("DELETE FROM plake.db.md3 WHERE k <= 10")
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("DeleteFromTable") && !plan.contains("ReplaceData"),
      s"expected the metadata-only delete path in:\n$plan")
    val after = l.currentEntries().map(_.dir)
    assert(after.size === 2 && after.forall(before.contains),
      "dropped dir, no staging dir written")
    assert(rows("SELECT min(k), count(*) FROM plake.db.md3") === Seq(Row(11L, 20L)))
    // unconditioned DELETE = metadata truncate to empty
    sql("DELETE FROM plake.db.md3")
    assert(l.currentEntries().isEmpty)
    assert(rows("SELECT count(*) FROM plake.db.md3") === Seq(Row(0L)))
  }

  test("a partial-dir DELETE falls back to the copy-on-write rewrite") {
    val l = threeDirTable("mp3")
    val d = sql("DELETE FROM plake.db.mp3 WHERE k <= 15")
    assert(d.queryExecution.executedPlan.toString.contains("ReplaceData"),
      "a dir the stats cannot classify exactly must take the rewrite path")
    assert(rows("SELECT min(k), count(*) FROM plake.db.mp3") === Seq(Row(16L, 15L)))
    assert(l.currentEntries().size === 2)
  }

  test("mustMatchAll: provable-total-match logic per filter shape") {
    def mm(f: Filter) = DirStats.mustMatchAll(Some(s), Seq(f))
    assert(mm(LessThanOrEqual("k", 20L)) && !mm(LessThanOrEqual("k", 19L)))
    assert(mm(GreaterThanOrEqual("k", 5L)) && !mm(GreaterThanOrEqual("k", 6L)))
    assert(mm(LessThan("k", 21L)) && !mm(LessThan("k", 20L)))
    assert(mm(GreaterThan("k", 4L)) && !mm(GreaterThan("k", 5L)))
    assert(!mm(EqualTo("k", 5L)), "non-constant column can't all-equal")
    assert(mm(IsNotNull("k")) && !mm(IsNotNull("v")), "v has nulls")
    assert(mm(IsNull("dead")) && !mm(IsNull("v")))
    assert(!mm(EqualTo("v", "bb")), "nullable column never provably all-matches")
    assert(mm(And(LessThanOrEqual("k", 20L), GreaterThan("k", 0L))))
    assert(mm(Or(LessThanOrEqual("k", 7L), GreaterThan("k", 4L))))
    assert(!mm(Or(LessThanOrEqual("k", 7L), GreaterThan("k", 8L))),
      "per-row mixtures are not provable from ranges alone")
    assert(!mm(StringStartsWith("v", "b")) && !mm(Not(EqualTo("k", 99L))))
    assert(!DirStats.mustMatchAll(None, Seq(AlwaysTrue())), "no stats proves nothing")
    assert(DirStats.mustMatchAll(Some(DirStats(0, Map.empty)), Seq(EqualTo("k", 1L))),
      "empty dir satisfies vacuously")
    val const = DirStats(3, Map("c" -> ColStats("long", 7L, 7L, 0L)))
    assert(DirStats.mustMatchAll(Some(const), Seq(EqualTo("c", 7L))))
    assert(DirStats.mustMatchAll(Some(const), Seq(In("c", Array[Any](5L, 7L)))))
    assert(!DirStats.mustMatchAll(Some(const), Seq(In("c", Array[Any](5L, 6L)))))
  }

  test("a no-match condition rewrites nothing at all") {
    val l = threeDirTable("n3")
    val before = l.currentEntries().map(_.dir)
    sql("UPDATE plake.db.n3 SET v = 'X' WHERE k = 999")
    assert(l.currentEntries().map(_.dir) === before)
    assert(rows("SELECT count(*) FROM plake.db.n3 WHERE v = 'X'") === Seq(Row(0L)))
  }

  test("string-range stats prune string-equality rewrites") {
    val l = threeDirTable("s3")   // v prefixes a/b/c per dir
    val before = l.currentEntries().map(_.dir)
    sql("UPDATE plake.db.s3 SET k = -1 WHERE v = 'b15'")
    val after = l.currentEntries().map(_.dir)
    assert(after.count(before.contains) === 2)
    assert(rows("SELECT count(*) FROM plake.db.s3 WHERE k = -1") === Seq(Row(1L)))
    assert(rows("SELECT count(*) FROM plake.db.s3") === Seq(Row(30L)))
  }

  test("MERGE with NOT MATCHED BY SOURCE still reaches rows in dirs the source never touches") {
    threeDirTable("m3")
    import spark.implicits._
    Seq((25L, "up")).toDF("k", "v").createOrReplaceTempView("m3_src")
    sql("""MERGE INTO plake.db.m3 t USING m3_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN UPDATE SET v = 'bysrc'
          |""".stripMargin)
    assert(rows("SELECT v FROM plake.db.m3 WHERE k = 25") === Seq(Row("up")))
    assert(rows("SELECT v FROM plake.db.m3 WHERE k = 1") === Seq(Row("bysrc")))
    assert(rows("SELECT count(*) FROM plake.db.m3") === Seq(Row(30L)))
  }

  test("a target-only conjunct in the MERGE ON condition prunes target groups") {
    val l = threeDirTable("mc3")
    val before = l.currentEntries().map(_.dir)
    import spark.implicits._
    Seq((25L, "hit")).toDF("k", "v").createOrReplaceTempView("mc3_src")
    sql("""MERGE INTO plake.db.mc3 t USING mc3_src s ON t.k = s.k AND t.k > 20
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |""".stripMargin)
    val after = l.currentEntries().map(_.dir)
    assert(rows("SELECT v FROM plake.db.mc3 WHERE k = 25") === Seq(Row("hit")))
    assert(rows("SELECT count(*) FROM plake.db.mc3") === Seq(Row(30L)))
    assert(after.count(before.contains) === 2,
      s"expected dirs [1,10] and [11,20] carried over; before=$before after=$after")
  }

  test("MERGE insert-only with pruned target groups keeps every pre-existing row") {
    val l = threeDirTable("mi3")
    import spark.implicits._
    Seq((41L, "new1"), (42L, "new2")).toDF("k", "v").createOrReplaceTempView("mi3_src")
    sql("""MERGE INTO plake.db.mi3 t USING mi3_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
    assert(rows("SELECT count(*) FROM plake.db.mi3") === Seq(Row(32L)))
    assert(rows("SELECT v FROM plake.db.mi3 WHERE k > 40 ORDER BY k") ===
      Seq(Row("new1"), Row("new2")))
  }

  test("runtime group filtering: a key-equality MERGE rewrites only the dirs its source keys hit") {
    val l = threeDirTable("rt3")
    val before = l.currentEntries().map(_.dir)
    import spark.implicits._
    Seq((25L, "hit"), (27L, "hit2")).toDF("k", "v").createOrReplaceTempView("rt3_src")
    // no target-only conjunct: static group filters see nothing here — only
    // the matching-rows subquery (distinct matched k values) can prune
    sql("""MERGE INTO plake.db.rt3 t USING rt3_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |""".stripMargin)
    val after = l.currentEntries().map(_.dir)
    assert(rows("SELECT v FROM plake.db.rt3 WHERE k IN (25, 27) ORDER BY k") ===
      Seq(Row("hit"), Row("hit2")))
    assert(rows("SELECT count(*) FROM plake.db.rt3") === Seq(Row(30L)))
    assert(after.count(before.contains) === 2,
      s"runtime filter should carry dirs [1,10] and [11,20]; before=$before after=$after")
  }

  test("runtime group filtering: MERGE whose source misses every dir replaces nothing but still inserts") {
    val l = threeDirTable("rm3")
    val before = l.currentEntries().map(_.dir)
    import spark.implicits._
    Seq((999L, "new")).toDF("k", "v").createOrReplaceTempView("rm3_src")
    sql("""MERGE INTO plake.db.rm3 t USING rm3_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
    val after = l.currentEntries().map(_.dir)
    assert(before.forall(after.contains),
      "all three fully-pruned dirs must survive untouched")
    assert(rows("SELECT count(*), max(k) FROM plake.db.rm3") === Seq(Row(31L, 999L)))
  }

  test("runtime group filtering: DELETE with an IN-subquery condition prunes dirs") {
    val l = threeDirTable("rs3")
    val before = l.currentEntries().map(_.dir)
    import spark.implicits._
    Seq(3L, 7L).toDF("kk").createOrReplaceTempView("rs3_keys")
    sql("DELETE FROM plake.db.rs3 WHERE k IN (SELECT kk FROM rs3_keys)")
    val after = l.currentEntries().map(_.dir)
    assert(rows("SELECT count(*) FROM plake.db.rs3") === Seq(Row(28L)))
    assert(rows("SELECT count(*) FROM plake.db.rs3 WHERE k IN (3, 7)") === Seq(Row(0L)))
    assert(after.count(before.contains) === 2,
      s"subquery values should prune dirs [11,20] and [21,30]; before=$before after=$after")
  }

  test("chooseFilterAttribute picks the most range-disjoint covered column") {
    def e(kMin: Long, kMax: Long, vMin: String, vMax: String) =
      DirEntry(s"d$kMin", Some(DirStats(10, Map(
        "k" -> ColStats("long", kMin, kMax, 0L),
        "v" -> ColStats("string", vMin, vMax, 0L)))))
    // k ranges disjoint, v ranges all overlapping -> k wins
    val entries = Seq(e(1, 10, "a", "z"), e(11, 20, "b", "y"), e(21, 30, "a", "x"))
    assert(GraftCowScan.chooseFilterAttribute(
      sql("SELECT CAST(1 AS BIGINT) k, 'x' v").schema, entries) === Some("k"))
    // no stats at all -> no runtime filtering (no wasted subquery)
    val statless = Seq(DirEntry("d1", None), DirEntry("d2", None))
    assert(GraftCowScan.chooseFilterAttribute(
      sql("SELECT CAST(1 AS BIGINT) k, 'x' v").schema, statless) === None)
    assert(GraftCowScan.chooseFilterAttribute(
      sql("SELECT CAST(1 AS BIGINT) k, 'x' v").schema, Nil) === None)
  }

  test("reads plan tasks only for the dirs whose stats may match (file-index pruning)") {
    threeDirTable("rd3")
    val q = sql("SELECT v FROM plake.db.rd3 WHERE k = 25")
    assert(q.collect().map(_.getString(0)).toSeq === Seq("c25"))
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case b: BatchScanExec => Seq(b)
    }.flatten
    val scanned = scans(q.queryExecution.executedPlan)
    assert(scanned.nonEmpty)
    val dirs = scanned.head.inputPartitions.collect {
      case fp: FilePartition => fp.files.toSeq.map(f =>
        new org.apache.hadoop.fs.Path(f.filePath.toString).getParent.toString)
    }.flatten.toSet
    assert(dirs.size === 1, s"expected files of one dir planned, got $dirs")
    // unfiltered and unknown-column-filtered reads still see everything
    assert(rows("SELECT count(*) FROM plake.db.rd3") === Seq(Row(30L)))
    assert(rows("SELECT count(*) FROM plake.db.rd3 WHERE v <> 'nope'") === Seq(Row(30L)))
  }

  test("pre-stats manifests (no stats column) fall back to full-snapshot rewrite") {
    sql("CREATE TABLE plake.db.bc (k BIGINT, v STRING)")
    sql("INSERT INTO plake.db.bc VALUES (1, 'a')")
    sql("INSERT INTO plake.db.bc VALUES (20, 'b')")
    val l = tlog("bc")
    // strip the stats column, as a manifest written before this feature
    val stripped = l.currentDirs()
    assert(l.tryCommit(l.latestVersion, stripped))
    assert(l.currentEntries().forall(_.stats.isEmpty))
    val before = l.currentDirs()
    sql("UPDATE plake.db.bc SET v = 'B' WHERE k = 20")
    val after = l.currentDirs()
    assert(after.intersect(before).isEmpty, "statless dirs cannot be pruned")
    assert(rows("SELECT v FROM plake.db.bc ORDER BY k") === Seq(Row("a"), Row("B")))
  }

  test("time travel still reads the pre-rewrite snapshot after a pruned rewrite") {
    val l = threeDirTable("tt3")
    val v = l.latestVersion.get
    sql("UPDATE plake.db.tt3 SET v = 'HIT' WHERE k = 25")
    assert(rows(s"SELECT v FROM plake.db.tt3 VERSION AS OF $v WHERE k = 25") ===
      Seq(Row("c25")))
  }

  // ---- DirStats unit behavior ---------------------------------------------

  private val s = DirStats(10, Map(
    "k" -> ColStats("long", 5L, 20L, 0L),
    "v" -> ColStats("string", "bb", "dd", 2L),
    "x" -> ColStats("double", 1.5, 2.5, 0L),
    "dead" -> ColStats("null", null, null, 10L)))

  private def m(f: Filter): Boolean = DirStats.mayMatch(Some(s), Seq(f))

  test("mayMatch: range logic per filter shape") {
    assert(m(EqualTo("k", 5L)) && m(EqualTo("k", 20L)) && !m(EqualTo("k", 4L)) && !m(EqualTo("k", 21L)))
    assert(m(EqualTo("k", 7)) && !m(EqualTo("k", 3)))          // Int vs long stats
    assert(m(EqualTo("k", 7.5)) && m(EqualTo("k", 7.0)) && !m(EqualTo("k", 3.0)))  // fractional never prunes
    assert(m(GreaterThan("k", 19L)) && !m(GreaterThan("k", 20L)))
    assert(m(GreaterThanOrEqual("k", 20L)) && !m(GreaterThanOrEqual("k", 21L)))
    assert(m(LessThan("k", 6L)) && !m(LessThan("k", 5L)))
    assert(m(LessThanOrEqual("k", 5L)) && !m(LessThanOrEqual("k", 4L)))
    assert(m(In("k", Array(1L, 21L, 9L))) && !m(In("k", Array(1L, 21L))))
    assert(!m(In("k", Array[Any](null))) && !m(In("k", Array.empty[Any])))
    assert(m(IsNull("v")) && !m(IsNull("k")))
    assert(m(IsNotNull("k")) && !m(IsNotNull("dead")))
    assert(m(EqualNullSafe("v", null)) && !m(EqualNullSafe("k", null)))
    assert(!m(EqualTo("dead", 1L)), "all-null column matches no equality")
    assert(m(And(EqualTo("k", 7L), EqualTo("v", "cc"))))
    assert(!m(And(EqualTo("k", 7L), EqualTo("v", "zz"))))
    assert(m(Or(EqualTo("k", 99L), EqualTo("v", "cc"))))
    assert(!m(Or(EqualTo("k", 99L), EqualTo("v", "zz"))))
    assert(m(EqualTo("x", 2.0)) && !m(EqualTo("x", 3.0)))
    assert(m(EqualTo("unknown_col", 1L)), "unknown column never prunes")
    assert(m(Not(EqualTo("k", 7L))), "Not is conservative")
    assert(m(StringStartsWith("v", "c")) && !m(StringStartsWith("v", "e")) &&
      !m(StringStartsWith("v", "a")) && m(StringStartsWith("v", "bb")))
    assert(!DirStats.mayMatch(Some(s), Seq(EqualTo("k", 4L), EqualTo("v", "cc"))),
      "any single impossible conjunct prunes")
    assert(DirStats.mayMatch(None, Seq(EqualTo("k", 4L))), "no stats never prunes")
  }

  test("string pruning uses parquet's UTF-8 byte order, not UTF-16 (supplementary chars)") {
    // parquet computes string min/max in unsigned UTF-8 byte order, where
    // U+1F600 (F0 9F 98 80) sorts ABOVE U+FF71 (EF BD B1); Java compareTo
    // says the opposite — a UTF-16 comparison here would "prove" no match
    // and silently drop the row from a rewrite
    val su = DirStats(2, Map(
      "v" -> ColStats("string", "ｱ" + "1", "😀" + "1", 0L)))
    assert(DirStats.mayMatch(Some(su), Seq(EqualTo("v", "😀" + "1"))))
    assert(DirStats.mayMatch(Some(su), Seq(EqualTo("v", "ｱ" + "1"))))
    assert(DirStats.mayMatch(Some(su), Seq(StringStartsWith("v", "😀"))))
    assert(!DirStats.mayMatch(Some(su), Seq(EqualTo("v", "A"))),
      "plain ASCII below both bounds still prunes")
    // end-to-end: footer stats + rewrite on a dir holding such strings
    sql("CREATE TABLE plake.db.u8 (k BIGINT, v STRING)")
    sql("INSERT INTO plake.db.u8 VALUES (1, 'ｱ' || '1'), (2, '😀' || '1')")
    sql("UPDATE plake.db.u8 SET k = -2 WHERE v = '😀' || '1'")
    assert(rows("SELECT k FROM plake.db.u8 ORDER BY k") === Seq(Row(-2L), Row(1L)))
  }

  test("an INSERT selecting zero rows leaves the manifest without phantom dirs") {
    sql("CREATE TABLE plake.db.z0 (k BIGINT)")
    sql("INSERT INTO plake.db.z0 VALUES (1)")
    val l = tlog("z0")
    val before = l.currentEntries().map(_.dir)
    sql("INSERT INTO plake.db.z0 SELECT id FROM range(0, 10) WHERE id > 100")
    assert(l.currentEntries().map(_.dir) === before)
    // and every listed dir actually exists on disk
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(l.currentDirs().forall(d => fs.exists(new org.apache.hadoop.fs.Path(d))))
  }

  test("vacuum reclaims superseded dirs at once but age-guards never-referenced orphans") {
    sql("CREATE TABLE plake.db.vg (k BIGINT)")
    sql("INSERT INTO plake.db.vg VALUES (1)")
    sql("INSERT OVERWRITE plake.db.vg VALUES (2)")
    val l = tlog("vg")
    // a fresh never-referenced dir: an in-flight write's staging
    val inflight = l.newDataDir()
    import spark.implicits._
    Seq(9L).toDF("k").write.parquet(inflight)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    l.vacuum(keepVersions = 1)   // default retention: orphan must survive
    assert(fs.exists(new org.apache.hadoop.fs.Path(inflight)),
      "a young unreferenced dir may be an in-flight staging dir")
    assert(rows("SELECT k FROM plake.db.vg") === Seq(Row(2L)))
    l.vacuum(keepVersions = 1, orphanRetentionMs = -1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(inflight)),
      "past retention the orphan is reclaimed")
  }

  test("DirStats JSON codec round-trips, tolerates garbage") {
    val json = DirStats.encode(s)
    assert(!json.contains("\n") && !json.contains("\t"))
    assert(DirStats.decode(json) === Some(s))
    assert(DirStats.decode("{not json") === None)
  }
}
