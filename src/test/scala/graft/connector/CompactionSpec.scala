package graft.connector

import org.apache.spark.sql.Row

/** Small-dir compaction (the OPTIMIZE contract): pure layout maintenance —
  * identical rows, fewer dirs, fresh stats, snapshot history intact.
  */
class CompactionSpec extends LakeSpec {
  protected def catalogName = "clake"

  private lazy val ns: Unit = { super.sql("CREATE NAMESPACE IF NOT EXISTS clake.db"); () }
  override protected def sql(q: String): org.apache.spark.sql.DataFrame = { ns; super.sql(q) }
  private def tlog(t: String) = log(s"db/$t")

  test("compact folds small dirs into one, preserving rows, stats, and history") {
    sql("CREATE TABLE clake.db.c1 (k BIGINT, v STRING)")
    (0 until 6).foreach { i =>
      sql(s"INSERT INTO clake.db.c1 SELECT id, concat('v', id) FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val l = tlog("c1")
    assert(l.currentEntries().size === 6)
    val preVersion = l.latestVersion.get

    assert(Compaction.compact(spark, l))
    val entries = l.currentEntries()
    assert(entries.size === 1)
    val stats = entries.head.stats.getOrElse(fail("compacted dir lost stats"))
    assert(stats.rows === 60)
    assert(stats.cols("k") === ColStats("long", 0L, 59L, 0L))
    // identical row set through the catalog
    assert(sql("SELECT count(*), min(k), max(k) FROM clake.db.c1").collect().toSeq ===
      Seq(Row(60L, 0L, 59L)))
    // pre-compaction snapshot still readable until vacuum
    assert(sql(s"SELECT count(*) FROM clake.db.c1 VERSION AS OF $preVersion")
      .collect() === Array(Row(60L)))
    l.vacuum(keepVersions = 1)
    intercept[Exception](
      sql(s"SELECT count(*) FROM clake.db.c1 VERSION AS OF $preVersion").collect())
  }

  test("nothing to compact returns false and commits nothing") {
    sql("CREATE TABLE clake.db.c2 (k BIGINT)")
    sql("INSERT INTO clake.db.c2 VALUES (1)")
    val l = tlog("c2")
    val v = l.latestVersion
    assert(!Compaction.compact(spark, l))
    assert(l.latestVersion === v)
    assert(!Compaction.compact(spark, tlog("c2")), "single dir stays untouched")
  }

  test("dirs above the small threshold are left alone") {
    sql("CREATE TABLE clake.db.c3 (k BIGINT)")
    sql("INSERT INTO clake.db.c3 SELECT id FROM range(0, 1000)")    // 'big'
    sql("INSERT INTO clake.db.c3 VALUES (1000)")
    sql("INSERT INTO clake.db.c3 VALUES (1001)")
    val l = tlog("c3")
    val bigDir = l.currentEntries().head.dir
    // threshold below the big dir's size, above the 1-row dirs'
    val bigBytes = {
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(bigDir)).getLength
    }
    assert(Compaction.compact(spark, l, smallBytes = bigBytes))
    val after = l.currentEntries().map(_.dir)
    assert(after.size === 2 && after.contains(bigDir))
    assert(sql("SELECT count(*) FROM clake.db.c3").collect() === Array(Row(1002L)))
  }

  test("clusterBy keeps the merged dir sorted for row-group pruning") {
    sql("CREATE TABLE clake.db.c4 (k BIGINT, v STRING)")
    sql("INSERT INTO clake.db.c4 SELECT id, 'a' FROM range(50, 100)")
    sql("INSERT INTO clake.db.c4 SELECT id, 'b' FROM range(0, 50)")
    val l = tlog("c4")
    assert(Compaction.compact(spark, l, clusterBy = Seq("k")))
    assert(sql("SELECT count(*), min(k), max(k) FROM clake.db.c4").collect().toSeq ===
      Seq(Row(100L, 0L, 99L)))
    // rows inside the single output file arrive k-ascending
    val dirs = l.currentDirs()
    assert(dirs.size === 1)
    val ks = spark.read.parquet(dirs.head).select("k")
      .collect().map(_.getLong(0)).toSeq
    assert(ks === ks.sorted)
  }

  test("compaction drops committed-empty phantom entries, fails loudly on lost data") {
    sql("CREATE TABLE clake.db.c6 (k BIGINT)")
    sql("INSERT INTO clake.db.c6 VALUES (1), (2)")
    val l = tlog("c6")
    // forge a committed-empty entry whose dir was never created (the shape
    // pre-empty-skip manifests could contain)
    assert(l.tryCommitEntries(l.latestVersion,
      l.currentEntries() :+ DirEntry(l.newDataDir(), Some(DirStats(0, Map.empty)))))
    assert(Compaction.compact(spark, l), "phantom-only cleanup still commits")
    assert(l.currentEntries().size === 1)
    assert(sql("SELECT count(*) FROM clake.db.c6").collect() === Array(Row(2L)))
    // an absent dir whose stats claim ROWS is corruption, not cleanup fodder
    assert(l.tryCommitEntries(l.latestVersion,
      l.currentEntries() :+ DirEntry(l.newDataDir(), Some(DirStats(5, Map.empty)))))
    intercept[IllegalStateException](Compaction.compact(spark, l))
  }

  test("an UPDATE after compaction prunes against the compacted dir's fresh stats") {
    sql("CREATE TABLE clake.db.c5 (k BIGINT, v STRING)")
    sql("INSERT INTO clake.db.c5 SELECT id, 'lo' FROM range(0, 50)")
    sql("INSERT INTO clake.db.c5 SELECT id, 'lo' FROM range(50, 100)")
    sql("INSERT INTO clake.db.c5 SELECT id, 'hi' FROM range(100000, 102000)")
    val l = tlog("c5")
    // merge only the two low-range dirs; the high-range dir stays its own
    // replacement unit
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hiDir = l.currentEntries().last.dir
    val hiBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(hiDir)).getLength
    assert(Compaction.compact(spark, l, smallBytes = hiBytes))
    assert(l.currentEntries().size === 2)
    val before = l.currentEntries().map(_.dir)
    sql("UPDATE clake.db.c5 SET v = 'HIT' WHERE k = 100050")
    val after = l.currentEntries().map(_.dir)
    assert(after.count(before.contains) === 1,
      "the compacted low-range dir must be pruned out of the rewrite")
    assert(sql("SELECT count(*) FROM clake.db.c5 WHERE v = 'HIT'").collect() ===
      Array(Row(1L)))
  }
}
