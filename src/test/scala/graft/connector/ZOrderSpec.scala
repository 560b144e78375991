package graft.connector

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.EqualTo

/** Z-order compaction: tiles become individual manifest dirs whose
  * committed stats prune on EVERY z column, where a linear clusterBy only
  * serves its leading column; rows are preserved verbatim and vacuum
  * keeps the promoted tile dirs alive.
  */
class ZOrderSpec extends LakeSpec {
  protected def catalogName = "zlake"

  private def seedGrid(t: String): Unit = {
    sql(s"CREATE TABLE zlake.db.$t (x BIGINT, y BIGINT, payload STRING)")
    // a 100x100 grid scattered hash-wise over 4 dirs: every dir covers the
    // FULL x and y ranges, so pre-compaction stats prune nothing
    (0 until 4).foreach { i =>
      sql(s"""INSERT INTO zlake.db.$t
             |SELECT id % 100, id DIV 100, repeat('p', 20)
             |FROM range(0, 10000) WHERE pmod(hash(id), 4) = $i""".stripMargin)
    }
  }

  private def survivors(t: String, col: String, v: Long): Int = {
    val entries = log(s"db/$t").currentEntries()
    entries.count(e => DirStats.mayMatch(e.stats, Seq(EqualTo(col, v))))
  }

  test("z-order tiles prune on both columns; linear clusterBy only on the first") {
    sql("CREATE NAMESPACE IF NOT EXISTS zlake.db")
    seedGrid("zt")
    seedGrid("lin")
    assert(Compaction.compact(spark, log("db/zt"), targetBytes = 4L << 10,
      zorderBy = Seq("x", "y")))
    assert(Compaction.compact(spark, log("db/lin"), targetBytes = 4L << 10,
      clusterBy = Seq("x")))
    // same rows under both layouts
    for (t <- Seq("zt", "lin")) {
      assert(rows(s"SELECT count(*) c, sum(x) sx, sum(y) sy FROM zlake.db.$t") ===
        Seq(Row(10000L, (0L until 10000L).map(_ % 100).sum,
          (0L until 10000L).map(_ / 100).sum)))
    }
    val zTiles = log("db/zt").currentEntries().size
    assert(zTiles >= 4, s"expected several z tiles, got $zTiles")
    // dir-granular pruning via the committed stats (exactly what
    // GraftFileIndex consults): z-order must prune on BOTH columns
    assert(survivors("zt", "x", 3L) < zTiles)
    assert(survivors("zt", "y", 97L) < zTiles)
    // the linear layout's non-leading column cannot prune (every dir
    // covers the full y range)
    val linDirs = log("db/lin").currentEntries().size
    assert(survivors("lin", "y", 97L) === linDirs)
    // point query correctness through the pruned read path
    assert(rows("SELECT payload FROM zlake.db.zt WHERE x = 3 AND y = 97") ===
      Seq(Row("p" * 20)))
  }

  test("vacuum keeps promoted tile dirs; history stays consistent") {
    seedGrid("zv")
    assert(Compaction.compact(spark, log("db/zv"), targetBytes = 4L << 10,
      zorderBy = Seq("x", "y")))
    val l = log("db/zv")
    l.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(rows("SELECT count(*) c FROM zlake.db.zv") === Seq(Row(10000L)))
    assert(l.history().head.liveRows === Some(10000L))
  }

  test("zorderBy validates column types and reserved names up front") {
    sql("CREATE TABLE zlake.db.zbad (x BIGINT, s STRING)")
    sql("INSERT INTO zlake.db.zbad VALUES (1, 'a')")
    sql("INSERT INTO zlake.db.zbad VALUES (2, 'b')")   // 2 dirs: rewrite proceeds to layout
    val ty = intercept[IllegalArgumentException](
      Compaction.compact(spark, log("db/zbad"), zorderBy = Seq("s")))
    assert(ty.getMessage.contains("unsupported type"))
    val missing = intercept[IllegalArgumentException](
      Compaction.compact(spark, log("db/zbad"), zorderBy = Seq("nope")))
    assert(missing.getMessage.contains("not in"))
  }

  test("zorderBy refuses to combine with clusterBy") {
    seedGrid("zr")
    intercept[IllegalArgumentException](
      Compaction.compact(spark, log("db/zr"),
        clusterBy = Seq("x"), zorderBy = Seq("y")))
  }
}
