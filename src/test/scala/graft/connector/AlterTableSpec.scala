package graft.connector

import org.apache.spark.sql.Row

/** Schema evolution (the additive subset): ALTER TABLE ADD COLUMNS and
  * SET/UNSET TBLPROPERTIES, versioned through the manifest meta header —
  * old dirs read new columns as NULL, time travel reads each snapshot
  * under its own schema, and unsafe alters are refused.
  */
class AlterTableSpec extends LakeSpec {
  protected def catalogName = "altlake"

  test("ADD COLUMNS: old rows read NULL, new writes carry values") {
    sql("CREATE NAMESPACE IF NOT EXISTS altlake.db")
    sql("CREATE TABLE altlake.db.a (k BIGINT, v STRING)")
    sql("INSERT INTO altlake.db.a VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE altlake.db.a ADD COLUMNS (score DOUBLE)")
    assert(rows("SELECT k, v, score FROM altlake.db.a ORDER BY k") ===
      Seq(Row(1L, "a", null), Row(2L, "b", null)))
    sql("INSERT INTO altlake.db.a VALUES (3, 'c', 0.5)")
    assert(rows("SELECT k, score FROM altlake.db.a ORDER BY k") ===
      Seq(Row(1L, null), Row(2L, null), Row(3L, 0.5)))
    // filters across the mixed-layout dirs
    assert(rows("SELECT k FROM altlake.db.a WHERE score IS NULL ORDER BY k") ===
      Seq(Row(1L), Row(2L)))
    assert(rows("SELECT k FROM altlake.db.a WHERE score > 0") === Seq(Row(3L)))
  }

  test("time travel reads each snapshot under its own schema") {
    sql("CREATE TABLE altlake.db.tt (k BIGINT)")
    sql("INSERT INTO altlake.db.tt VALUES (1)")        // v1
    sql("ALTER TABLE altlake.db.tt ADD COLUMNS (tag STRING)")  // v2
    sql("INSERT INTO altlake.db.tt VALUES (2, 't')")   // v3
    assert(sql("SELECT * FROM altlake.db.tt VERSION AS OF 1").schema.fieldNames
      === Array("k"))
    assert(sql("SELECT * FROM altlake.db.tt").schema.fieldNames
      === Array("k", "tag"))
    assert(rows("SELECT * FROM altlake.db.tt VERSION AS OF 1") === Seq(Row(1L)))
    assert(rows("SELECT k, tag FROM altlake.db.tt ORDER BY k") ===
      Seq(Row(1L, null), Row(2L, "t")))
  }

  test("later commits carry the evolved meta forward") {
    sql("CREATE TABLE altlake.db.f (k BIGINT)")
    sql("ALTER TABLE altlake.db.f ADD COLUMNS (x BIGINT)")
    sql("INSERT INTO altlake.db.f VALUES (1, 10)")
    sql("INSERT INTO altlake.db.f VALUES (2, 20)")
    val l = log("db/f")
    // the newest manifest (an ordinary append) still resolves the schema
    assert(l.metaAt(l.latestVersion.get)._1.fieldNames === Array("k", "x"))
    assert(rows("SELECT sum(x) s FROM altlake.db.f") === Seq(Row(30L)))
  }

  test("unsafe alters are refused") {
    sql("CREATE TABLE altlake.db.r (k BIGINT, v STRING)")
    val nn = intercept[Exception](
      sql("ALTER TABLE altlake.db.r ADD COLUMNS (c STRING NOT NULL)"))
    assert(nn.getMessage.contains("nullable"))
    val drop = intercept[Exception](sql("ALTER TABLE altlake.db.r DROP COLUMN v"))
    assert(drop.getMessage.contains("not supported"))
    val ren = intercept[Exception](
      sql("ALTER TABLE altlake.db.r RENAME COLUMN v TO w"))
    assert(ren.getMessage.contains("not supported"))
    val dup = intercept[Exception](
      sql("ALTER TABLE altlake.db.r ADD COLUMNS (V DOUBLE)"))
    assert(dup.getMessage.contains("already exists"))
  }

  test("SET TBLPROPERTIES flips delete mode to merge-on-read") {
    sql("CREATE TABLE altlake.db.p (k BIGINT)")
    sql("INSERT INTO altlake.db.p SELECT id FROM range(0, 100)")
    sql("DELETE FROM altlake.db.p WHERE k < 10")   // copy-on-write: dir replaced
    assert(log("db/p").currentEntries().forall(_.dv.isEmpty))
    sql("ALTER TABLE altlake.db.p SET TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    val dirsBefore = log("db/p").currentDirs()
    sql("DELETE FROM altlake.db.p WHERE k < 20")   // now merge-on-read
    val entries = log("db/p").currentEntries()
    assert(entries.map(_.dir) === dirsBefore, "mor delete must keep the dirs")
    assert(entries.exists(_.dv.isDefined))
    assert(rows("SELECT count(*) c, min(k) mn FROM altlake.db.p") === Seq(Row(80L, 20L)))
  }

  test("count(*) on a vectored table pads with a column older files may lack") {
    sql("CREATE TABLE altlake.db.cnt (pad STRING, k BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO altlake.db.cnt SELECT 'x', id FROM range(0, 30)")
    // the narrowest numeric pad column is the EVOLVED one, absent from the
    // dir above — the reader null-fills it from footer counts and the
    // row-index vector must still generate for the vector subtraction
    sql("ALTER TABLE altlake.db.cnt ADD COLUMNS (tiny INT)")
    sql("INSERT INTO altlake.db.cnt SELECT 'y', id, 1 FROM range(100, 130)")
    sql("DELETE FROM altlake.db.cnt WHERE k < 5 OR k >= 125")
    assert(rows("SELECT count(*) c FROM altlake.db.cnt") === Seq(Row(50L)))
  }

  test("compaction merges mixed-schema dirs under the latest schema") {
    sql("CREATE TABLE altlake.db.c (k BIGINT)")
    sql("INSERT INTO altlake.db.c VALUES (1)")
    sql("ALTER TABLE altlake.db.c ADD COLUMNS (v STRING)")
    sql("INSERT INTO altlake.db.c VALUES (2, 'b')")
    assert(Compaction.compact(spark, log("db/c")))
    assert(log("db/c").currentEntries().size === 1)
    assert(rows("SELECT k, v FROM altlake.db.c ORDER BY k") ===
      Seq(Row(1L, null), Row(2L, "b")))
  }
}
