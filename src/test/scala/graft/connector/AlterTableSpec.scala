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
    val typ = intercept[Exception](
      sql("ALTER TABLE altlake.db.r ALTER COLUMN k TYPE INT"))
    assert(typ.getMessage.contains("not supported"))
    val dup = intercept[Exception](
      sql("ALTER TABLE altlake.db.r ADD COLUMNS (V DOUBLE)"))
    assert(dup.getMessage.contains("already exists"))
    val lastCol = intercept[Exception] {
      sql("ALTER TABLE altlake.db.r DROP COLUMN v")
      sql("ALTER TABLE altlake.db.r DROP COLUMN k")
    }
    assert(lastCol.getMessage.contains("last column"))
  }

  // ---- column mapping: RENAME / DROP without rewriting parquet ------------

  test("RENAME COLUMN: old files read under the new name, pushdown works") {
    sql("CREATE TABLE altlake.db.rn (k BIGINT, v STRING)")
    sql("INSERT INTO altlake.db.rn VALUES (1, 'a'), (2, 'b')")   // physical v
    sql("ALTER TABLE altlake.db.rn RENAME COLUMN v TO label")
    assert(sql("SELECT * FROM altlake.db.rn").schema.fieldNames ===
      Array("k", "label"))
    assert(rows("SELECT k, label FROM altlake.db.rn ORDER BY k") ===
      Seq(Row(1L, "a"), Row(2L, "b")))
    // filter pushdown on the renamed column (translated to the physical
    // name for the parquet scan and the dir-stats pruner)
    assert(rows("SELECT k FROM altlake.db.rn WHERE label = 'b'") === Seq(Row(2L)))
    // writes after the rename land under the ORIGINAL physical name and
    // read back mixed with pre-rename files
    sql("INSERT INTO altlake.db.rn VALUES (3, 'c')")
    assert(rows("SELECT label FROM altlake.db.rn WHERE k = 3") === Seq(Row("c")))
    // the parquet files really do carry the physical name, not the logical
    val l = log("db/rn")
    val phys = ColumnMapping.toPhysical(l.schema).fieldNames
    assert(phys === Array("k", "v"), "physical names unchanged by the rename")
    // time travel reads the OLD snapshot under the OLD name
    assert(sql("SELECT * FROM altlake.db.rn VERSION AS OF 1").schema.fieldNames ===
      Array("k", "v"))
    assert(rows("SELECT v FROM altlake.db.rn VERSION AS OF 1 ORDER BY k") ===
      Seq(Row("a"), Row("b")))
  }

  test("DROP COLUMN hides the data; re-ADD of the name reads NULL, not stale bytes") {
    sql("CREATE TABLE altlake.db.dr (k BIGINT, v STRING, x BIGINT)")
    sql("INSERT INTO altlake.db.dr VALUES (1, 'a', 10), (2, 'b', 20)")
    sql("ALTER TABLE altlake.db.dr DROP COLUMN x")
    assert(sql("SELECT * FROM altlake.db.dr").schema.fieldNames === Array("k", "v"))
    assert(rows("SELECT k, v FROM altlake.db.dr ORDER BY k") ===
      Seq(Row(1L, "a"), Row(2L, "b")))
    // re-adding the dropped name maps to a FRESH physical column: the old
    // files' x bytes must read as NULL, never as data
    sql("ALTER TABLE altlake.db.dr ADD COLUMNS (x BIGINT)")
    assert(rows("SELECT k, x FROM altlake.db.dr ORDER BY k") ===
      Seq(Row(1L, null), Row(2L, null)))
    sql("INSERT INTO altlake.db.dr VALUES (3, 'c', 30)")
    assert(rows("SELECT k, x FROM altlake.db.dr ORDER BY k") ===
      Seq(Row(1L, null), Row(2L, null), Row(3L, 30L)))
    // time travel still serves the dropped column from its snapshot
    assert(rows("SELECT x FROM altlake.db.dr VERSION AS OF 1 ORDER BY k") ===
      Seq(Row(10L), Row(20L)))
  }

  test("row-level commands and CDC work across a rename") {
    sql("CREATE TABLE altlake.db.rl (k BIGINT, v BIGINT)")
    sql("INSERT INTO altlake.db.rl SELECT id, 0 FROM range(0, 6)")
    sql("ALTER TABLE altlake.db.rl RENAME COLUMN v TO score")
    sql("UPDATE altlake.db.rl SET score = 9 WHERE k = 2")
    sql("DELETE FROM altlake.db.rl WHERE k = 5")
    sql("MERGE INTO altlake.db.rl t USING (SELECT id k, 7 score FROM range(4, 8)) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET score = s.score " +
      "WHEN NOT MATCHED THEN INSERT *")
    // k=5 was deleted, so the MERGE re-inserts it as NOT MATCHED
    assert(rows("SELECT k, score FROM altlake.db.rl ORDER BY k") ===
      Seq(Row(0L, 0L), Row(1L, 0L), Row(2L, 9L), Row(3L, 0L), Row(4L, 7L),
        Row(5L, 7L), Row(6L, 7L), Row(7L, 7L)))
    // the change feed serves the renamed column too
    val l = log("db/rl")
    val cdf = ChangeFeed.between(spark, l, 0, l.latestVersion.get)
    assert(cdf.schema.fieldNames.take(2) === Array("k", "score"))
    assert(cdf.where("_change_type = 'insert'").count() >= 6)
  }

  test("chained renames (freed name reused) translate simultaneously everywhere") {
    // b -> c, then a -> b: one field's LOGICAL name is now another's
    // PHYSICAL name, so any sequential rename or double translation
    // collides — the review-found failure shape for renameDf and the
    // outer readSchema override
    sql("CREATE TABLE altlake.db.ch (a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO altlake.db.ch VALUES (1, 10), (2, 20), (3, 30)")
    sql("ALTER TABLE altlake.db.ch RENAME COLUMN b TO c")
    sql("ALTER TABLE altlake.db.ch RENAME COLUMN a TO b")
    assert(sql("SELECT * FROM altlake.db.ch").schema.fieldNames === Array("b", "c"))
    assert(rows("SELECT b, c FROM altlake.db.ch ORDER BY b") ===
      Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)))
    // a deletion vector forces the hybrid scan (the double-translation
    // path): schema and values must stay correct
    sql("DELETE FROM altlake.db.ch WHERE b = 2")
    assert(sql("SELECT * FROM altlake.db.ch").schema.fieldNames === Array("b", "c"))
    assert(rows("SELECT b, c FROM altlake.db.ch ORDER BY b") ===
      Seq(Row(1L, 10L), Row(3L, 30L)))
    assert(rows("SELECT c FROM altlake.db.ch WHERE b = 3") === Seq(Row(30L)))
    // compaction's V1 read/write rename must be simultaneous too
    sql("INSERT INTO altlake.db.ch VALUES (4, 40)")
    val l = log("db/ch")
    assert(Compaction.compact(spark, l, smallBytes = 1L << 20, targetBytes = 1L << 20))
    assert(rows("SELECT b, c FROM altlake.db.ch ORDER BY b") ===
      Seq(Row(1L, 10L), Row(3L, 30L), Row(4L, 40L)))
  }

  test("mor row-level commands work on a mapped table") {
    sql("CREATE TABLE altlake.db.rm (k BIGINT, v BIGINT) TBLPROPERTIES " +
      "('graft.delete.mode'='merge-on-read','graft.update.mode'='merge-on-read')")
    sql("INSERT INTO altlake.db.rm SELECT id, 0 FROM range(0, 6)")
    sql("ALTER TABLE altlake.db.rm RENAME COLUMN v TO score")
    sql("DELETE FROM altlake.db.rm WHERE k = 1")
    sql("UPDATE altlake.db.rm SET score = 9 WHERE k = 2")
    assert(rows("SELECT k, score FROM altlake.db.rm ORDER BY k") ===
      Seq(Row(0L, 0L), Row(2L, 9L), Row(3L, 0L), Row(4L, 0L), Row(5L, 0L)))
    // exact update pairs still classify on the mapped table (v4 = the
    // UPDATE; v3 was the DELETE)
    val l = log("db/rm")
    val pairs = ChangeFeed.between(spark, l, 3, 4)
      .select("_change_type", "k", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set(("update_preimage", 2L, 0L), ("update_postimage", 2L, 9L)))
  }

  test("ALTER COLUMN TYPE widens int->long and float->double in place") {
    sql("CREATE TABLE altlake.db.w (k INT, x FLOAT, v STRING)")
    sql("INSERT INTO altlake.db.w VALUES (1, cast(1.5 as float), 'a'), " +
      "(2147483647, cast(2.5 as float), 'b')")
    sql("ALTER TABLE altlake.db.w ALTER COLUMN k TYPE BIGINT")
    sql("ALTER TABLE altlake.db.w ALTER COLUMN x TYPE DOUBLE")
    assert(sql("SELECT * FROM altlake.db.w").schema.map(_.dataType.simpleString) ===
      Seq("bigint", "double", "string"))
    // old int32/float files read under the widened type
    assert(rows("SELECT k, x FROM altlake.db.w ORDER BY k") ===
      Seq(Row(1L, 1.5d), Row(2147483647L, 2.5d)))
    // new writes exceed the old domain; mixed-layout reads and pushdown work
    sql("INSERT INTO altlake.db.w VALUES (9999999999, 9.5, 'c')")
    assert(rows("SELECT k FROM altlake.db.w WHERE k > 2147483647") ===
      Seq(Row(9999999999L)))
    assert(rows("SELECT v FROM altlake.db.w WHERE x = 2.5") === Seq(Row("b")))
    // row-level rewrite across mixed layouts
    sql("UPDATE altlake.db.w SET v = 'z' WHERE k = 1")
    assert(rows("SELECT v FROM altlake.db.w WHERE k = 1") === Seq(Row("z")))
    // compaction merges int32 and int64 files under the widened schema
    assert(Compaction.compact(spark, log("db/w"),
      smallBytes = 1L << 20, targetBytes = 1L << 20))
    assert(rows("SELECT sum(k) s FROM altlake.db.w") ===
      Seq(Row(1L + 2147483647L + 9999999999L)))
    // narrowing and reinterpretation are refused — Spark's analyzer already
    // rejects non-up-casts (NOT_SUPPORTED_CHANGE_COLUMN); the catalog guard
    // covers the up-casts the analyzer would allow but parquet cannot serve
    // losslessly from written bytes (e.g. int -> double)
    def refuses(ddl: String): Unit = {
      val e = intercept[Exception](sql(ddl))
      assert(e.getMessage.contains("widens") ||
        e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), e.getMessage)
    }
    refuses("ALTER TABLE altlake.db.w ALTER COLUMN k TYPE INT")
    refuses("ALTER TABLE altlake.db.w ALTER COLUMN v TYPE BIGINT")
    refuses("ALTER TABLE altlake.db.w ALTER COLUMN k TYPE DOUBLE")
  }

  test("compaction preserves physical names on a mapped table") {
    sql("CREATE TABLE altlake.db.cm (k BIGINT, v BIGINT)")
    sql("INSERT INTO altlake.db.cm VALUES (1, 10)")
    sql("INSERT INTO altlake.db.cm VALUES (2, 20)")
    sql("ALTER TABLE altlake.db.cm RENAME COLUMN v TO amount")
    sql("INSERT INTO altlake.db.cm VALUES (3, 30)")
    val l = log("db/cm")
    assert(Compaction.compact(spark, l, smallBytes = 1L << 20, targetBytes = 1L << 20))
    assert(l.currentDirs().size === 1)
    assert(rows("SELECT k, amount FROM altlake.db.cm ORDER BY k") ===
      Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)))
    // the compacted file carries the PHYSICAL name (v), so later mapped
    // reads keep resolving
    sql("INSERT INTO altlake.db.cm VALUES (4, 40)")
    assert(rows("SELECT amount FROM altlake.db.cm WHERE k = 4") === Seq(Row(40L)))
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

  test("fresh physical names regenerate on collision (forced) and exhaust loudly") {
    // deterministic generator: first candidate collides, second is free
    val tags = Iterator("deadbeef", "c0ffee00")
    val picked = ColumnMapping.freshPhysicalName("x",
      used = Set("col-deadbeef-x"), gen = () => tags.next())
    assert(picked === "col-c0ffee00-x")
    // a generator that can only ever collide fails loudly, not silently
    val e = intercept[IllegalArgumentException](
      ColumnMapping.freshPhysicalName("x", used = Set("col-stuck000-x"),
        gen = () => "stuck000"))
    assert(e.getMessage.contains("fresh physical name"))
  }

  test("every drop/re-add cycle's physical name avoids ALL prior ones") {
    sql("CREATE TABLE altlake.db.pn (k BIGINT, x BIGINT)")
    sql("INSERT INTO altlake.db.pn VALUES (1, 10)")
    val physSeen = scala.collection.mutable.ArrayBuffer[String]("x")
    (0 until 3).foreach { _ =>
      sql("ALTER TABLE altlake.db.pn DROP COLUMN x")
      sql("ALTER TABLE altlake.db.pn ADD COLUMNS (x BIGINT)")
      val f = log("db/pn").schema.fields.find(_.name == "x").get
      physSeen += ColumnMapping.physicalName(f)
    }
    assert(physSeen.distinct.size === physSeen.size,
      s"physical names must never repeat: $physSeen")
    // the avoid-set the generator consulted really contains the history:
    // every prior physical x (including the CREATE-time literal name)
    val used = log("db/pn").usedPhysicalNames()
    physSeen.foreach(p => assert(used.contains(p), s"$p missing from $used"))
  }
}
