package graft.connector

import org.apache.spark.sql.Row

/** SQL maintenance procedures (`CALL lake.system.optimize/vacuum`) via
  * Spark 4.1's ProcedureCatalog.
  */
class ProcedureSpec extends LakeSpec {
  protected def catalogName = "prlake"

  test("CALL optimize compacts small dirs and reports the swap") {
    sql("CREATE NAMESPACE IF NOT EXISTS prlake.db")
    sql("CREATE TABLE prlake.db.t (k BIGINT, v STRING)")
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO prlake.db.t SELECT id, concat('v', id) " +
        s"FROM range(${i * 100}, ${(i + 1) * 100})"))
    val r = rows("CALL prlake.system.optimize(`table` => 'db.t')")
    assert(r === Seq(Row(true, 4, 1)))
    assert(rows("SELECT count(*) c, min(k) mn, max(k) mx FROM prlake.db.t") ===
      Seq(Row(400L, 0L, 399L)))
    // nothing left to do -> compacted = false, dirs unchanged
    assert(rows("CALL prlake.system.optimize(`table` => 'db.t')") ===
      Seq(Row(false, 1, 1)))
  }

  test("CALL optimize with zorder_by lays out tiles") {
    sql("CREATE TABLE prlake.db.z (x BIGINT, y BIGINT)")
    (0 until 3).foreach(i =>
      sql(s"INSERT INTO prlake.db.z SELECT id % 100, id DIV 100 " +
        s"FROM range(${i * 300}, ${(i + 1) * 300})"))
    val r = rows("CALL prlake.system.optimize(`table` => 'db.z', zorder_by => 'x,y')")
    assert(r.head.getBoolean(0))
    assert(rows("SELECT count(*) c FROM prlake.db.z") === Seq(Row(900L)))
  }

  test("CALL vacuum drops old manifests and reclaims dirs") {
    sql("CREATE TABLE prlake.db.v (k BIGINT)")
    sql("INSERT INTO prlake.db.v VALUES (1)")
    sql("INSERT INTO prlake.db.v VALUES (2)")
    sql("INSERT INTO prlake.db.v VALUES (3)")
    sql("CALL prlake.system.optimize(`table` => 'db.v')")   // v4: 3 dirs -> 1
    val r = rows("CALL prlake.system.vacuum(`table` => 'db.v', keep_versions => 1)")
    assert(r === Seq(Row(3, 3)), s"3 manifests dropped, 3 superseded dirs: $r")
    assert(rows("SELECT count(*) c FROM prlake.db.v") === Seq(Row(3L)))
    intercept[Exception](rows("SELECT * FROM prlake.db.v VERSION AS OF 1"))
  }

  test("SHOW / DESCRIBE PROCEDURE and bad calls") {
    val shown = sql("SHOW PROCEDURES IN prlake.system")
    val nameIdx = shown.schema.fieldIndex("procedure_name")
    assert(shown.collect().map(_.getString(nameIdx)).toSet ===
      Set("optimize", "vacuum", "restore", "export_delta", "import_delta",
        "refresh_delta"))
    assert(sql("DESCRIBE PROCEDURE prlake.system.optimize").collect()
      .mkString.contains("optimize"))
    // an unknown procedure is an analysis-time 'not found' — the catalog
    // raises Spark's ROUTINE_NOT_FOUND condition (sqlState 42883), which
    // propagates unwrapped (a RuntimeException would get swallowed into a
    // generic FAILED_TO_LOAD_ROUTINE internal-failure shape)
    val missing = intercept[org.apache.spark.sql.AnalysisException](
      sql("CALL prlake.system.nope()"))
    assert(missing.getCondition === "ROUTINE_NOT_FOUND")
    assert(missing.getMessage.contains("nope"))
    val noTable = intercept[Exception](
      rows("CALL prlake.system.optimize(`table` => 'db.ghost')"))
    assert(noTable.getMessage.contains("no such table"))
  }
}
