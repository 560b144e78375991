package graft.connector
import org.apache.spark.sql.Row

/** RENAME TO semantics: Spark hands the target identifier through
  * verbatim (catalog prefix included), so the catalog strips a redundant
  * prefix, requires the target namespace to exist, and refuses targets
  * nested under a table dir.
  */
class RenameTableSpec extends LakeSpec {
  protected def catalogName = "rnlake"

  test("catalog-qualified rename lands where the user meant") {
    sql("CREATE NAMESPACE rnlake.db")
    sql("CREATE TABLE rnlake.db.a (k BIGINT)")
    sql("INSERT INTO rnlake.db.a VALUES (7)")
    sql("ALTER TABLE rnlake.db.a RENAME TO rnlake.db.b")
    assert(rows("SELECT k FROM rnlake.db.b") === Seq(Row(7L)))
    intercept[Exception](sql("SELECT * FROM rnlake.db.a"))
    // unqualified target works the same
    sql("ALTER TABLE rnlake.db.b RENAME TO db.c")
    assert(rows("SELECT k FROM rnlake.db.c") === Seq(Row(7L)))
  }

  test("rename refuses missing namespaces and table-nested targets") {
    sql("CREATE NAMESPACE IF NOT EXISTS rnlake.db")
    sql("CREATE TABLE rnlake.db.t (k BIGINT)")
    sql("CREATE TABLE rnlake.db.mv (k BIGINT)")
    val nested = intercept[Exception](
      sql("ALTER TABLE rnlake.db.mv RENAME TO rnlake.db.t.sub"))
    assert(nested.getMessage.contains("is a table, not a namespace"))
    val ghost = intercept[Exception](
      sql("ALTER TABLE rnlake.db.mv RENAME TO rnlake.nope.mv2"))
    assert(ghost.getMessage.contains("does not exist"))
    val meta = intercept[Exception](
      sql("ALTER TABLE rnlake.db.mv RENAME TO rnlake.db.t.changes"))
    assert(meta.getMessage.contains("already exists") ||
      meta.getMessage.contains("is a table, not a namespace"))
    // the refused renames moved nothing
    assert(rows("SELECT count(*) c FROM rnlake.db.mv") === Seq(Row(0L)))
  }
}
