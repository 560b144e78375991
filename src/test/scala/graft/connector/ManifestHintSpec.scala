package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row

/** The `_latest` manifest hint ([[TableLog.latestVersion]]): commit keeps
  * it fresh, readers heal a stale or garbled hint, and resolution never
  * depends on it — the listing fallback and the hint must always agree.
  */
class ManifestHintSpec extends LakeSpec {
  protected def catalogName = "hintlake"

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("commits maintain the hint; hint and listing agree") {
    sql("CREATE NAMESPACE IF NOT EXISTS hintlake.db")
    sql("CREATE TABLE hintlake.db.h (k BIGINT)")
    (1 to 5).foreach(i => sql(s"INSERT INTO hintlake.db.h VALUES ($i)"))
    val l = log("db/h")
    assert(l.latestVersion === Some(5L))
    assert(l.listedLatestVersion === Some(5L))
    assert(fs.exists(new Path(s"$root/db/h/_latest")), "hint file written")
  }

  test("a stale-low hint heals by probing forward") {
    sql("CREATE TABLE hintlake.db.s (k BIGINT)")
    (1 to 4).foreach(i => sql(s"INSERT INTO hintlake.db.s VALUES ($i)"))
    val hint = new Path(s"$root/db/s/_latest")
    val out = fs.create(hint, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    assert(log("db/s").latestVersion === Some(4L))
  }

  test("a garbled hint falls back to the listing") {
    sql("CREATE TABLE hintlake.db.g (k BIGINT)")
    sql("INSERT INTO hintlake.db.g VALUES (1)")
    val hint = new Path(s"$root/db/g/_latest")
    val out = fs.create(hint, true)
    try out.write("not-a-number".getBytes("UTF-8")) finally out.close()
    assert(log("db/g").latestVersion === Some(1L))
    // a hint naming a nonexistent version also falls back
    val out2 = fs.create(hint, true)
    try out2.write("99".getBytes("UTF-8")) finally out2.close()
    assert(log("db/g").latestVersion === Some(1L))
  }

  test("vacuum leaves the hint valid and reads still resolve") {
    sql("CREATE TABLE hintlake.db.v (k BIGINT)")
    (1 to 6).foreach(i => sql(s"INSERT INTO hintlake.db.v VALUES ($i)"))
    log("db/v").vacuum(keepVersions = 2)
    assert(log("db/v").latestVersion === Some(6L))
    assert(rows("SELECT count(*) c FROM hintlake.db.v") === Seq(Row(6L)))
  }
}
