package graft.connector

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** `graft.write.clusterBy`: appends request a within-partition sort so
  * every written file carries the cluster keys in order (tight row-group
  * stats from the first write).
  */
class WriteClusterSpec extends LakeSpec {
  protected def catalogName = "wclake"

  test("appends to a clustered table write key-ordered files") {
    sql("CREATE NAMESPACE IF NOT EXISTS wclake.db")
    sql("CREATE TABLE wclake.db.c (k BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${GraftTable.WriteClusterByProp}'='k')")
    // shuffled input: id*37 % 1000 permutes 0..999
    sql("INSERT INTO wclake.db.c SELECT (id * 37) % 1000, concat('v', id) " +
      "FROM range(0, 1000)")
    assert(rows("SELECT count(*) c, min(k) mn, max(k) mx FROM wclake.db.c") ===
      Seq(Row(1000L, 0L, 999L)))
    // every written file must hold k in non-decreasing row order
    val dir = log("db/c").currentDirs().head
    val byFile = spark.read.parquet(dir)
      .select(col("_metadata.file_name").as("f"),
        col("_metadata.row_index").as("i"), col("k"))
      .collect().groupBy(_.getString(0))
    assert(byFile.nonEmpty)
    byFile.foreach { case (f, rs) =>
      val ks = rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(ks === ks.sorted, s"file $f not clustered by k")
    }
  }

  test("an unclustered table keeps the input order (no hidden sort)") {
    sql("CREATE TABLE wclake.db.u (k BIGINT)")
    sql("INSERT INTO wclake.db.u SELECT (id * 37) % 1000 FROM range(0, 1000)")
    val dir = log("db/u").currentDirs().head
    val anyUnsorted = spark.read.parquet(dir)
      .select(col("_metadata.file_name").as("f"),
        col("_metadata.row_index").as("i"), col("k"))
      .collect().groupBy(_.getString(0))
      .exists { case (_, rs) =>
        val ks = rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
        ks != ks.sorted
      }
    assert(anyUnsorted, "permuted input should arrive unsorted without clusterBy")
  }

  test("clusterBy referencing an unknown column fails the write loudly") {
    sql("CREATE TABLE wclake.db.b (k BIGINT) " +
      s"TBLPROPERTIES ('${GraftTable.WriteClusterByProp}'='nope')")
    val e = intercept[Exception](sql("INSERT INTO wclake.db.b VALUES (1)"))
    assert(e.getMessage.contains("unknown columns"))
  }
}
