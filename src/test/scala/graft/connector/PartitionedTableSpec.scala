package graft.connector

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
import org.apache.spark.sql.sources.EqualTo

/** Identity `PARTITIONED BY` (round-16: the last visible capability gap).
  * A user porting Delta DDL gets their CREATE statement accepted; the
  * partition columns map onto this catalog's native layout — leading
  * write-cluster keys + manifest-stats dir pruning — rather than
  * hive-style value directories (PLANS.md round-16 records why). Pinned
  * here: acceptance and round-trip reporting, pruning on partition
  * predicates, static PARTITION inserts, the write ordering, and the
  * guard rails (derived transforms, unknown/duplicate columns, ALTER of
  * the property, DROP of a partition column — all refused loudly; RENAME
  * follows the column).
  */
class PartitionedTableSpec extends LakeSpec {
  protected def catalogName = "ptlake"

  private lazy val ns: Unit = { super.sql("CREATE NAMESPACE IF NOT EXISTS ptlake.db"); () }
  override protected def sql(q: String): org.apache.spark.sql.DataFrame = { ns; super.sql(q) }

  test("identity PARTITIONED BY is accepted, reported, and round-trips data") {
    sql("CREATE TABLE ptlake.db.docs (id BIGINT, lang STRING, text STRING) PARTITIONED BY (lang)")
    sql("INSERT INTO ptlake.db.docs VALUES (1, 'en', 'hello'), (2, 'fr', 'salut')")
    assert(rows("SELECT id, lang FROM ptlake.db.docs ORDER BY id") ===
      Seq(Row(1L, "en"), Row(2L, "fr")))
    // reported as the identity transform DESCRIBE prints
    val desc = rows("DESCRIBE TABLE ptlake.db.docs").map(r => (r.getString(0), r.getString(1)))
    val pi = desc.indexOf(("# Partition Information", ""))
    assert(pi >= 0 && desc.drop(pi).contains(("lang", "string")),
      s"partitioning missing from $desc")
    // and carried in the table property CREATE derived
    assert(log("db/docs").properties.get(GraftTable.PartitionByProp) === Some("lang"))
  }

  test("partition-column predicates prune whole dirs via the committed stats") {
    sql("CREATE TABLE ptlake.db.pp (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    Seq("aa", "bb", "cc").zipWithIndex.foreach { case (l2, i) =>
      sql(s"INSERT INTO ptlake.db.pp SELECT id + ${i * 100}, '$l2' FROM range(0, 50)")
    }
    val entries = log("db/pp").currentEntries()
    assert(entries.size === 3)
    // exactly one dir can match each partition value — what GraftFileIndex
    // drops before task planning
    assert(entries.count(e =>
      DirStats.mayMatch(e.stats, Seq(EqualTo("lang", "bb")))) === 1)
    assert(rows("SELECT count(*), min(id) FROM ptlake.db.pp WHERE lang = 'bb'") ===
      Seq(Row(50L, 100L)))
  }

  test("static INSERT ... PARTITION resolves against the reported partitioning") {
    sql("CREATE TABLE ptlake.db.sp (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    sql("INSERT INTO ptlake.db.sp PARTITION (lang = 'de') VALUES (7)")
    assert(rows("SELECT id, lang FROM ptlake.db.sp") === Seq(Row(7L, "de")))
  }

  test("appends order by partition columns first, then clusterBy") {
    sql("CREATE TABLE ptlake.db.ord (id BIGINT, lang STRING, score BIGINT) " +
      "PARTITIONED BY (lang) TBLPROPERTIES ('graft.write.clusterBy' = 'score,lang')")
    val l = log("db/ord")
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "spec"
      override def schema(): org.apache.spark.sql.types.StructType = l.schema
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      override def rowIdSchema(): java.util.Optional[org.apache.spark.sql.types.StructType] =
        java.util.Optional.empty()
      override def metadataSchema(): java.util.Optional[org.apache.spark.sql.types.StructType] =
        java.util.Optional.empty()
    }
    val write = new GraftTable("ptlake.db.ord", l).newWriteBuilder(info).build()
    val ordering = write.asInstanceOf[RequiresDistributionAndOrdering]
      .requiredOrdering().map(_.expression().describe()).toSeq
    assert(ordering === Seq("lang", "score"),
      "partition columns must lead and not duplicate into the clusterBy tail")
    // and the ordered write path actually lands rows
    sql("INSERT INTO ptlake.db.ord VALUES (1, 'en', 5), (2, 'fr', 3), (3, 'en', 1)")
    assert(rows("SELECT count(*) FROM ptlake.db.ord WHERE lang = 'en'") === Seq(Row(2L)))
  }

  test("derived transforms, unknown and duplicate columns are refused loudly") {
    val b = intercept[Exception](
      sql("CREATE TABLE ptlake.db.bad1 (id BIGINT, k BIGINT) PARTITIONED BY (bucket(8, k))"))
    assert(b.getMessage.contains("identity transforms"), b.getMessage)
    // Spark's own analysis rejects an unresolvable partition reference
    // before the catalog sees it — either error is fine as long as it is
    // loud and names the column
    val u = intercept[Exception](
      sql("CREATE TABLE ptlake.db.bad2 (id BIGINT) PARTITIONED BY (nope)"))
    assert(u.getMessage.contains("nope"), u.getMessage)
    val d = intercept[Exception](
      sql("CREATE TABLE ptlake.db.bad3 (id BIGINT, lang STRING) PARTITIONED BY (lang, LANG)"))
    assert(d.getMessage.contains("duplicate"), d.getMessage)
  }

  test("the partitioning is immutable through ALTER; RENAME follows the column") {
    sql("CREATE TABLE ptlake.db.alt (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    val set = intercept[Exception](
      sql("ALTER TABLE ptlake.db.alt SET TBLPROPERTIES ('graft.partitionBy' = 'id')"))
    assert(set.getMessage.contains("fixed by CREATE TABLE"), set.getMessage)
    val unset = intercept[Exception](
      sql("ALTER TABLE ptlake.db.alt UNSET TBLPROPERTIES ('graft.partitionBy')"))
    assert(unset.getMessage.contains("fixed by CREATE TABLE"), unset.getMessage)
    val drop = intercept[Exception](
      sql("ALTER TABLE ptlake.db.alt DROP COLUMN lang"))
    assert(drop.getMessage.contains("PARTITIONED BY column"), drop.getMessage)
    sql("INSERT INTO ptlake.db.alt VALUES (1, 'en')")
    sql("ALTER TABLE ptlake.db.alt RENAME COLUMN lang TO language")
    assert(log("db/alt").properties.get(GraftTable.PartitionByProp) === Some("language"))
    sql("INSERT INTO ptlake.db.alt VALUES (2, 'fr')")
    assert(rows("SELECT id FROM ptlake.db.alt WHERE language = 'fr'") === Seq(Row(2L)))
    val desc = rows("DESCRIBE TABLE ptlake.db.alt").map(r => (r.getString(0), r.getString(1)))
    val pi = desc.indexOf(("# Partition Information", ""))
    assert(pi >= 0 && desc.drop(pi).contains(("language", "string")),
      s"rename not reflected in $desc")
  }

  test("partition-scoped INSERT OVERWRITE works on partition-aligned dirs") {
    sql("CREATE TABLE ptlake.db.ow (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    sql("INSERT INTO ptlake.db.ow VALUES (1, 'en')")
    sql("INSERT INTO ptlake.db.ow VALUES (2, 'fr')")
    // every dir is single-partition (one INSERT each), so stats prove each
    // dir all-in or all-out of lang='en': drop the en dir, keep fr, commit
    // the replacement — the round-16 refusal upgraded to dir-granular
    // filter overwrite
    sql("INSERT OVERWRITE ptlake.db.ow PARTITION (lang = 'en') VALUES (10)")
    assert(rows("SELECT id, lang FROM ptlake.db.ow ORDER BY id") ===
      Seq(Row(2L, "fr"), Row(10L, "en")))
    // overwriting a partition with NO new rows just drops it
    sql("INSERT OVERWRITE ptlake.db.ow PARTITION (lang = 'en') " +
      "SELECT id FROM range(0) ")
    assert(rows("SELECT id, lang FROM ptlake.db.ow") === Seq(Row(2L, "fr")))
    sql("INSERT OVERWRITE ptlake.db.ow VALUES (3, 'de')")
    assert(rows("SELECT id, lang FROM ptlake.db.ow") === Seq(Row(3L, "de")))
  }

  test("filter overwrite over an UNDECIDABLE dir fails loudly with the recipe") {
    sql("CREATE TABLE ptlake.db.owmix (id BIGINT, lang STRING)")   // unpartitioned
    sql("INSERT INTO ptlake.db.owmix VALUES (1, 'en'), (2, 'fr')") // one MIXED dir
    val e = intercept[Exception](
      sql("INSERT INTO ptlake.db.owmix REPLACE WHERE lang = 'en' " +
        "SELECT 10, 'en'"))
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    // Spark may route the V2 overwrite differently per shape; accept either
    // our loud dir-granularity error or Spark's own unsupported-overwrite
    assert(msgs(e).contains("PROVABLY") || msgs(e).contains("overwrite"),
      s"got: ${msgs(e)}")
    assert(rows("SELECT count(*) c FROM ptlake.db.owmix") === Seq(Row(2L)),
      "the refused overwrite must not have changed the table")
  }

  test("setting the property directly at CREATE is refused (one spelling)") {
    val e = intercept[Exception](
      sql("CREATE TABLE ptlake.db.sprop (id BIGINT, lang STRING) " +
        "TBLPROPERTIES ('graft.partitionBy' = 'lang')"))
    assert(e.getMessage.contains("PARTITIONED BY"), e.getMessage)
  }
}
