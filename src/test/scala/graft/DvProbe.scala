package graft

import org.apache.spark.sql.SparkSession

import graft.connector.{Compaction, GraftCatalog, TableLog}

/** Merge-on-read vs copy-on-write probe (test scope, like
  * [[CatalogScaleProbe]]): on identical tables, measures (a) the cost of a
  * point DELETE under each mode, (b) the full-scan read cost before /
  * after deletes (the vectored row-based read tax), and (c) the cost and
  * effect of compaction purging the vectors. The claims under test: a
  * point delete is far cheaper merge-on-read (kilobyte vector vs dir
  * rewrite, and the gap widens with dir size), while vectored reads pay a
  * bounded row-based penalty until purge restores the columnar path.
  * Results land in PLANS.md.
  *
  * Run: `Test/runMain graft.DvProbe [rowsPerDir...]` (default 100000
  * 400000; 4 dirs each, ~230-byte padded rows).
  */
object DvProbe {

  private def timeMs(f: => Unit): Long = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(100000L, 400000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-dv-probe").toString
    spark.conf.set("spark.sql.catalog.dvp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvp.root", root)
    val Dirs = 4

    def build(t: String, rowsPerDir: Long, mor: Boolean): TableLog = {
      val props = if (mor) " TBLPROPERTIES ('graft.delete.mode'='merge-on-read')" else ""
      spark.sql(s"CREATE TABLE dvp.$t (k BIGINT, v STRING, pad STRING)$props")
      (0 until Dirs).foreach { i =>
        spark.sql(s"INSERT INTO dvp.$t SELECT id, concat('v', id), " +
          "repeat(substr(md5(cast(id AS string)), 1, 25), 8) " +
          s"FROM range(${i * rowsPerDir}, ${(i + 1) * rowsPerDir})")
      }
      new TableLog(s"$root/$t", spark.sparkContext.hadoopConfiguration)
    }

    def scanMs(t: String): Long =
      timeMs(spark.sql(s"SELECT sum(k) s FROM dvp.$t WHERE pad IS NOT NULL").collect())

    println(f"${"rows/dir"}%9s | ${"del-cow"}%8s ${"del-mor"}%8s | ${"pt-cow"}%9s ${"pt-mor"}%9s | ${"scan-clean"}%10s ${"scan-dv"}%8s | ${"purge"}%6s ${"scan-purged"}%11s  (ms)")
    sizes.foreach { rowsPerDir =>
      val cow = build(s"cow_$rowsPerDir", rowsPerDir, mor = false)
      val mor = build(s"mor_$rowsPerDir", rowsPerDir, mor = true)
      val total = Dirs * rowsPerDir
      // warm the scans once (JVM/codegen)
      scanMs(s"cow_$rowsPerDir"); scanMs(s"mor_$rowsPerDir")
      val scanClean = scanMs(s"mor_$rowsPerDir")
      // a point delete: 10 scattered rows, one per 10% stride in one dir
      def cond = s"k % ${rowsPerDir / 10} = 7 AND k < $rowsPerDir"
      val delCow = timeMs(spark.sql(s"DELETE FROM dvp.cow_$rowsPerDir WHERE $cond"))
      val delMor = timeMs(spark.sql(s"DELETE FROM dvp.mor_$rowsPerDir WHERE $cond"))
      val scanDv = scanMs(s"mor_$rowsPerDir")
      // a TRUE point delete (pushed equality, row-group-prunable) in an
      // untouched dir: the merge-on-read scan reads ~one row group, the
      // copy-on-write path still rewrites the whole matched dir
      val pk = 3 * rowsPerDir + 17
      val delCowPt = timeMs(spark.sql(s"DELETE FROM dvp.cow_$rowsPerDir WHERE k = $pk"))
      val delMorPt = timeMs(spark.sql(s"DELETE FROM dvp.mor_$rowsPerDir WHERE k = $pk"))
      val purge = timeMs(Compaction.compact(spark, mor, smallBytes = 0L,
        purgeDeletedFraction = 0.0))
      val scanPurged = scanMs(s"mor_$rowsPerDir")
      val cowRows = spark.sql(s"SELECT count(*) c FROM dvp.cow_$rowsPerDir").collect()(0).getLong(0)
      val morRows = spark.sql(s"SELECT count(*) c FROM dvp.mor_$rowsPerDir").collect()(0).getLong(0)
      require(cowRows == morRows && cowRows == total - 11,
        s"modes disagree: cow=$cowRows mor=$morRows expected ${total - 11}")
      println(f"$rowsPerDir%9d | $delCow%8d $delMor%8d | $delCowPt%9d $delMorPt%9d | $scanClean%10d $scanDv%8d | $purge%6d $scanPurged%11d")
    }
    spark.stop()
  }
}
