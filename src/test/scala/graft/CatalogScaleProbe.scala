package graft

import org.apache.spark.sql.SparkSession

import graft.connector.{GraftCatalog, TableLog}

/** Catalog rewrite-scaling probe (test scope, like [[ScaleRehearsal]]):
  * measures how MERGE/UPDATE cost grows with table size (dir count) WITH
  * dir-granular group pruning vs WITHOUT (stats stripped from the manifest,
  * reproducing the pre-pruning whole-snapshot rewrite). The claim under
  * test: a pruned single-key rewrite stays ~flat as the table grows, the
  * unpruned one grows linearly. Results land in PLANS.md.
  *
  * Run: `Test/runMain graft.CatalogScaleProbe [dirCounts...]`
  * (default 8 32; each dir holds 25k rows with a disjoint key range).
  */
object CatalogScaleProbe {
  private val RowsPerDir = 25000L

  private def timeMs(f: => Unit): Long = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val dirCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-cat-probe").toString
    spark.conf.set("spark.sql.catalog.probe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.probe.root", root)

    /** Fresh table of `dirs` dirs with disjoint key ranges + manifest stats.
      * Rows carry a ~200-byte random-ish payload so the measurement reflects
      * copy-on-write WRITE amplification — the cost that dominates at real
      * data sizes — not just scan/planning overhead.
      */
    def build(t: String, dirs: Int): TableLog = {
      spark.sql(s"CREATE TABLE probe.$t (k BIGINT, v STRING, pad STRING)")
      (0 until dirs).foreach { i =>
        spark.sql(s"INSERT INTO probe.$t SELECT id, concat('v', id), " +
          "repeat(substr(md5(cast(id AS string)), 1, 25), 8) " +
          s"FROM range(${i * RowsPerDir}, ${(i + 1) * RowsPerDir})")
      }
      val log = new TableLog(s"$root/$t", spark.sparkContext.hadoopConfiguration)
      require(log.currentDirs().size == dirs)
      log
    }
    // drop stats => every dir statless => no pruning (the pre-pruning engine)
    def strip(log: TableLog): Unit =
      require(log.tryCommit(log.latestVersion, log.currentDirs()))

    println(f"${"dirs"}%6s ${"rows"}%9s | ${"upd-pruned"}%10s ${"upd-full"}%9s | ${"mrg-pruned"}%10s ${"mrg-full"}%9s  (ms)")
    dirCounts.foreach { dirs =>
      val lastKey = dirs * RowsPerDir - 5
      def src(): Unit = {
        import spark.implicits._
        Seq((lastKey, "m")).toDF("k", "v").createOrReplaceTempView("probe_src")
      }
      def merge(t: String): Unit = spark.sql(
        s"""MERGE INTO probe.$t t USING probe_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)

      // warm up the rewrite path once per scale so JVM/codegen init is not
      // charged to the first measurement
      build(s"warm$dirs", math.min(dirs, 2))
      spark.sql(s"UPDATE probe.warm$dirs SET v = 'w' WHERE k = 1")
      src()
      merge(s"warm$dirs")
      spark.sql(s"SELECT v FROM probe.warm$dirs WHERE k = 1").collect()

      def pointRead(t: String): Long = timeMs(
        spark.sql(s"SELECT v FROM probe.$t WHERE k = $lastKey").collect())

      build(s"up$dirs", dirs)
      val readPruned = pointRead(s"up$dirs")
      val updPruned = timeMs(spark.sql(
        s"UPDATE probe.up$dirs SET v = 'p' WHERE k = $lastKey"))
      val u2 = build(s"uf$dirs", dirs)
      strip(u2)
      val readFull = pointRead(s"uf$dirs")
      val updFull = timeMs(spark.sql(
        s"UPDATE probe.uf$dirs SET v = 'f' WHERE k = $lastKey"))

      build(s"mp$dirs", dirs)
      src()
      val mrgPruned = timeMs(merge(s"mp$dirs"))
      val m2 = build(s"mf$dirs", dirs)
      strip(m2)
      val mrgFull = timeMs(merge(s"mf$dirs"))

      val rows = dirs * RowsPerDir
      println(f"$dirs%6d $rows%9d | $updPruned%10d $updFull%9d | $mrgPruned%10d $mrgFull%9d | rd $readPruned%5d $readFull%5d")
    }
    spark.stop()
  }
}
