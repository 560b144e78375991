package graft

import org.apache.spark.sql.SparkSession

import graft.connector.{GraftCatalog, TableLog}

/** Change-data-feed scaling probe (test scope): how does reading
  * `db.t.changes` grow with HISTORY LENGTH? Two claims under test, both
  * from the ChangeFeed/ChangeTable docstrings:
  *  - a full-history replay grows ~linearly in the DATA it emits (the
  *    driver walk is one manifest read per version, the scan count is
  *    constant per commit kind per version — never quadratic);
  *  - the incremental tail (changes of just the newest version) stays
  *    ~FLAT as history grows — the cost a CDC stream actually pays per
  *    micro-batch.
  *
  * Each version appends `RowsPerVersion` rows; every 8th version is a
  * merge-on-read DELETE (vector growth), so the probe exercises the
  * insert and the newly-deleted read paths.
  *
  * Run: `Test/runMain graft.CdfScaleProbe [versionCounts...]`
  * (default 16 64 256). Results land in PLANS.md.
  */
object CdfScaleProbe {
  private val RowsPerVersion = 5000L

  private def timeMs(f: => Unit): Long = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val versionCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 256)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-probe").toString
    spark.conf.set("spark.sql.catalog.cdfprobe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfprobe.root", root)

    // tail-del: changes of the final version, a mor DELETE whose vector
    // touches EVERY dir — cost is data-proportional by construction (the
    // newly-deleted rows live everywhere), so it grows with table size.
    // tail-app: changes of one appended version — the stream steady state
    // — which must stay ~flat however long the history is.
    println(f"${"versions"}%8s ${"changes"}%9s | ${"replay-ms"}%9s ${"ms/1k-chg"}%9s | ${"tail-del"}%8s ${"tail-app"}%8s")
    versionCounts.foreach { nv =>
      val t = s"t$nv"
      spark.sql(s"CREATE TABLE cdfprobe.$t (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
      var nextKey = 0L
      (1 to nv).foreach { i =>
        if (i % 8 == 0) {
          // a modulo predicate is not stats-decidable -> vector growth
          spark.sql(s"DELETE FROM cdfprobe.$t WHERE k % 97 = ${i % 97}")
        } else {
          spark.sql(s"INSERT INTO cdfprobe.$t SELECT id, concat('v', id) " +
            s"FROM range($nextKey, ${nextKey + RowsPerVersion})")
          nextKey += RowsPerVersion
        }
      }
      val log = new TableLog(s"$root/$t", spark.sparkContext.hadoopConfiguration)
      val latest = log.latestVersion.get
      var changes = 0L
      val replayMs = timeMs {
        changes = spark.read.table(s"cdfprobe.$t.changes").count()
      }
      // warm tail once (plan/codegen), then measure — a stream's steady
      // state is warm by definition
      spark.read.option("startVersion", (latest - 1).toString)
        .table(s"cdfprobe.$t.changes").count()
      val tailMs = timeMs {
        spark.read.option("startVersion", (latest - 1).toString)
          .table(s"cdfprobe.$t.changes").count()
      }
      spark.sql(s"INSERT INTO cdfprobe.$t SELECT id, concat('v', id) " +
        s"FROM range($nextKey, ${nextKey + RowsPerVersion})")
      val tailAppMs = timeMs {
        spark.read.option("startVersion", latest.toString)
          .table(s"cdfprobe.$t.changes").count()
      }
      val per1k = if (changes > 0) replayMs * 1000.0 / changes else 0.0
      println(f"$nv%8d $changes%9d | $replayMs%9d $per1k%9.1f | $tailMs%8d $tailAppMs%8d")
    }
    spark.stop()
  }
}
