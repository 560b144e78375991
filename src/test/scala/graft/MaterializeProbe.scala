package graft

import org.apache.spark.sql.SparkSession

import graft.connector.GraftCatalog

/** Materialized-CDF cost probe (test scope): what does a MERGE pay in each
  * of the three row-level modes as the TABLE grows, with the command's
  * footprint held proportional? Claims under test (GraftMorDelete /
  * SURVEY §19):
  *  - `materialize` ~= cow on wall time at equal dir footprint — the same
  *    per-touched-dir rewrite I/O, just reached through the delta plan
  *    plus a few-KB vector write per dir;
  *  - `merge-on-read` stays the cheapest write (no rewrite) — the
  *    read-side tax it trades for is not measured here;
  *  - all three grow ~linearly in touched data (exponent ~<= 1 across the
  *    size ladder), because the rewrite unit is one dir.
  *
  * Each size seeds D dirs of `RowsPerDir` rows; the MERGE updates 10% and
  * inserts 5% of the keys, touching every dir (uniform key spread — the
  * worst case for rewrite modes, the fairest for comparing them).
  *
  * Run: `Test/runMain graft.MaterializeProbe [dirCounts...]`
  * (default 2 8 32). Results land in PLANS.md.
  */
object MaterializeProbe {
  private val RowsPerDir = 25000L

  private def timeMs(f: => Unit): Long = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val dirCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 8, 32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-mz-probe").toString
    spark.conf.set("spark.sql.catalog.mzprobe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mzprobe.root", root)

    println(f"${"dirs"}%5s ${"rows"}%9s | ${"cow-ms"}%7s ${"mor-ms"}%7s ${"mat-ms"}%7s | mat change rows")
    dirCounts.foreach { d =>
      val n = d * RowsPerDir
      val times = Seq("copy-on-write", "merge-on-read", "materialize").map { mode =>
        val t = s"t${d}_${mode.take(3)}"
        spark.sql(s"CREATE TABLE mzprobe.$t (k BIGINT, v BIGINT) " +
          s"TBLPROPERTIES ('graft.merge.mode'='$mode')")
        (0 until d).foreach(i =>
          spark.sql(s"INSERT INTO mzprobe.$t SELECT id, 0 FROM " +
            s"range(${i * RowsPerDir}, ${(i + 1) * RowsPerDir})"))
        // update 10% (k % 10 = 0) + insert 5% (beyond the key space):
        // uniform spread touches every dir
        val ms = timeMs(spark.sql(
          s"MERGE INTO mzprobe.$t t USING (SELECT id * 10 AS k, 9 AS v " +
            s"FROM range(0, ${n / 10 + n / 20}) ) s " +
            "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
            "WHEN NOT MATCHED THEN INSERT *"))
        val rows = spark.sql(s"SELECT count(*) FROM mzprobe.$t").head().getLong(0)
        require(rows > n, s"$mode MERGE lost rows: $rows of > $n")
        mode -> ms
      }.toMap
      // the materialized version's change rows = exactly its churn-free feed
      val tm = s"t${d}_mat"
      val log = new graft.connector.TableLog(s"$root/$tm",
        spark.sparkContext.hadoopConfiguration)
      val changes = graft.connector.ChangeFeed.between(spark, log,
        log.latestVersion.get - 1, log.latestVersion.get).count()
      println(f"$d%5d $n%9d | ${times("copy-on-write")}%7d ${times("merge-on-read")}%7d " +
        f"${times("materialize")}%7d | $changes")
    }
    spark.stop()
  }
}
