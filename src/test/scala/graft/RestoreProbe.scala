package graft

import org.apache.spark.sql.SparkSession

import graft.connector.GraftCatalog

/** RESTORE cost probe (test scope): what does `CALL system.restore` pay as
  * the table grows, in its two regimes? Claims under test
  * (connector/Procedures.scala RestoreProcedure / SURVEY §20):
  *  - PASS-THROUGH restore (no surviving dir's vector differs — e.g. the
  *    rolled-back commit only ADDED dirs) is metadata-only: one manifest
  *    write, cost ~flat in table size;
  *  - CONFLICT restore (every dir survives at the head with a GROWN
  *    vector — rolling back a table-wide mor DELETE) rewrites the
  *    conflicting dirs in ONE combined Spark job, so cost grows ~linearly
  *    in conflicting data with no per-dir serial driver tail.
  *
  * Each size seeds D dirs of `RowsPerDir` rows, mor-deletes 10% (v2 —
  * vectors on every dir), mor-deletes another 10% (v3 — every vector
  * grows), then measures restore(v3 -> v2) [conflict on every dir] and,
  * from a fresh insert-only head, restore past a pure INSERT
  * [pass-through].
  *
  * Run: `Test/runMain graft.RestoreProbe [dirCounts...]`
  * (default 8 32 128). Results land in PLANS.md.
  */
object RestoreProbe {
  private val RowsPerDir = 25000L

  private def timeMs(f: => Unit): Long = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val dirCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32, 128)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-rst-probe").toString
    spark.conf.set("spark.sql.catalog.rstprobe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rstprobe.root", root)

    println(f"${"dirs"}%5s ${"rows"}%9s | ${"passthrough-ms"}%14s ${"conflict-ms"}%11s")
    dirCounts.foreach { d =>
      val n = d * RowsPerDir

      // ---- conflict regime: every dir's vector grew past the target ----
      val tc = s"c$d"
      spark.sql(s"CREATE TABLE rstprobe.$tc (k BIGINT) " +
        "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
      (0 until d).foreach(i =>
        spark.sql(s"INSERT INTO rstprobe.$tc SELECT id FROM " +
          s"range(${i * RowsPerDir}, ${(i + 1) * RowsPerDir})"))        // v1..vD
      spark.sql(s"DELETE FROM rstprobe.$tc WHERE k % 10 = 0")           // vD+1
      spark.sql(s"DELETE FROM rstprobe.$tc WHERE k % 10 = 1")           // vD+2
      val target = d + 1L
      val conflictMs = timeMs(spark.sql(
        s"CALL rstprobe.system.restore(`table` => '$tc', version => $target)"))
      val live = spark.sql(s"SELECT count(*) FROM rstprobe.$tc").head().getLong(0)
      require(live == n - n / 10,
        s"conflict restore wrong: $live live of $n (expected ${n - n / 10})")

      // ---- pass-through regime: the rolled-back commit only added a dir ----
      val tp = s"p$d"
      spark.sql(s"CREATE TABLE rstprobe.$tp (k BIGINT)")
      (0 until d).foreach(i =>
        spark.sql(s"INSERT INTO rstprobe.$tp SELECT id FROM " +
          s"range(${i * RowsPerDir}, ${(i + 1) * RowsPerDir})"))        // v1..vD
      spark.sql(s"INSERT INTO rstprobe.$tp SELECT id FROM range(0, 100)")  // vD+1
      val passMs = timeMs(spark.sql(
        s"CALL rstprobe.system.restore(`table` => '$tp', version => $d)"))
      val liveP = spark.sql(s"SELECT count(*) FROM rstprobe.$tp").head().getLong(0)
      require(liveP == n, s"pass-through restore wrong: $liveP of $n")

      println(f"$d%5d $n%9d | $passMs%14d $conflictMs%11d")
    }
    spark.stop()
  }
}
