package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness (test scope — not part of the library): times the
  * named registry queries against `GRAFT_SF_DIR` with `GRAFT_REPEATS`
  * repeats, printing one `TIMER name rep secs cpu_secs rows` line per run.
  * Used for stage-level shave work and the scale-rehearsal measurements in
  * PLANS.md; the driver-facing bench contract lives in graft.Bench.
  *
  *   sbt "Test/runMain graft.QueryTimer x49_pipeline_v3 x50_semantic_auto"
  */
object QueryTimer {
  private def cpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => Double.NaN
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("GRAFT_REPEATS", "3").toInt
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm codegen/readers on a small SF so rep 1 isn't charged for JVM init
    SparkEntry.queries("x42_pipeline_v2")(spark, "/root/testdata/sf0.01").count()
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to repeats).foreach { rep =>
        val c0 = cpuSec(); val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9; val c = cpuSec() - c0
        println(f"TIMER $name rep$rep%s ${w}%.2fs cpu=${c}%.2fs rows=$rows")
      }
    }
    spark.stop()
  }
}
