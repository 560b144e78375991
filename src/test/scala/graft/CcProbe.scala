package graft

/** Scratch probe (test scope): isolate the connected-components loop's CPU
  * burn vs thread/partition count. Runs the x18-shaped pipeline (jaccard
  * pairs -> nearDupClusters) with the session's shuffle.partitions set from
  * GRAFT_PARTS, at GRAFT_CPUS threads, printing wall/cpu per phase.
  */
object CcProbe {
  private def cpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => Double.NaN
    }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("GRAFT_PARTS", cpus)
    val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    for (rep <- 1 to 3) {
      val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      var t0 = System.nanoTime(); var c0 = cpuSec()
      val pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
        .localCheckpoint(true)
      println(f"PROBE rep$rep pairs  wall=${(System.nanoTime() - t0) / 1e9}%5.2f cpu=${cpuSec() - c0}%6.2f")
      t0 = System.nanoTime(); c0 = cpuSec()
      val n = graft.ops.Dedup.nearDupClusters(pairs).count()
      println(f"PROBE rep$rep cc     wall=${(System.nanoTime() - t0) / 1e9}%5.2f cpu=${cpuSec() - c0}%6.2f rows=$n cpus=$cpus parts=$parts")
    }
    spark.stop()
  }
}
