package graft

/** Scratch probe (test scope): isolate where the x18/x27 pipelines burn
  * CPU vs thread/partition count. Phases: pair generation (the inverted-
  * index jaccard), the CC loop, and the x27 keep-canonical tail — run
  * separately, each timed wall+cpu, at GRAFT_CPUS threads and GRAFT_PARTS
  * shuffle partitions.
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
    def phase(rep: Int, name: String)(work: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuSec()
      val n = work
      println(f"PROBE rep$rep $name%-10s wall=${(System.nanoTime() - t0) / 1e9}%5.2f " +
        f"cpu=${cpuSec() - c0}%6.2f rows=$n cpus=$cpus parts=$parts")
    }
    for (rep <- 1 to 3) {
      val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      var pairs: org.apache.spark.sql.DataFrame = null
      phase(rep, "pairs") {
        pairs = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
          .localCheckpoint(true)
        pairs.count()
      }
      var clusters: org.apache.spark.sql.DataFrame = null
      phase(rep, "cc") {
        clusters = graft.ops.Dedup.nearDupClusters(pairs).localCheckpoint(true)
        clusters.count()
      }
      phase(rep, "canonical") {
        graft.ops.Dedup.keepCanonical(docs, clusters, "doc_id")
          .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id")).count()
      }
      // the full x18 query as the bench runs it, for cross-checking the sum
      phase(rep, "x18_full") {
        SparkEntry.queries("x18_neardup_clusters")(spark, dir).count()
      }
      phase(rep, "x27_full") {
        SparkEntry.queries("x27_dedup_canonical")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
