package graft
/** Scratch timing main (test scope; not part of the library surface). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (n <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"$n%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
