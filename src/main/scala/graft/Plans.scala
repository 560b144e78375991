package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: prints the formatted physical plan of selected
  * queries so pushdown / broadcast / top-k shapes can be reviewed (and
  * regressions spotted) without the Spark UI.
  *
  * usage: runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("t1_topk_feed", "feed_trending", "j2_left_join",
                         "p3_time_range", "a1_trending_tags", "w6_latest_wins")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
