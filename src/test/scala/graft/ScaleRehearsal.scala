package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal (test scope): measures how the heavy operators' wall time
  * grows from sf0.01 -> sf0.1 -> a 10x-of-sf0.1 synthetic slice, to check
  * the claimed ~linear scaling of the auto-k SemDeDup / banded-LSH /
  * salted-join paths by measurement instead of argument. Results land in
  * PLANS.md.
  *
  * The 10x slice (at /tmp/graft_sf1) replicates sf0.1 ten times with:
  *  - id offsets of 1,000,000 per replica (multiple of 20 and of the doc/vec
  *    alignment, so the %-based bench slices and doc<->vec joins keep their
  *    per-replica meaning);
  *  - a per-replica token suffix on documents.text (replica 0 = original),
  *    so replicas are new CONTENT, not copies: cross-replica Jaccard is 0
  *    and match density stays constant as the corpus grows — the realistic
  *    growth model for a curation corpus (10 copies of the same corpus
  *    would force quadratic candidate growth by construction and measure
  *    the fixture, not the algorithm);
  *  - a per-replica rotation of embedding dimensions (replica 0 =
  *    original), preserving norms and within-replica geometry while
  *    scattering replicas apart in cosine space — same rationale;
  *  - plain key offsets for lineitem/orders (hot keys replicate as 10
  *    distinct hot keys).
  */
object ScaleRehearsal {
  private val Off = 1000000L

  private def buildSlice(spark: SparkSession, srcDir: String,
                         outDir: String): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val dims = embs.select(size(col("embedding"))).first().getInt(0)

    def replicaDocs(k: Int): DataFrame = {
      val base = docs.withColumn("doc_id", col("doc_id") + lit(k * Off))
      if (k == 0) base
      else base.withColumn("text",
        array_join(transform(
          filter(split(lower(col("text")), "\\s+"), t => t =!= ""),
          t => concat(t, lit(s"_r$k"))), " "))
    }
    def replicaEmbs(k: Int): DataFrame = {
      val base = embs.withColumn("vec_id", col("vec_id") + lit(k * Off))
      if (k == 0) base
      else base.withColumn("embedding",
        transform(sequence(lit(0), lit(dims - 1)),
          i => element_at(col("embedding"), pmod(i + lit(k), lit(dims)) + 1)))
    }
    (0 until 10).map(replicaDocs).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    (0 until 10).map(replicaEmbs).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    (0 until 10).map(k => li.withColumn("l_orderkey", col("l_orderkey") + lit(k * Off)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    (0 until 10).map(k => ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * Off)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }

  def main(args: Array[String]): Unit = {
    // overridable so the thread-scaling rehearsal (PLANS.md) can measure
    // the same queries at local[4] vs local[32] on the 10x slice
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf1 = "/tmp/graft_sf1"
    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      println("BUILDING 10x slice at " + sf1)
      buildSlice(spark, "/root/testdata/sf0.1", sf1)
    }
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("x49_pipeline_v3", "x48_fuzzy_decontaminate",
        "x50_semantic_auto", "x55_prune_mix", "x54_prototype_prune",
        "x47_semantic_dedup", "x27_dedup_canonical", "x42_pipeline_v2",
        "x18_neardup_clusters", "x24_skew_salted_join")
    // SPARK_GRAFT_SCALE_DIRS=sf1x restricts timing to the 10x slice (used
    // by the thread-scaling sweep, where the small SFs are not of interest)
    val dirFilter = sys.env.get("SPARK_GRAFT_SCALE_DIRS")
      .map(_.split(",").toSet)
    val dirs = Seq("sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1", "sf1x" -> sf1)
      .filter { case (l, _) => dirFilter.forall(_.contains(l)) }
    // warm codegen/readers so sf0.01 rep1 isn't charged for JVM init
    SparkEntry.queries("x42_pipeline_v2")(spark, "/root/testdata/sf0.01").count()
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = dirs.map { case (label, dir) =>
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"SCALE $name $label ${best}%.2f")
        label -> best
      }.toMap
      if (times.contains("sf1x") && times.contains("sf0.1")) {
        val exp = math.log(times("sf1x") / times("sf0.1")) / math.log(10)
        println(f"SCALE $name EXPONENT ${exp}%.2f")
      }
    }
    spark.stop()
  }
}
