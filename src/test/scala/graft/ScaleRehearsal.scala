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
  *    distinct hot keys), and since round 12 a replicated `customer` with
  *    `c_custkey`/`o_custkey` offsets (constant per-customer order density,
  *    10x the key population — what the CDC apply probes key on).
  */
object ScaleRehearsal {
  private val Off = 1000000L

  private def buildSlice(spark: SparkSession, srcDir: String,
                         outDir: String, replicas: Int,
                         withRelational: Boolean = true): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dims = embs.select(size(col("embedding"))).first().getInt(0)

    def replicaDocs(k: Int): DataFrame = {
      val base = docs.withColumn("doc_id", col("doc_id") + lit(k * Off))
      if (k == 0) base
      else base.withColumn("text",
        array_join(transform(
          filter(split(lower(col("text")), "\\s+"), t => t =!= ""),
          t => concat(t, lit(s"_r$k"))), " "))
    }
    // each replica applies a DISTINCT orthogonal transform (axis rotation
    // composed with sign flips on the first k/dims coordinates), so norms
    // and within-replica geometry are preserved while no two replicas share
    // a transform even past `dims` replicas — replicas k and k+dims would
    // otherwise be exact cross-replica copies, inflating semantic-dup
    // density at 100x by construction. dims * (dims+1) distinct transforms
    // cover any replica count used here (64 dims -> 4160).
    def replicaEmbs(k: Int): DataFrame = {
      val base = embs.withColumn("vec_id", col("vec_id") + lit(k * Off))
      if (k == 0) base
      else {
        val rot = k % dims
        val flips = k / dims
        base.withColumn("embedding",
          transform(sequence(lit(0), lit(dims - 1)),
            i => {
              val v = element_at(col("embedding"),
                pmod(i + lit(rot), lit(dims)) + 1)
              when(i < lit(flips), -v).otherwise(v)
            }))
      }
    }
    (0 until replicas).map(replicaDocs).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    (0 until replicas).map(replicaEmbs).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    if (withRelational) {
      val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
      val ord = spark.read.parquet(s"$srcDir/orders.parquet")
      val cust = spark.read.parquet(s"$srcDir/customer.parquet")
      (0 until replicas).map(k =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(k * Off)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      // o_custkey offsets WITH the customer replicas: per-customer order
      // density stays constant while the key population grows 10x — the
      // same growth model as the content replicas (the CDC apply scale
      // probes key on these)
      (0 until replicas).map(k =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * Off))
          .withColumn("o_custkey", col("o_custkey") + lit(k * Off)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
      (0 until replicas).map(k =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(k * Off)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
      // part: plain key offsets (x66's column-mapping replay keys on
      // p_partkey parity, which the multiple-of-20 offset preserves)
      val part = spark.read.parquet(s"$srcDir/part.parquet")
      (0 until replicas).map(k =>
        part.withColumn("p_partkey", col("p_partkey") + lit(k * Off)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/part.parquet")
    }
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
    val sf100 = "/tmp/graft_sf100"
    // SPARK_GRAFT_SCALE_DIRS=sf1x (or sf1x,sf100x) restricts timing to the
    // big slices (thread-scaling / second-decade sweeps, where the small
    // SFs are not of interest); sf100x is only built when requested
    val dirFilter = sys.env.get("SPARK_GRAFT_SCALE_DIRS")
      .map(_.split(",").toSet)
    def wanted(label: String): Boolean = dirFilter.forall(_.contains(label))
    if (!new java.io.File(s"$sf1/documents.parquet").exists() && wanted("sf1x")) {
      println("BUILDING 10x slice at " + sf1)
      buildSlice(spark, "/root/testdata/sf0.1", sf1, replicas = 10)
    }
    if (!new java.io.File(s"$sf100/documents.parquet").exists() &&
        wanted("sf100x") && dirFilter.nonEmpty) {
      // curation tables only: the second-decade sweep targets the text /
      // embedding operators, and a 60M-row lineitem write would dominate
      // the build for queries that never read it
      println("BUILDING 100x slice at " + sf100)
      buildSlice(spark, "/root/testdata/sf0.1", sf100, replicas = 100,
        withRelational = false)
    }
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("x49_pipeline_v3", "x48_fuzzy_decontaminate",
        "x50_semantic_auto", "x55_prune_mix", "x54_prototype_prune",
        "x47_semantic_dedup", "x27_dedup_canonical", "x42_pipeline_v2",
        "x18_neardup_clusters", "x24_skew_salted_join")
    val dirs = Seq("sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1", "sf1x" -> sf1, "sf100x" -> sf100)
      .filter { case (l, _) => wanted(l) && (l != "sf100x" || dirFilter.nonEmpty) }
    // non-registry probes: the flat-vs-two-level auto-k comparison at the
    // measured crossover (the two produce the same keep verdicts on probed
    // cells — TwoLevelAssignSpec — but differ asymptotically: O(N*k) flat
    // vs O(N*sqrt(k)) two-level, and k = N/16 grows with the corpus)
    def embBase(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
      Tables.embeddings(s, dir).select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    def embSeeds(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.ops.Similarity.autoKSeeds(embBase(s, dir), 16, 11, 4)
    val special: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
      "x50_twolevel" -> ((s, dir) => graft.ops.Similarity.semanticDedupAutoTwoLevel(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        targetClusterSize = 16, threshold = 0.36)),
      // assignment-scan-only probes, to attribute auto-k cost between the
      // argmax scan and the SemDeDup pair/CC tail; sum(cluster) forces the
      // assignment column past count()'s column pruning
      "assign_flat" -> ((s, dir) => graft.ops.Similarity.kmeansAssign(
        embBase(s, dir), "vec", embSeeds(s, dir), iters = 0)
        .agg(sum(col("cluster")))),
      "assign_twolevel" -> ((s, dir) => graft.ops.Similarity.kmeansAssignTwoLevel(
        embBase(s, dir), "vec", embSeeds(s, dir), iters = 0)
        .agg(sum(col("cluster")))),
      // plan-build only: constructing the two-level assignment runs the
      // driver-side codebook coarsening; no action on the built frame
      "assign_twolevel_build" -> ((s, dir) => {
        graft.ops.Similarity.kmeansAssignTwoLevel(
          embBase(s, dir), "vec", embSeeds(s, dir), iters = 0)
        s.range(1).toDF("ok")
      }),
      // round-17 operators at corpus scale (the registry faces cap their
      // inputs for the pair-oracle, like x2/x11 — these probes run the
      // OPERATORS over the whole slice):
      // dHash + banded-Hamming pairs over every doc's synthetic image —
      // groups of 4 stay disjoint across replicas (1M id offsets), so the
      // true pair count grows linearly with the corpus
      "x70_full" -> ((s, dir) => graft.ops.Multimodal.imageNearDupPairs(s,
        graft.ops.Multimodal.syntheticImages(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id"))),
      // the x69 registry face under count() gets its computed columns
      // PRUNED (window + expression eliminated — the count()-prunes trap
      // this file's doc warns about); force the whole pipeline with sums
      "x69_forced" -> ((s, dir) => SparkEntry.queries("x69_bpe_counts")(s, dir)
        .agg(sum(col("n_tokens")), sum(col("bin_id")))),
      // BPE counting with a GPT-2-CLASS table: 50k random well-formed
      // merges (seeded; each side a known token, so construction preserves
      // the validated precondition) — measures the memoized walk + the
      // ~1 MB table riding the plan, not the toy demo vocab
      "x69_bigvocab" -> ((s, dir) => {
        val rnd = new scala.util.Random(17)
        val known = scala.collection.mutable.ArrayBuffer[String]()
        known ++= ('a' to 'z').map(_.toString)
        val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
        while (merges.size < 50000) {
          val x = known(rnd.nextInt(known.size))
          val y = known(rnd.nextInt(known.size))
          if ((x + y).length <= 12) { merges += ((x, y)); known += (x + y) }
        }
        Tables.documents(s, dir).agg(sum(
          graft.ops.TextAnalysis.bpeTokenCount(col("text"), merges.toSeq))
          .as("total_tokens"))
      }),
      // round-18 operators over the whole slice (registry faces cap their
      // inputs for the oracle): real PNG/GIF ENCODE + ImageIO DECODE +
      // dHash per doc — mapPartitions is opaque to pruning, so count()
      // runs the full chain
      "x71_full" -> ((s, dir) => graft.ops.Multimodal.dHash64(s,
        graft.ops.Multimodal.syntheticLosslessImages(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id"))),
      // BPE encode-to-ids over every doc, exploded and aggregated so the
      // id arrays are materialized element-by-element (not just counted)
      "x72_full" -> ((s, dir) => Tables.documents(s, dir)
        .select(posexplode(graft.ops.TextAnalysis.bpeEncode(col("text"),
          graft.ops.TextAnalysis.demoBpeMerges)))
        .agg(sum(col("col")).as("id_sum"), count(lit(1)).as("n"))),
      // PCM generate + chunk-walk + energy fingerprint for EVERY doc
      "x74_full" -> ((s, dir) => graft.ops.Multimodal.audioFingerprint64(s,
        graft.ops.Multimodal.syntheticAudio(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id"))),
      // 10-frame motion-BMP encode + container walk + per-frame dHash +
      // exact set-Jaccard pairs for EVERY doc (group structure scales
      // with the corpus, so true pairs grow linearly)
      "x75_full" -> ((s, dir) => graft.ops.Multimodal.videoNearDupPairs(s,
        graft.ops.Multimodal.syntheticVideos(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id"),
        threshold = 0.8)),
      // cluster-size distribution under the flat auto-k assignment: the
      // SemDeDup tail's pair volume is sum(size^2), so imbalance here is
      // what the x50-family wall time actually scales with
      "cluster_sizes" -> ((s, dir) => {
        val sizes = graft.ops.Similarity.kmeansAssign(
            embBase(s, dir), "vec", embSeeds(s, dir), iters = 0)
          .groupBy(col("cluster")).count()
        val st = sizes.agg(count(lit(1)).as("k"), max(col("count")).as("mx"),
            avg(col("count")).as("mean"),
            sum(col("count") * col("count")).as("sumsq")).first()
        println(s"SIZES k=${st.getLong(0)} max=${st.getLong(1)} " +
          f"mean=${st.getDouble(2)}%.1f sumsq=${st.getLong(3)}")
        println("SIZES top10 " + sizes.orderBy(col("count").desc).limit(10)
          .collect().map(r => r.getLong(1)).mkString(","))
        sizes
      }),
    )
    // warm codegen/readers so the first timed rep isn't charged for JVM init
    SparkEntry.queries("x42_pipeline_v2")(spark, "/root/testdata/sf0.01").count()
    queries.foreach { name =>
      val fn = special.getOrElse(name, SparkEntry.queries(name))
      // one rep on the 100x slice (a second rep of a minutes-long query
      // buys noise reduction nobody needs), min-of-two below it
      val times = dirs.map { case (label, dir) =>
        val reps = if (label == "sf100x") 1 else 2
        val best = (1 to reps).map { _ =>
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
      if (times.contains("sf100x") && times.contains("sf1x")) {
        val exp = math.log(times("sf100x") / times("sf1x")) / math.log(10)
        println(f"SCALE $name EXPONENT-DECADE2 ${exp}%.2f")
      }
    }
    spark.stop()
  }
}
