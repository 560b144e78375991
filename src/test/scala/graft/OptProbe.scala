package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 optimization probe (test scope): attributes the heavy queries'
  * cost to pipeline STAGES, timing each sub-plan with the noop sink
  * (guide §1.4 — computes every column, no count-pruning) after a small-SF
  * warm-up. One `PROBE stage secs cpu` line per stage per repeat.
  *
  *   sbt "Test/runMain graft.OptProbe x48"     // stage attribution for x48
  *   GRAFT_CPUS=32 GRAFT_SF_DIR=/root/testdata/sf0.1
  */
object OptProbe {
  private def cpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => Double.NaN
    }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private var spark: SparkSession = _
  private var sfDir: String = _

  private def time(name: String)(body: => Unit): Unit = {
    val c0 = cpuSec(); val t0 = System.nanoTime()
    body
    val w = (System.nanoTime() - t0) / 1e9; val c = cpuSec() - c0
    println(f"PROBE $name%-34s ${w}%7.3f s  cpu ${c}%7.3f")
  }

  def main(args: Array[String]): Unit = {
    sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "32")
    spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up codegen/readers (same rationale as QueryTimer)
    SparkEntry.queries("x42_pipeline_v2")(spark, "/root/testdata/sf0.01").count()
    val reps = sys.env.getOrElse("GRAFT_REPEATS", "2").toInt
    (1 to reps).foreach { _ => args.foreach(run) }
    spark.stop()
  }

  private def run(which: String): Unit = which match {
    case "x48" => probeX48()
    case "x47" => probeX47()
    case "x65" => probeX65()
    case "x65m" => probeX65Merges()
    case "mf" => probeMergeFixed()
    case "x48plan" => probeX48Plan()
    case "x42" => probeX42()
    case "load" => probeLoad()
    case "x27" => probeX27()
    case "jobs" => probeJobs()
    case other => println(s"unknown probe $other")
  }

  /** x48 = minhashDedupAgainst(corpus=19/20, ref=1/20 of documents). */
  private def probeX48(): Unit = {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L)
    val ref = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
    var sigC: DataFrame = null; var sigR: DataFrame = null
    time("x48.signatures(corpus)") {
      sigC = Dedup.minhashSignatures(corpus, "doc_id", "text", 32).localCheckpoint(true)
    }
    time("x48.signatures(ref)") {
      sigR = Dedup.minhashSignatures(ref, "doc_id", "text", 32).localCheckpoint(true)
    }
    var cand: DataFrame = null
    time("x48.band_join+distinct") {
      cand = Dedup.bandHashes(sigC, 16).as("a")
        .join(Dedup.bandHashes(sigR, 16).as("b"),
          col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
        .localCheckpoint(true)
      println(s"  cand pairs = ${cand.count()}")
    }
    // the cross-rescore internals (token checkpoints + two joins + intersect)
    def toks(df: DataFrame) = df.select(col("doc_id").as("id"),
        array_distinct(transform(Dedup.tokenSet(col("text")),
          t => xxhash64(t))).as("toks"))
      .filter(size(col("toks")) > 0)
    var ta: DataFrame = null; var tb: DataFrame = null
    time("x48.rescore.toks(corpus)") { ta = toks(corpus).localCheckpoint(true) }
    time("x48.rescore.toks(ref)") { tb = toks(ref).localCheckpoint(true) }
    time("x48.rescore.join+intersect") {
      noop(cand
        .join(ta.select(col("id").as("id_a"), col("toks").as("__ta")), Seq("id_a"))
        .join(tb.select(col("id").as("id_b"), col("toks").as("__tb")), Seq("id_b"))
        .withColumn("inter",
          size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (size(col("__ta")) + size(col("__tb")) - col("inter")).cast("double"))
        .select(col("id_a"), col("id_b"), col("jaccard")))
    }
    time("x48.end_to_end") {
      noop(Dedup.minhashDedupAgainst(corpus, ref, "doc_id", "text", 0.8)
        .select(col("doc_id"), col("lang"), col("source")))
    }
  }

  /** x47 = semanticDedup(embeddings, label prototypes, threshold 0.36). */
  private def probeX47(): Unit = {
    import graft.ops.{Dedup, Similarity}
    val emb = Tables.embeddings(spark, sfDir)
    var init: Array[(Int, Seq[Double])] = null
    time("x47.classCentroids.collect") {
      init = Similarity.classCentroids(emb, "embedding", "label", 4)
        .orderBy(col("label")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    val base = emb.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
    var assigned: DataFrame = null
    time("x47.assign+checkpoint") {
      assigned = Similarity.kmeansAssign(base, "vec", init, iters = 0, 4)
        .select(col("id"), col("cluster"), col("vec"))
        .localCheckpoint(true)
    }
    var pairs: DataFrame = null
    time("x47.pair_join+cosine") {
      pairs = assigned.select(col("id").as("id_a"), col("cluster"), col("vec").as("va"))
        .join(assigned.select(col("id").as("id_b"), col("cluster"), col("vec").as("vb")),
          Seq("cluster"))
        .filter(col("id_a") < col("id_b"))
        .filter(round(Similarity.cosine(col("va"), col("vb")), 6) >= 0.36)
        .select("id_a", "id_b")
        .localCheckpoint(true)
      println(s"  pairs = ${pairs.count()}")
    }
    time("x47.cc") {
      noop(Dedup.nearDupClusters(pairs))
    }
    time("x47.end_to_end") {
      noop(Similarity.semanticDedup(emb, "vec_id", "embedding", "label", 0.36))
    }
  }

  /** x65 = three applyBatchScd2 batches into a throwaway catalog. */
  private def probeX65(): Unit = {
    import graft.connector.{CdcApply, ChangeFeed, GraftCatalog}
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory(s"probe-cdc-$id").toString
    spark.conf.set(s"spark.sql.catalog.p$id", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.p$id.root", root)
    val cat = s"p$id"
    spark.sql(s"CREATE TABLE $cat.hist (k BIGINT, price_micro BIGINT, " +
      "__start_at BIGINT, __end_at BIGINT)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val batch1 = o.select(
      col("o_custkey").as("k"), col("o_orderkey").as("seq"),
      (col("o_totalprice").cast(dec) * lit(1000000L)).cast("long").as("price_micro"),
      lit("insert").as(ChangeFeed.TypeCol), lit(1L).as(ChangeFeed.VersionCol))
    val batch2 = c.filter(col("c_custkey") % 5 === 0).select(
      col("c_custkey").cast("long").as("k"),
      (lit(1000000000000000L) + col("c_custkey")).cast("long").as("seq"),
      (col("c_custkey") * 1000).cast("long").as("price_micro"),
      lit("insert").as(ChangeFeed.TypeCol), lit(2L).as(ChangeFeed.VersionCol))
    val batch3 = c.filter(col("c_custkey") % 4 === 0).select(
      col("c_custkey").cast("long").as("k"),
      (lit(2000000000000000L) + col("c_custkey")).cast("long").as("seq"),
      lit(0L).as("price_micro"),
      lit("delete").as(ChangeFeed.TypeCol), lit(3L).as(ChangeFeed.VersionCol))
    val dataCols = Seq("k", "seq", "price_micro")
    time("x65.batch1(150k inserts)") {
      CdcApply.applyBatchScd2(batch1, s"$cat.hist", Seq("k"), dataCols, "seq")
    }
    time("x65.batch2(3k restatements)") {
      CdcApply.applyBatchScd2(batch2, s"$cat.hist", Seq("k"), dataCols, "seq")
    }
    time("x65.batch3(3.75k closes)") {
      CdcApply.applyBatchScd2(batch3, s"$cat.hist", Seq("k"), dataCols, "seq")
    }
    time("x65.final_read") {
      noop(spark.table(s"$cat.hist").orderBy(col("k"), col("__start_at")))
    }
  }

  /** x65 with the applyBatchScd2 internals split per stage: the per-key
    * reduce+window+checkpoint, then each of the two MERGEs separately.
    */
  private def probeX65Merges(): Unit = {
    import graft.connector.{ChangeFeed, GraftCatalog}
    import org.apache.spark.sql.expressions.Window
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory(s"probe-cdcm-$id").toString
    spark.conf.set(s"spark.sql.catalog.m$id", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.m$id.root", root)
    val cat = s"m$id"
    spark.sql(s"CREATE TABLE $cat.hist (k BIGINT, price_micro BIGINT, " +
      "__start_at BIGINT, __end_at BIGINT)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val batches = Seq(
      ("b1", o.select(
        col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        (col("o_totalprice").cast(dec) * lit(1000000L)).cast("long").as("price_micro"),
        lit("insert").as(ChangeFeed.TypeCol), lit(1L).as(ChangeFeed.VersionCol))),
      ("b2", c.filter(col("c_custkey") % 5 === 0).select(
        col("c_custkey").cast("long").as("k"),
        (lit(1000000000000000L) + col("c_custkey")).cast("long").as("seq"),
        (col("c_custkey") * 1000).cast("long").as("price_micro"),
        lit("insert").as(ChangeFeed.TypeCol), lit(2L).as(ChangeFeed.VersionCol))),
      ("b3", c.filter(col("c_custkey") % 4 === 0).select(
        col("c_custkey").cast("long").as("k"),
        (lit(2000000000000000L) + col("c_custkey")).cast("long").as("seq"),
        lit(0L).as("price_micro"),
        lit("delete").as(ChangeFeed.TypeCol), lit(3L).as(ChangeFeed.VersionCol))))
    batches.foreach { case (tag, batch) =>
      time(s"x65m.$tag.isEmpty") { batch.isEmpty }
      var shapedV: DataFrame = null
      time(s"x65m.$tag.reduce+window+ckpt") {
        val events = batch
          .filter(col(ChangeFeed.TypeCol) =!= "update_preimage")
          .groupBy(col("k"), col("seq"))
          .agg(max(struct(col(ChangeFeed.VersionCol),
            lit(2).as("__rank"), col(ChangeFeed.TypeCol),
            col("price_micro"))).as("__last"))
          .select(col("k"), col("seq"), col("__last.*"))
          .drop("__rank", ChangeFeed.VersionCol)
        val w = Window.partitionBy(col("k")).orderBy(col("seq"))
        val wAll = Window.partitionBy(col("k"))
        shapedV = events
          .withColumn("__end_at", lead(col("seq"), 1).over(w))
          .withColumn("__min_start", min(col("seq")).over(wAll))
          .localCheckpoint(true)
      }
      shapedV.createOrReplaceTempView(s"probe_$tag")
      time(s"x65m.$tag.merge1(close)") {
        spark.sql(
          s"""MERGE INTO $cat.hist t
             |USING (SELECT DISTINCT `k`, `__min_start` FROM probe_$tag) s
             |ON t.`k` <=> s.`k` AND t.`__end_at` IS NULL AND t.`__start_at` <= s.`__min_start`
             |WHEN MATCHED THEN UPDATE SET t.`__end_at` = s.`__min_start`""".stripMargin)
      }
      time(s"x65m.$tag.merge2(upsert)") {
        spark.sql(
          s"""MERGE INTO $cat.hist t
             |USING (SELECT * FROM probe_$tag
             |       WHERE `${ChangeFeed.TypeCol}` <> 'delete') s
             |ON t.`k` <=> s.`k` AND t.`__start_at` = s.`seq`
             |WHEN MATCHED THEN UPDATE SET t.`price_micro` = s.`price_micro`, t.`__end_at` = s.`__end_at`
             |WHEN NOT MATCHED THEN INSERT (`k`, `price_micro`, `__start_at`, `__end_at`)
             |VALUES (s.`k`, s.`price_micro`, s.`seq`, s.`__end_at`)""".stripMargin)
      }
    }
  }

  /** Per-call cost of spark.read.parquet (listing + schema inference) —
    * the fixed tax every one of the 148 queries pays per table load.
    */
  private def probeLoad(): Unit = {
    time("load.orders x100 (schema only)") {
      (1 to 100).foreach(_ => Tables.orders(spark, sfDir).schema)
    }
    time("load.events x100 (layout-adaptive)") {
      (1 to 100).foreach(_ => Tables.events(spark, sfDir).schema)
    }
    time("load.count tiny (nation) x20") {
      (1 to 20).foreach(_ => Tables.nation(spark, sfDir).count())
    }
    val sch = Tables.orders(spark, sfDir).schema
    time("load.orders x100 (explicit schema)") {
      (1 to 100).foreach(_ =>
        spark.read.schema(sch).parquet(s"$sfDir/orders.parquet").schema)
    }
    time("load.count.orders x20 (inferred)") {
      (1 to 20).foreach(_ => Tables.orders(spark, sfDir).count())
    }
    time("load.count.orders x20 (explicit schema)") {
      (1 to 20).foreach(_ =>
        spark.read.schema(sch).parquet(s"$sfDir/orders.parquet").count())
    }
  }

  /** x42 = spanDedup -> quality gate -> exact 4-gram decontamination. */
  private def probeX42(): Unit = {
    import graft.ops.{Decontaminate, Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
    var cleaned: DataFrame = null
    time("x42.spanDedup") {
      cleaned = Dedup.spanDedup(docs, "doc_id", "text", w = 5)
        .filter(col("n_kept") > 0)
        .select(col("doc_id"), col("clean_text").as("text"))
        .localCheckpoint(true)
    }
    var qualified: DataFrame = null
    time("x42.quality+ckpt") {
      qualified = cleaned
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.7)
        .localCheckpoint(true)
    }
    time("x42.removeContaminated") {
      val bench = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
      noop(Decontaminate.removeContaminated(qualified, bench, "doc_id", "text", n = 4))
    }
    time("x42.end_to_end") {
      noop(SparkEntry.queries("x42_pipeline_v2")(spark, sfDir))
    }
  }

  /** Physical plan of the x48 band join + distinct (the candidate stage). */
  private def probeX48Plan(): Unit = {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20L)) =!= 0L)
    val ref = docs.filter(pmod(col("doc_id"), lit(20L)) === 0L)
    val sigC = Dedup.minhashSignatures(corpus, "doc_id", "text", 32).localCheckpoint(true)
    val sigR = Dedup.minhashSignatures(ref, "doc_id", "text", 32).localCheckpoint(true)
    Dedup.bandHashes(sigC, 16).as("a")
      .join(Dedup.bandHashes(sigR, 16).as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .explain("formatted")
  }

  /** Fixed-cost anatomy of one catalog MERGE: no-op merge (empty source),
    * plain read, plain count — run against a 150k-row cow table.
    */
  private def probeMergeFixed(): Unit = {
    import graft.connector.GraftCatalog
    val id = java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory(s"probe-mf-$id").toString
    spark.conf.set(s"spark.sql.catalog.f$id", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.f$id.root", root)
    val cat = s"f$id"
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(dec) * lit(1000000L)).cast("long").as("v"))
      .createOrReplaceTempView("probe_src")
    time("mf.insert(150k)") {
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM probe_src")
    }
    time("mf.count") { spark.table(s"$cat.t").count() }
    time("mf.noop_merge(empty source)") {
      spark.sql(s"""MERGE INTO $cat.t t USING (SELECT * FROM probe_src WHERE k < 0) s
                   |ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = s.v
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    }
    time("mf.noop_merge2(empty source)") {
      spark.sql(s"""MERGE INTO $cat.t t USING (SELECT * FROM probe_src WHERE k < 0) s
                   |ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = s.v
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    }
    time("mf.small_merge(30 keys)") {
      spark.sql(s"""MERGE INTO $cat.t t USING (SELECT * FROM probe_src WHERE k % 5000 = 0) s
                   |ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = s.v + 1
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    }
  }

  /** Spark JOB COUNT per query (deterministic — window-independent
    * evidence for job-dispatch optimizations): runs each GRAFT_JOBS query
    * once and prints jobs + tasks submitted during it.
    */
  private def probeJobs(): Unit = {
    val names = sys.env.getOrElse("GRAFT_JOBS",
      "j8_thread_tree,x65_scd2_apply,x48_fuzzy_decontaminate").split(",")
    names.foreach { n =>
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val tasks = new java.util.concurrent.atomic.AtomicInteger()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        Thread.sleep(500)   // listener bus is async; jobs are already done
        println(f"PROBE jobs.$n%-34s jobs=${jobs.get()}%4d tasks=${tasks.get()}%6d")
      } finally spark.sparkContext.removeSparkListener(l)
    }
  }

  /** x27 = exact + fuzzy canonical dedup — check where its 4 CPU-s go. */
  private def probeX27(): Unit = {
    time("x27.end_to_end") {
      noop(SparkEntry.queries("x27_dedup_canonical")(spark, sfDir))
    }
  }
}
