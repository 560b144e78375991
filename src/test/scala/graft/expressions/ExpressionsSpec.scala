package graft.expressions

import graft.SparkSpec
import graft.core.Scores
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("ScoreExpression == built-in combo on real data (codegen path)") {
    val e = graft.Tables.events(spark, sf())
    val cmp = e.select(
        ScoreExpression.score(col("value"), unix_timestamp(col("ts")), lit(480000L)).as("a"),
        Scores.scoreTrend(col("value"), unix_timestamp(col("ts"))).as("b"))
      .withColumn("diff", abs(col("a") - col("b")))
      .agg(max(col("diff"))).first().getDouble(0)
    assert(cmp == 0.0)
  }

  test("graft_score registered for SQL") {
    ScoreExpression.register(spark)
    val r = spark.sql(
      "SELECT graft_score(CAST(1000.0 AS DOUBLE), CAST(1600000000 AS BIGINT), CAST(480000 AS BIGINT)) AS s")
      .first().getDouble(0)
    assert(math.abs(r - (3.0 + 1600000000.0 / 480000.0)) < 1e-9)
  }

  test("two graft_score calls in one codegen scope coexist (freshName locals)") {
    // a fixed-name local in doGenCode would generate a duplicate-variable
    // Janino error and silently fall back to interpreted execution
    val r = Seq((10.0, 100L, 20.0, 200L)).toDF("a", "ea", "b", "eb")
      .select(
        ScoreExpression.score(col("a"), col("ea"), lit(480000L)).as("s1"),
        ScoreExpression.score(col("b"), col("eb"), lit(480000L)).as("s2"))
      .first()
    assert(math.abs(r.getDouble(0) - (1.0 + 100.0 / 480000.0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - (math.log10(20.0) + 200.0 / 480000.0)) < 1e-9)
  }

  test("SQL-registered graft_score coerces int inputs; graft_cosine rejects bad arrays at analysis") {
    ScoreExpression.register(spark)
    CosineSimExpression.register(spark)
    // INT literals must coerce via inputTypes instead of ClassCastException
    val s = spark.sql("SELECT graft_score(1000, 1600000000, 480000) AS s").first().getDouble(0)
    assert(math.abs(s - (3.0 + 1600000000.0 / 480000.0)) < 1e-9)
    // a string array must fail at ANALYSIS, not per-row mid-job
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array('a','b'), array('c','d'))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_cosine") ||
      err.getMessage.toLowerCase.contains("data type"))
  }

  test("ScoreExpression null propagation + interpreted eval") {
    val r = Seq((Some(10.0), 100L), (None, 200L)).toDF("rs", "ep")
      .select(ScoreExpression.score(col("rs"), col("ep"), lit(480000L)).as("s"))
      .collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }

  test("GraftExtensions injects graft_score (spark.sql.extensions path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must register without throwing
    // the same builder drives the in-process registration; prove it resolves
    ScoreExpression.register(spark)
    assert(spark.sql("SELECT graft_score(2.0D, 100L, 10L) AS s").first().getDouble(0)
      == math.log10(2.0) + 10.0)
    CosineSimExpression.register(spark)
    assert(spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .first().getDouble(0) == 1.0)
  }

  test("approx_count_distinct within 5% of exact (A11 extension)") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).first()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("PayoutAggregator == batch conditional sums") {
    import PayoutAggregator._
    val events = Seq(
      RewardEvent("curationReward", BigDecimal("1.5")),
      RewardEvent("beneficiaryReward", BigDecimal("0.5")),
      RewardEvent("authorReward", BigDecimal("3.0")),
      RewardEvent("somethingElse", BigDecimal("99")))
    val ds = events.toDS()
    val got = ds.select(instance.toColumn).first()
    assert(got.total == BigDecimal("5.0"))
    assert(got.curator == BigDecimal("1.5"))
    assert(got.beneficiaries == BigDecimal("0.5"))
  }

  test("TokenBucketFold == the HOF Column formula, incl. unicode/empty/multi-space") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "Beta", "cc", "ΔΕΛΤΑ", "héllo", "中文字",
      "x", "MiXeD", "123", "a-b")
    val docs = (0L until 40L).map { i =>
      val toks = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val sep = if (rng.nextBoolean()) " " else "  \t "
      (i, toks.mkString(sep) + (if (rng.nextBoolean()) " " else ""))
    } ++ Seq((100L, ""), (101L, "   \t  "), (102L, "solo"))
    val df = docs.toDF("doc_id", "text")
    val buckets = 64
    val table = Array.tabulate(buckets + 1)(b => (b * 37 - 700).toLong)
    val init = table(buckets)
    // reference: the exact Column-tree form foldScore used before
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    val tLit = array(table.toIndexedSeq.map(lit): _*)
    val hof = df.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(
        transform(toks, t => (ascii(t).cast("long") * 7919L +
          ascii(substring(t, -1, 1)).cast("long") * 31L +
          length(t).cast("long")) % buckets),
        lit(init), (s, b) => s + element_at(tLit, b.cast("int") + 1)).as("score"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val native = df.select(col("doc_id"),
        TokenBucketFold.fold(col("text"), table, buckets, init).as("f"))
      .select(col("doc_id"), col("f.n_tokens"), col("f.score"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == hof, s"native $native\nvs hof $hof")
  }

  test("BigramBucketFold == the HOF pair formula, incl. unicode/empty/solo") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "Beta", "cc", "ΔΕΛΤΑ", "héllo", "中文字",
      "x", "MiXeD", "123", "a-b")
    val docs = (0L until 40L).map { i =>
      val toks = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val sep = if (rng.nextBoolean()) " " else "  \t "
      (i, toks.mkString(sep) + (if (rng.nextBoolean()) " " else ""))
    } ++ Seq((100L, ""), (101L, "   \t  "), (102L, "solo"), (103L, "a  b"))
    val df = docs.toDF("doc_id", "text")
    val buckets = 64
    val table = Array.tabulate(buckets * buckets)(k => (k * 13 - 9000).toLong)
    // reference: hash tokens with the Column tree, pair adjacent buckets,
    // fold the pair table — the exact formula the native expression fuses
    val toks = array_remove(split(lower(col("text")), "\\s+"), "")
    val hs = transform(toks, t => (ascii(t).cast("long") * 7919L +
      ascii(substring(t, -1, 1)).cast("long") * 31L +
      length(t).cast("long")) % buckets)
    val tLit = array(table.toIndexedSeq.map(lit): _*)
    val hof = df.select(col("doc_id"), hs.as("h"))
      .select(col("doc_id"),
        greatest(size(col("h")).cast("long") - 1L, lit(0L)).as("n_bigrams"),
        coalesce(aggregate(
          when(size(col("h")) >= 2, sequence(lit(2), size(col("h"))))
            .otherwise(array().cast("array<int>")),
          lit(0L), (s, i) => s + element_at(tLit,
            (element_at(col("h"), i - 1) * buckets +
             element_at(col("h"), i)).cast("int") + 1)), lit(0L)).as("score"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val native = df.select(col("doc_id"),
        BigramBucketFold.fold(col("text"), table, buckets).as("f"))
      .select(col("doc_id"), col("f.n_bigrams"), col("f.score"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == hof, s"native $native\nvs hof $hof")
  }

  test("CentroidArgmaxExpression == the HOF fold it replaced, bit-for-bit") {
    import graft.ops.Similarity
    // the pre-round-8 formulation, kept here as the semantic reference:
    // fold over a codebook literal, accumulator [best_cos, best_cl],
    // strictly-greater replace in ascending-id order
    def foldArgmax(v: org.apache.spark.sql.Column,
                   cents: Array[(Int, Seq[Double])]): org.apache.spark.sql.Column = {
      val cvecs = array(cents.map { case (_, c) => array(c.map(lit): _*) }: _*)
      val cids = array(cents.map { case (cl, _) => lit(cl.toDouble) }: _*)
      val best = aggregate(
        sequence(lit(0), lit(cents.length - 1)),
        array(lit(-2.0), lit(cents.head._1.toDouble)),
        (acc, i) => {
          val cos = Similarity.cosine(v, element_at(cvecs, i + 1))
          when(cos > element_at(acc, 1),
            array(cos, element_at(cids, i + 1)))
            .otherwise(acc)
        })
      element_at(best, 2).cast("int")
    }
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val cents: Array[(Int, Seq[Double])] = emb
      .filter(pmod(col("vec_id"), lit(11)) === 0).orderBy(col("vec_id"))
      .limit(40)
      .select(transform(col("vec"), x => round(x, 4)).as("vec"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    val diff = emb.select(
        graft.expressions.CentroidArgmaxExpression.argmax(col("vec"), cents).as("a"),
        foldArgmax(col("vec"), cents).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, s"native argmax diverged from the fold on $diff rows")
  }

  test("CentroidArgmaxExpression ties keep smallest id; zero vector keeps first id") {
    // duplicate centroids: both have identical cosine to every input, so
    // the strictly-greater replace must keep the first (smallest id); a
    // zero input vector yields NaN cosines which never replace the init
    val cents: Array[(Int, Seq[Double])] =
      Array((3, Seq(1.0, 0.0)), (7, Seq(1.0, 0.0)), (9, Seq(0.0, 1.0)))
    val df = Seq((1L, Seq(2.0, 0.0)), (2L, Seq(0.0, 5.0)), (3L, Seq(0.0, 0.0)))
      .toDF("id", "vec")
    val got = df.select(col("id"),
        graft.expressions.CentroidArgmaxExpression.argmax(col("vec"), cents).as("cl"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got == List((1L, 3), (2L, 9), (3L, 3)), s"got $got")
  }

  test("TwoLevelArgmaxExpression ties keep smallest id; zero vector keeps cell-0 init") {
    // cell 0 routes x-axis vectors and holds duplicate children (equal
    // cosine to everything on the axis): the fine argmax's equal-cosine
    // smaller-id rule must keep 3. A zero input yields NaN cosines at both
    // levels: the probe falls back to cell 0 and the fine init — the first
    // child id of cell 0 — survives, mirroring the Column-fold init
    // element_at(element_at(childIds, 1), 1).
    val cells: Array[(Seq[Double], Array[(Int, Seq[Double])])] = Array(
      (Seq(1.0, 0.0), Array((3, Seq(1.0, 0.0)), (7, Seq(1.0, 0.0)))),
      (Seq(0.0, 1.0), Array((9, Seq(0.0, 1.0)))))
    val df = Seq((1L, Seq(2.0, 0.0)), (2L, Seq(0.0, 5.0)), (3L, Seq(0.0, 0.0)))
      .toDF("id", "vec")
    for (p <- Seq(1, 2)) {
      val got = df.select(col("id"),
          graft.expressions.TwoLevelArgmaxExpression.argmax(col("vec"), cells, p).as("cl"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toList
      // probes=1 routes (0,5) to cell 1 only if the coarse argmax picks it —
      // it does (cos 1 vs 0); zero vector keeps 3 at any probe count
      assert(got == List((1L, 3), (2L, 9), (3L, 3)), s"probes=$p got $got")
    }
  }

  test("TwoLevelArgmaxExpression interpreted eval == codegen path") {
    // the expression has two implementations (nullSafeEval and doGenCode);
    // Spark normally only ever runs the generated one, so force the
    // interpreted factory and require identical assignments on real data
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val cents: Array[(Int, Seq[Double])] = emb
      .filter(pmod(col("vec_id"), lit(11)) === 0).orderBy(col("vec_id"))
      .limit(40)
      .select(transform(col("vec"), x => round(x, 4)).as("vec"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    def assigns(): Map[Long, Int] =
      Similarity.kmeansAssignTwoLevel(
          emb.withColumnRenamed("vec_id", "id"), "vec", cents, iters = 0)
        .select(col("id").cast("long"), col("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gen = assigns()
    val mode = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(mode, "FALLBACK")
    spark.conf.set(mode, "NO_CODEGEN")
    val interp = try assigns() finally spark.conf.set(mode, prev)
    assert(gen == interp, {
      val diffs = gen.keys.filter(k => gen(k) != interp(k)).take(5)
      s"interpreted two-level diverged from codegen on ids $diffs"
    })
  }

  test("SortedIntersectSize == size(array_intersect) on sorted distinct arrays") {
    // the rescore kernel contract: over sorted duplicate-free long arrays the
    // merge count must equal the builtin's intersection size — including
    // empty arrays, disjoint sets, full overlap, and null inputs
    val rng = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val a = rng.shuffle((0L to 60L).toList).take(rng.nextInt(20))
        .distinct.sorted
      val b = rng.shuffle((0L to 60L).toList).take(rng.nextInt(20))
        .distinct.sorted
      (i, a, b)
    } :+ ((201, List.empty[Long], List(1L, 2L))) :+
      ((202, List(5L), List(5L)))
    val df = rows.toDF("i", "a", "b")
      .select(col("i"),
        SortedIntersectSize.sortedIntersectSize(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    // null array input propagates null
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(SortedIntersectSize.sortedIntersectSize(col("a"), col("b")).as("s"))
      .first()
    assert(n.isNullAt(0))
    // interpreted path agrees with codegen
    val mode = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(mode, "FALLBACK")
    spark.conf.set(mode, "NO_CODEGEN")
    try assert(df.filter(col("got") =!= col("want")).count() == 0)
    finally spark.conf.set(mode, prev)
  }

  test("LongDotExpression == aggregate(zip_with) on long arrays") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 100).map { i =>
      (i, Seq.fill(64)(rng.nextInt(255).toLong - 127),
        Seq.fill(64)(rng.nextInt(255).toLong - 127))
    }
    val df = rows.toDF("i", "a", "b")
      .select(col("i"),
        LongDotExpression.longDot(col("a"), col("b")).as("got"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (s, x) => s + x).as("want"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(LongDotExpression.longDot(col("a"), col("b")).as("s")).first()
    assert(n.isNullAt(0))
    // mismatched lengths return NULL, like the zip_with form (whose null
    // padding poisons the aggregate sum) — never a truncated dot
    val m = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
      .select(LongDotExpression.longDot(col("a"), col("b")).as("s"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0L), (s, x) => s + x).as("want")).first()
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("compiled int8Encode == the Column-HOF quantization it replaced") {
    import graft.ops.Similarity
    // reference: the original declarative formulation, element for element
    val emb = graft.Tables.embeddings(spark, sf())
    val v = transform(col("embedding"), x => x.cast("double"))
    val ref = emb.select(col("vec_id").cast("long").as("id"), v.as("v"))
      .withColumn("__scale",
        aggregate(col("v"), lit(0.0), (m, x) => greatest(m, abs(x))) / lit(127.0))
      .withColumn("codes",
        when(col("__scale") === 0.0, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => round(x / col("__scale")).cast("long"))))
      .withColumn("__n2",
        aggregate(col("codes"), lit(0L), (s, c) => s + c * c))
      .select("id", "codes", "__n2")
    val got = Similarity.int8Encode(emb, "vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2))).toList
    assert(rows(got) == rows(ref) && rows(got).nonEmpty)
    // keepVec carries the double-cast vector through unchanged
    val kv = Similarity.int8Encode(emb, "vec_id", "embedding", keepVec = true)
    assert(kv.columns.toList == List("id", "vec", "codes", "__n2"))
    val zero = Seq((1L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val z = Similarity.int8Encode(zero, "vec_id", "embedding").first()
    assert(z.getSeq[Long](1) == Seq(0L, 0L) && z.getLong(2) == 0L)
    // degenerate inputs must not fail the job (round-20 ADVICE): a NaN
    // element mirrors round(double)-then-long-cast (NaN -> 0), and a null
    // embedding propagates a null codes row instead of NPE-ing
    val weird = Seq((1L, Some(Seq(Double.NaN, 1.0))),
      (2L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding")
    val w = Similarity.int8Encode(weird, "vec_id", "embedding")
      .orderBy("id").collect()
    // NaN loses the max-abs fold (NaN > m is false), so scale = 1/127;
    // the NaN quotient casts to 0, the finite element quantizes normally
    assert(w(0).getSeq[Long](1) == Seq(0L, 127L))
    assert(w(1).isNullAt(1))
  }

  test("rescoreJaccard sorted-merge kernel: pipeline results unchanged") {
    // end-to-end guard on the swap from array_intersect to the sorted merge:
    // exact jaccardPairs (ground truth on strings) == minhashNearDupPairs
    // (whose verify stage runs the new kernel) on a corpus with partial
    // overlaps, so |inter| and jaccard must be value-identical
    import graft.ops.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "omega psi chi phi"),
      (5L, "omega psi chi phi upsilon tau")).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b", "inter", "jaccard").orderBy("id_a", "id_b")
      .collect().toList
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .select("id_a", "id_b", "inter", "jaccard").orderBy("id_a", "id_b")
      .collect().toList
    assert(got == exact && exact.nonEmpty)
  }
}
