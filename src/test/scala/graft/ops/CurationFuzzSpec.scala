package graft.ops

import graft.SparkSpec
import scala.util.Random

/** Differential fuzz tests: random small corpora run through the Spark
  * operators and through independent plain-Scala reference implementations;
  * outputs must agree exactly on every trial. Seeded, so failures replay.
  */
class CurationFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def corpus(rng: Random, n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      (i.toLong,
        Seq.fill(1 + rng.nextInt(24))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }

  test("fuzz: spanDedup matches a local first-occurrence reference on random corpora") {
    val rng = new Random(42)
    for (_ <- 1 to 8) {
      val docs = corpus(rng, 4 + rng.nextInt(10))
      val w = 1 + rng.nextInt(3)
      // reference: chunk locally, keep globally-first (doc, pos) per chunk
      val chunks = docs.flatMap { case (id, t) =>
        t.split(" ").grouped(w).zipWithIndex.map { case (c, p) => (id, p, c.mkString(" ")) }
      }
      val winners = chunks.groupBy(_._3).map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
      val expected = docs.map { case (id, _) =>
        val keep = chunks.filter(c => c._1 == id && winners(c)).sortBy(_._2)
        (id, chunks.count(_._1 == id).toLong, keep.size.toLong, keep.map(_._3).mkString(" "))
      }
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"w=$w docs=$docs")
    }
  }

  test("fuzz: spanDedupAgainst matches a local sliding-gram containment reference") {
    val rng = new Random(23)
    for (_ <- 1 to 8) {
      val docs = corpus(rng, 6 + rng.nextInt(10))
      val w = 1 + rng.nextInt(3)
      val (ref, train) = docs.partition(_._1 % 3 == 0)
      // reference model: a corpus chunk is stripped iff its token run appears
      // contiguously anywhere in the reference (any offset, any length 1..w)
      val refGrams = ref.flatMap { case (_, t) =>
        val toks = t.split(" ")
        (1 to w).flatMap(g => toks.sliding(g).filter(_.length == g).map(_.mkString(" ")))
      }.toSet
      val expected = train.sortBy(_._1).map { case (id, t) =>
        val chunks = t.split(" ").grouped(w).map(_.mkString(" ")).toSeq
        val kept = chunks.filterNot(refGrams)
        (id, chunks.size.toLong, kept.size.toLong, kept.mkString(" "))
      }
      val got = Dedup.spanDedupAgainst(
          train.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"w=$w docs=$docs")
    }
  }

  test("fuzz: contaminatedDocs matches a local shared-n-gram reference") {
    val rng = new Random(7)
    for (_ <- 1 to 8) {
      val docs = corpus(rng, 6 + rng.nextInt(10))
      val n = 2 + rng.nextInt(2)
      def grams(t: String): Set[String] =
        t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val (bench, train) = docs.partition(_._1 % 3 == 0)
      val benchGrams = bench.flatMap(d => grams(d._2)).toSet
      val expected = train
        .map { case (id, t) => (id, grams(t).count(benchGrams).toLong) }
        .filter(_._2 > 0).sortBy(_._1)
      val got = Decontaminate.contaminatedDocs(
          train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, s"n=$n docs=$docs")
    }
  }

  private def localCos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.max(1e-300, math.sqrt(na) * math.sqrt(nb))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fuzz: kmeansAssign matches a local Lloyd reference (rounded updates, cosine argmax)") {
    val rng = new Random(11)
    for (_ <- 1 to 5) {
      val dims = 3 + rng.nextInt(4)
      // snap to float precision up front: the DataFrame column is float32,
      // so the reference must fold over the same values
      val vecs = (0 until 12 + rng.nextInt(12)).map { i =>
        (i.toLong, Seq.fill(dims)((rng.nextDouble() * 2 - 1).toFloat.toDouble))
      }
      val k = 2 + rng.nextInt(2)
      val init = (0 until k).map(c => (c, vecs(c)._2)).toArray
      val iters = rng.nextInt(3)
      // local reference
      var cents: Seq[(Int, Seq[Double])] = init.toSeq.sortBy(_._1)
      def assign(cs: Seq[(Int, Seq[Double])]): Map[Long, Int] =
        vecs.map { case (id, v) =>
          id -> cs.map { case (cl, c) => (localCos(v, c), cl) }
            .maxBy { case (cos, cl) => (cos, -cl) }._2
        }.toMap
      for (_ <- 0 until iters) {
        val a = assign(cents)
        cents = vecs.groupBy(v => a(v._1)).toSeq.sortBy(_._1).map { case (cl, members) =>
          val mean = (0 until dims).map(d => round4(members.map(_._2(d)).sum / members.size))
          (cl, mean)
        }
      }
      val expected = assign(cents)
      val vf = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val got = Similarity.kmeansAssign(
          vf.selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS embedding"),
          "embedding", init, iters)
        .select("vec_id", "cluster").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"iters=$iters k=$k dims=$dims")
    }
  }

  test("fuzz: sourceNgramOverlap matches a local pairwise-intersection reference") {
    val rng = new Random(99)
    for (_ <- 1 to 8) {
      val srcs = Vector("s0", "s1", "s2", "s3")
      val docs = corpus(rng, 8 + rng.nextInt(8))
        .map { case (id, t) => (srcs(rng.nextInt(srcs.size)), t) }
      val n = 2
      def grams(t: String): Set[String] =
        t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val bySrc = docs.groupBy(_._1).view.mapValues(_.flatMap(d => grams(d._2)).toSet).toMap
      val expected = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        shared = (bySrc(a) & bySrc(b)).size if shared > 0
      } yield (a, b, shared.toLong)).toSeq.sorted
      val got = TextAnalysis.sourceNgramOverlap(docs.toDF("source", "text"), "source", "text", n)
        .orderBy("src_a", "src_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == expected, s"docs=$docs")
    }
  }

  test("fuzz: boilerplateStrip matches a local doc-frequency reference") {
    val rng = new Random(91)
    for (_ <- 1 to 8) {
      val docs = corpus(rng, 5 + rng.nextInt(10))
      val w = 1 + rng.nextInt(3)
      val minDf = 2 + rng.nextInt(2)
      val chunks = docs.flatMap { case (id, t) =>
        t.split(" ").grouped(w).zipWithIndex.map { case (c, p) => (id, p, c.mkString(" ")) }
      }
      // reference: a chunk is boilerplate iff it occurs in >= minDf DISTINCT docs
      val boiler = chunks.groupBy(_._3).collect {
        case (c, occ) if occ.map(_._1).distinct.size >= minDf => c
      }.toSet
      val expected = docs.map { case (id, _) =>
        val mine = chunks.filter(_._1 == id).sortBy(_._2)
        val kept = mine.filterNot(c => boiler(c._3))
        (id, mine.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
      }
      val got = Dedup.boilerplateStrip(docs.toDF("doc_id", "text"),
          "doc_id", "text", w, minDf.toLong)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"w=$w minDf=$minDf docs=$docs")
    }
  }

  test("fuzz: perceptron train+score matches a local full-batch reference") {
    val rng = new Random(58)
    for (_ <- 1 to 8) {
      val docs = corpus(rng, 6 + rng.nextInt(10))
      val buckets = 16 + rng.nextInt(49)
      val epochs = 1 + rng.nextInt(3)
      val posWeight = 1L + rng.nextInt(5)
      def bucket(t: String): Int =
        ((t.head.toInt * 7919 + t.last.toInt * 31 + t.length) % buckets).toInt
      val feats = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).map(bucket)
      }.toMap
      val y = docs.map { case (id, _) =>
        id -> (if (id % 2 == 0) posWeight else -1L) }.toMap
      // reference: full-batch updates, bias as pseudo-bucket `buckets`
      val wRef = Array.fill(buckets + 1)(0L)
      for (_ <- 1 to epochs) {
        val margins = docs.map { case (id, _) =>
          id -> (wRef(buckets) + feats(id).map(b => wRef(b)).sum) }.toMap
        val miscl = docs.filter { case (id, _) => y(id) * margins(id) <= 0L }
        val upd = Array.fill(buckets + 1)(0L)
        miscl.foreach { case (id, _) =>
          (feats(id) :+ buckets).foreach(b => upd(b) += y(id)) }
        (0 to buckets).foreach(b => wRef(b) += upd(b))
      }
      val w = Sampling.perceptronTrain(docs.toDF("doc_id", "text"),
        "doc_id", "text", positive = org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(2L)) === 0L,
        buckets = buckets, epochs = epochs, posWeight = posWeight)
      assert(w.toSeq == wRef.toSeq,
        s"buckets=$buckets epochs=$epochs posWeight=$posWeight docs=$docs")
      val expected = docs.sortBy(_._1).map { case (id, _) =>
        val m = wRef(buckets) + feats(id).map(b => wRef(b)).sum
        (id, feats(id).length.toLong, m, m > 0L)
      }
      val got = Sampling.perceptronScore(docs.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      assert(got == expected, s"buckets=$buckets docs=$docs")
    }
  }
}
