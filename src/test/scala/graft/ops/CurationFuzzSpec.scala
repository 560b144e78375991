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
}
