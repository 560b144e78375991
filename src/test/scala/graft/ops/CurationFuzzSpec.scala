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
