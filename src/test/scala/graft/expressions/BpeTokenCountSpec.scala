package graft.expressions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The BPE token counter (round-17 verdict item 2): exact-semantics tests
  * against hand-walked words, the equivalence PROPERTY the oracle relies
  * on (lowest-rank-first merging == rank-order replay, for well-formed
  * tables — proven in [[BpeVocab]]'s doc, checked here on random inputs),
  * the well-formedness validation, and the packSequences consumer.
  */
class BpeTokenCountSpec extends SparkSpec {

  private val demo = TextAnalysis.demoBpeMerges
  private val vocab = new BpeVocab(demo)

  /** Reference implementation of the ORACLE's literal semantics: merges
    * applied in rank order, each to its leftmost-non-overlapping fixpoint.
    * Deliberately the dumb O(merges × word) walk the SQL replays.
    */
  private def rankOrderCount(word: String, merges: Seq[(String, String)]): Long = {
    var toks = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        val out = Vector.newBuilder[String]
        var j = 0
        changed = false
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += (a + b); j += 2; changed = true
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
      }
    }
    toks.length.toLong
  }

  test("hand-walked words over the demo table") {
    assert(vocab.countWord("spark") === 1L)     // s p ar k -> sp ark -> spark
    assert(vocab.countWord("table") === 1L)     // le, ta, tab, table
    assert(vocab.countWord("the") === 1L)
    assert(vocab.countWord("that") === 2L)      // th + at
    assert(vocab.countWord("window") === 1L)
    assert(vocab.countWord("batch") === 1L)
    assert(vocab.countWord("filter") === 1L)
    assert(vocab.countWord("zzz") === 3L)       // no merge applies
    assert(vocab.countTokens("the spark table") === 3L)
    assert(vocab.countTokens("  the   spark  ") === 2L)
    assert(vocab.countTokens("") === 0L)
  }

  test("lowest-rank-first equals rank-order replay on random corpus-ish words") {
    val rnd = new scala.util.Random(17)
    val alphabet = "thesparkblowdjinquc".toCharArray
    (1 to 2000).foreach { _ =>
      val w = Array.fill(1 + rnd.nextInt(24))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(vocab.countWord(w) === rankOrderCount(w, demo), s"word '$w'")
    }
  }

  test("equivalence also holds for random well-formed merge tables") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      // random well-formed table over {a,b,c}: each merge pairs two
      // already-known tokens, so the precondition holds by construction
      val known = scala.collection.mutable.ArrayBuffer("a", "b", "c")
      val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
      (1 to 12).foreach { _ =>
        val x = known(rnd.nextInt(known.size))
        val y = known(rnd.nextInt(known.size))
        if ((x + y).length <= 8) { merges += ((x, y)); known += (x + y) }
      }
      val v = new BpeVocab(merges.toSeq)
      (1 to 20).foreach { _ =>
        val w = Array.fill(1 + rnd.nextInt(16))(
          "abc".charAt(rnd.nextInt(3))).mkString
        assert(v.countWord(w) === rankOrderCount(w, merges.toSeq),
          s"word '$w' table $merges")
      }
    }
  }

  test("malformed merge tables fail loudly at construction") {
    val e = intercept[IllegalArgumentException](
      new BpeVocab(Seq("th" -> "e")))   // 'th' never defined
    assert(e.getMessage.contains("well-formed"))
    intercept[IllegalArgumentException](new BpeVocab(Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeTokenCount(lit("x"), Seq("ab" -> "c")))
    // valid: single code points and prior outputs
    new BpeVocab(Seq("a" -> "b", "ab" -> "c", "ab" -> "abc"))
  }

  test("column expression: codegen path, nulls, and packSequences consumer") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "the spark table"),
      (2L, "s1", null.asInstanceOf[String]),
      (3L, "s1", "spark spark spark"),
      (4L, "s2", "zzz that")).toDF("doc_id", "source", "text")
    val counted = df.select(col("doc_id"),
      TextAnalysis.bpeTokenCount(col("text"), demo).as("n"))
      .orderBy(col("doc_id")).collect()
    assert(counted.toSeq === Seq(Row(1L, 3L), Row(2L, null), Row(3L, 3L), Row(4L, 5L)))

    val packed = graft.ops.Sampling.packSequences(
      df.na.fill("", Seq("text")), "source", "doc_id",
      TextAnalysis.bpeTokenCount(col("text"), demo), budget = 2L)
      .select(col("doc_id"), col("bin_id")).orderBy(col("doc_id")).collect()
    // s1 exclusive prefix sums: doc1 0 -> bin 0; doc2 3 -> bin 1;
    // doc3 3 -> bin 1. s2 restarts: doc4 0 -> bin 0.
    assert(packed.toSeq === Seq(Row(1L, 0L), Row(2L, 1L), Row(3L, 1L), Row(4L, 0L)))
  }
}
