package graft.ops

import graft.SparkSpec
import graft.expressions.BpeVocab
import org.apache.spark.sql.functions._

/** BPE training (histogram-driven): the classic textbook example, the
  * well-formedness-by-construction guarantee, determinism, the
  * compression property, and the end-to-end corpus round trip into the
  * counting expression.
  */
class BpeTrainerSpec extends SparkSpec {

  test("the classic low/lower/newest example merges as published") {
    // Sennrich et al.'s running example family: most frequent pair first,
    // ties to the lexicographically smaller pair
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeTrainer.trainOnHistogram(hist, numMerges = 4, minPairCount = 2)
    // 'es' appears 9x (newest+widest), 'est' then 9x, 'lo' 7x, 'low' 7x
    assert(merges.take(4) === Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
  }

  test("trained tables are well-formed by construction and deterministic") {
    val hist = Array(("abracadabra", 10L), ("cadabra", 7L), ("arcade", 5L),
      ("abide", 3L), ("bead", 2L))
    val m1 = BpeTrainer.trainOnHistogram(hist, 20, minPairCount = 2)
    val m2 = BpeTrainer.trainOnHistogram(hist, 20, minPairCount = 2)
    assert(m1 === m2, "training must be deterministic on a fixed histogram")
    new BpeVocab(m1)   // validates: each side a code point or earlier output
    assert(m1.nonEmpty)
  }

  test("minPairCount stops training before useless merges") {
    val hist = Array(("ab", 1L), ("cd", 1L))   // every pair occurs once
    assert(BpeTrainer.trainOnHistogram(hist, 10, minPairCount = 2).isEmpty)
    // with the floor at 1 the unique pairs do merge
    assert(BpeTrainer.trainOnHistogram(hist, 10, minPairCount = 1).nonEmpty)
  }

  test("corpus round trip: learn, count, and compress against char count") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val merges = BpeTrainer.learnBpe(docs, "text", numMerges = 200)
    // the corpus vocabulary is tiny: training exhausts all >=2-count pairs
    // before the budget (measured 89 merges) — the early stop is the point
    assert(merges.size > 50 && merges.size <= 200, s"got ${merges.size} merges")
    val vocab = new BpeVocab(merges)
    assert(vocab.countWord("the") <= 2, "frequent corpus words must compress")

    val agg = docs.agg(
      sum(TextAnalysis.bpeTokenCount(col("text"), merges)).as("bpe"),
      sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"),
      sum(TextAnalysis.wordCount(col("text"))).as("words")).first()
    val (bpe, chars, words) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(bpe < chars, "BPE tokens must compress below raw characters")
    assert(bpe >= words, "a word can never count fewer than 1 token")
    // the corpus vocabulary is tiny, so 200 merges should cover most words
    // entirely: tokens land much nearer word count than char count
    assert(bpe < chars / 2, s"weak compression: $bpe tokens vs $chars chars")
  }

  test("overlapping-pair accounting survives (the 'aaaa' families)") {
    val hist = Array(("aaaa", 4L), ("aaab", 3L), ("baaa", 2L))
    val merges = BpeTrainer.trainOnHistogram(hist, 10, minPairCount = 2)
    val vocab = new BpeVocab(merges)
    // whatever the table, applying it must be consistent (no crash, counts
    // in bounds) — the incremental pair bookkeeping on overlapping runs is
    // the regression surface here
    Seq("aaaa", "aaab", "baaa", "aaaaaaaa").foreach { w =>
      val c = vocab.countWord(w)
      assert(c >= 1 && c <= w.length, s"'$w' -> $c")
    }
  }

  test("a binding vocab cap is loud; a non-binding one is silent") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    // the corpus has far more than 8 distinct words: the cap binds
    val ex = intercept[IllegalStateException] {
      BpeTrainer.learnBpe(docs, "text", numMerges = 5, maxVocabWords = 8,
        failOnTruncatedVocab = true)
    }
    assert(ex.getMessage.contains("truncated"))
    // default mode proceeds (warns) on the same binding cap …
    assert(BpeTrainer.learnBpe(docs, "text", numMerges = 5,
      maxVocabWords = 8).nonEmpty)
    // … and a non-binding cap trains identically with the flag up
    val loud = BpeTrainer.learnBpe(docs, "text", numMerges = 5,
      maxVocabWords = 1000000, failOnTruncatedVocab = true)
    val quiet = BpeTrainer.learnBpe(docs, "text", numMerges = 5)
    assert(loud === quiet)
    // Int.MaxValue is the natural "uncapped" spelling: the +1 detection
    // fetch must not overflow into a negative limit
    assert(BpeTrainer.learnBpe(docs, "text", numMerges = 5,
      maxVocabWords = Int.MaxValue, failOnTruncatedVocab = true) === quiet)
  }

  test("bpe_encode: ids agree with the count walk and with the id scheme") {
    val demo = TextAnalysis.demoBpeMerges
    // id scheme driver-side: merge outputs >= MergedIdBase + first rank,
    // unmerged single characters their code point
    val v = BpeVocab.interned(demo)
    assert(v.encodeWord("the").toSeq === Seq(BpeVocab.MergedIdBase + 1),
      "'the' is the output of merge rank 1 (th+e)")
    assert(v.encodeWord("z").toSeq === Seq('z'.toLong))
    assert(v.encodeWord("thez").toSeq === Seq(BpeVocab.MergedIdBase + 1, 'z'.toLong))
    // distributed: size(encode) == count on every corpus row
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val drift = docs.select(
        size(TextAnalysis.bpeEncode(col("text"), demo)).cast("long").as("sz"),
        TextAnalysis.bpeTokenCount(col("text"), demo).as("cnt"))
      .filter(col("sz") =!= col("cnt")).count()
    assert(drift === 0L, "encode length must equal the token count everywhere")
  }

  test("sequence packing consumes real encoded ids identically to the count") {
    val demo = TextAnalysis.demoBpeMerges
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("text"))
    def packed(cnt: org.apache.spark.sql.Column) =
      Sampling.packSequences(docs, "source", "doc_id", cnt, budget = 512L)
        .select("doc_id", "n_tokens", "bin_id").orderBy("doc_id")
        .collect().toSeq
    val viaCount = packed(TextAnalysis.bpeTokenCount(col("text"), demo))
    val viaIds = packed(size(TextAnalysis.bpeEncode(col("text"), demo)).cast("long"))
    assert(viaCount === viaIds)
    assert(viaCount.nonEmpty)
  }

  test("oracle SQL generation refuses equal-sided merges and escapes quotes") {
    // ('a','a') over 'aaaaaa': the engine walk gives 3 tokens, a static
    // double-replace replay gives 4 — the drift the guard exists to stop
    assert(new BpeVocab(Seq("a" -> "a")).countWord("aaaaaa") === 3L)
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bpeOracleCountSql("word", Seq("a" -> "a"))
    }
    assert(ex.getMessage.contains("equal sides"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeOracleCountSql("word", Seq("a" -> " "))
    }
    // a single quote in a merge side must be doubled in the SQL literal
    val sql = TextAnalysis.bpeOracleCountSql("word", Seq("'" -> "s"))
    assert(sql.contains("' '' s '") && sql.contains("' ''s '"),
      s"quote not escaped in: $sql")
  }
}
