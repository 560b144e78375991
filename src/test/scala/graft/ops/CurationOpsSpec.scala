package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 curation operators — decontamination, boilerplate scoring,
  * bloom-gated reference dedup, temperature rebalancing, per-group top-k
  * (oracle-gated via x29–x33; these specs pin hand-checkable semantics).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contaminatedDocs: flags exactly the docs sharing an n-gram, with counts") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),      // shares "the quick brown" + "quick brown fox"
      (2L, "completely disjoint words here"),
      (3L, "quick brown fox runs away")).toDF("doc_id", "text")  // shares "quick brown fox"
    val bench = Seq((100L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    val got = Decontaminate.contaminatedDocs(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))  // doc1: "the quick brown" + "quick brown fox"; doc3: 1
    val clean = Decontaminate.removeContaminated(train, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("boilerplateScore: fraction of n-grams with df >= minDf, short docs drop") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),   // 3-grams: [abc, bcd] both shared with doc 2
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unique trigram content"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = BoilerplateFixture.collect(df)
    assert(got(1L) == (2L, 1.0))             // both 3-grams appear in doc 2 too
    assert(got(2L)._1 == 3L && got(2L)._2 == 2.0 / 3.0)
    assert(got(3L) == (2L, 0.0))
    assert(!got.contains(4L))                // < 3 words -> no n-grams -> absent
  }

  test("bloomDedupAgainst equals the plain anti-join (no false drops or keeps)") {
    val corpus = (1L to 300L).map(i => (i, s"document body number ${i % 60}"))
      .toDF("doc_id", "text")   // 60 distinct texts, each repeated 5x
    val ref = corpus.filter(col("doc_id") <= 20)   // texts 1..20 (mod 60)
    val got = Dedup.bloomDedupAgainst(corpus, ref, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    val want = corpus.join(ref.select(col("text")).distinct(), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty && got.length < 300)
  }

  test("temperatureRebalance: ceil(sqrt(n)*scale) per group, small groups keep more proportionally") {
    val df = ((1L to 400L).map(i => (i, "big")) ++ (401L to 425L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    val kept = Sampling.temperatureRebalance(df, "lang", "doc_id", scale = 1.0)
      .collect().map(r => r.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    assert(kept("big") == 20)    // ceil(sqrt(400)) — 5% of the big pile
    assert(kept("small") == 5)   // ceil(sqrt(25))  — 20% of the small one
    // deterministic: same membership on re-run
    val ids1 = Sampling.temperatureRebalance(df, "lang", "doc_id", 1.0)
      .select("doc_id").as[Long].collect().sorted
    val ids2 = Sampling.temperatureRebalance(df, "lang", "doc_id", 1.0)
      .select("doc_id").as[Long].collect().sorted
    assert(ids1.sameElements(ids2))
  }

  test("packSequences: exclusive-cumsum bins per shard, overflow doc straddles") {
    val df = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 900L), (4L, "s1", 10L),
      (5L, "s2", 100L)).toDF("doc_id", "source", "toks")
    val got = Sampling.packSequences(df, "source", "doc_id", col("toks"), budget = 500L)
      .select("doc_id", "bin_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s1 prefix sums (exclusive): 0, 300, 600, 1500 -> bins 0, 0, 1, 3
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 3L, 5L -> 0L))
  }

  test("topKPerGroup: k rows per group in order, deterministic tie-break") {
    val df = Seq(
      ("en", 1L, 10L), ("en", 2L, 30L), ("en", 3L, 30L), ("en", 4L, 5L),
      ("fr", 5L, 7L)).toDF("lang", "doc_id", "n_chars")
    val got = Sampling.topKPerGroup(df, "lang", 2,
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select("lang", "rank", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("en", 1, 2L), ("en", 2, 3L), ("fr", 1, 5L)))
  }

  test("budgetMix: sqrt-supply caps cut the big source sublinearly") {
    // big: 4 x 100 = 400 tokens (w = 20); small: 4 x 25 = 100 (w = 10).
    // budget 150 -> caps floor(150*20/30) = 100, floor(150*10/30) = 50:
    // ONE big doc fits (100 <= 100) but TWO small docs do (50 <= 50) —
    // the sublinear share: big holds 4x the tokens, gets only 2x the cap.
    val df = Seq(
      (1L, "big", 100L), (2L, "big", 100L), (3L, "big", 100L), (4L, "big", 100L),
      (5L, "small", 25L), (6L, "small", 25L), (7L, "small", 25L), (8L, "small", 25L))
      .toDF("doc_id", "source", "toks")
    val got = Sampling.budgetMix(df, "source", "doc_id", col("toks"), budget = 150L)
      .select("source", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(got == Map("big" -> 1, "small" -> 2), s"got $got")
    // a budget covering the whole supply selects everything
    val all = Sampling.budgetMix(df, "source", "doc_id", col("toks"), budget = 1500L)
      .select("doc_id").as[Long].collect().toSet
    assert(all == (1L to 8L).toSet)
  }

  test("budgetMix: selection is a prefix in hash order, never exceeds cap") {
    val df = (1L to 40L).map(i => (i, "s", 10L)).toDF("doc_id", "source", "toks")
    val sel = Sampling.budgetMix(df, "source", "doc_id", col("toks"), budget = 170L)
      .select("doc_id").as[Long].collect().toSet
    // one source: cap = floor(170 * w / w) = 170 -> 17 docs of 10 tokens
    assert(sel.size == 17)
    // the selected set must be the FIRST 17 in hash order (a prefix)
    val hashOrder = (1L to 40L).sortBy(id =>
      (((id * 2654435761L + 12345L) % 1000000007L) % 1000000L, id))
    assert(sel == hashOrder.take(17).toSet)
  }

  test("cdcChunkDedup: boundaries re-synchronize after an insertion") {
    // doc 2 prepends one token to doc 1's text: fixed windows all shift,
    // but every CDC chunk after the first boundary is shared — so doc 2
    // must report dup tokens even though no w-aligned window matches.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = Seq((1L, base), (2L, s"inserted $base")).toDF("doc_id", "text")
    val got = Dedup.cdcChunkDedup(df, "doc_id", "text", avgChunk = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (c1, u1, d1) = got(1L)
    val (c2, u2, d2) = got(2L)
    assert(u1 == c1 && d1 == 0L, "first occurrence keeps all its chunks")
    assert(d2 > 0L, s"shifted copy must share chunks after resync, got $got")
    assert(u2 < c2)
  }

  test("cdcChunkDedup: identical docs dedup fully; empty doc is (0,0,0)") {
    val df = Seq((1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "   ")).toDF("doc_id", "text")
    val got = Dedup.cdcChunkDedup(df, "doc_id", "text", avgChunk = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (c1, u1, d1) = got(1L)
    assert(u1 == c1 && d1 == 0L)
    val (c2, u2, d2) = got(2L)
    assert(c2 == c1 && u2 == 0L, "every chunk of the copy is a dup")
    assert(d2 == 8L, "all 8 tokens of the copy are duplicate tokens")
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("gopherFlags: each rule fires on its designed violation; clean doc keeps") {
    val goodText = (1 to 60).map(i => s"the quick brown fox number$i jumps over it and").mkString(" ")
    val df = Seq(
      (1L, goodText),                                        // passes everything
      (2L, "too few words here the and of"),                 // fails word count
      (3L, (1 to 60).map(_ => "### ## #").mkString(" ") + " the and of that be"), // symbol-heavy
      (4L, (1 to 60).map(i => s"- bullet the item $i of\n").mkString + "tail"),   // bullet-heavy
      (5L, (1 to 60).map(i => s"the item $i and of...\n").mkString)               // ellipsis-heavy
    ).toDF("doc_id", "text")
    val got = df.withColumn("g", TextAnalysis.gopherFlags(col("text")))
      .select(col("doc_id"), col("g.word_count_ok"), col("g.symbol_ratio_ok"),
        col("g.bullet_ok"), col("g.ellipsis_ok"), col("g.keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got(1L) == ((true, true, true, true, true)), s"clean doc must keep: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._5, "short doc fails word count")
    assert(!got(3L)._2 && !got(3L)._5, "symbol-heavy doc fails symbol ratio")
    assert(!got(4L)._3 && !got(4L)._5, "bullet-heavy doc fails bullet fraction")
    assert(!got(5L)._4 && !got(5L)._5, "ellipsis-heavy doc fails ellipsis fraction")
  }

  test("dsirLogWeights: target-like docs score positive, off-target negative, empty doc zero") {
    // target corpus speaks only 'aa bb cc'; raw has a target-like doc, an
    // off-target doc (tokens never seen in target), and an empty doc
    val target = (1L to 20L).map(i => (1000L + i, "aa bb cc aa bb cc")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "aa bb cc aa bb cc"),
      (2L, "zz yy xx zz yy xx"),
      (3L, "")).toDF("doc_id", "text")
    val got = Sampling.dsirLogWeights(raw, target, "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L)._1 == 6L && got(2L)._1 == 6L && got(3L)._1 == 0L)
    assert(got(1L)._2 > 0L && got(1L)._3, s"target-like doc must score positive: ${got(1L)}")
    assert(got(2L)._2 < 0L && !got(2L)._3, s"off-target doc must score negative: ${got(2L)}")
    assert(got(3L)._2 == 0L && !got(3L)._3, "empty doc scores zero and is not kept")
    // deterministic: identical on re-run
    val again = Sampling.dsirLogWeights(raw, target, "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(again == got)
  }

  test("bigram LM: hand-checked table cells; in-domain keeps, off-domain drops; short docs vacuous") {
    // h(aa)=80, h(bb)=94, h(cc)=108, h(dd)=122 at 256 buckets (first*7919 +
    // last*31 + len, mod 256). Target has bigram (aa,bb) x4 and (bb,aa) x3,
    // so ctx(80)=4, ctx(94)=3 and Laplace gives
    //   lp(aa,bb) = round((ln 5 - ln 260)*1e4) = -39512
    //   lp(bb,aa) = round((ln 4 - ln 259)*1e4) = -41705
    //   unseen cell (ctx 0): round((ln 1 - ln 256)*1e4) = -55452
    val target = Seq((1000L, "aa bb aa bb aa bb aa bb")).toDF("doc_id", "text")
    val table = Sampling.bigramLmTable(target, "doc_id", "text", buckets = 256)
    assert(table.length == 256 * 256)
    assert(table(80 * 256 + 94) == -39512L, s"lp(aa,bb) = ${table(80 * 256 + 94)}")
    assert(table(94 * 256 + 80) == -41705L, s"lp(bb,aa) = ${table(94 * 256 + 80)}")
    assert(table(0) == -55452L, s"unseen cell = ${table(0)}")
    val raw = Seq(
      (1L, "aa bb aa"),   // seen pairs: -39512 + -41705 = -81217, avg -40608.5
      (2L, "cc dd cc"),   // unseen pairs: 2 x -55452 = -110904, avg -55452
      (3L, ""), (4L, "solo")).toDF("doc_id", "text")
    val got = Sampling.bigramLmScore(raw, "doc_id", "text", table, minAvgE4 = 45000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((2L, -81217L, true)), s"in-domain: ${got(1L)}")
    assert(got(2L) == ((2L, -110904L, false)), s"off-domain: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, true)) && got(4L) == ((0L, 0L, true)),
      "docs with < 2 tokens carry no evidence and keep vacuously")
    // deterministic: the frozen table is the model — identical on re-run
    val t2 = Sampling.bigramLmTable(target, "doc_id", "text", buckets = 256)
    assert(java.util.Arrays.equals(table, t2))
  }

  test("perceptron: separates a separable corpus; frozen weights; bias-only empty doc") {
    // positive class speaks aa/bb/cc, negative zz/yy/xx — token buckets are
    // disjoint at 64 buckets, so the FIRST full-batch update already
    // separates the classes and later epochs are no-ops (batch perceptron
    // on separable data)
    val train = Seq(
      (1L, "aa bb cc aa", 0L), (2L, "aa cc bb bb", 0L), (3L, "cc cc aa bb", 0L),
      (4L, "zz yy xx zz", 1L), (5L, "zz xx yy yy", 1L), (6L, "xx xx zz yy", 1L)
    ).toDF("doc_id", "text", "cls")
    val w = Sampling.perceptronTrain(train, "doc_id", "text",
      positive = col("cls") === 0L, buckets = 64, epochs = 3)
    assert(w.length == 65, "weights are buckets+1 (bias last)")
    val score = Sampling.perceptronScore(
        train.select("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    (1L to 3L).foreach(i => assert(score(i)._2 > 0L && score(i)._3,
      s"positive doc $i must score positive: ${score(i)}"))
    (4L to 6L).foreach(i => assert(score(i)._2 < 0L && !score(i)._3,
      s"negative doc $i must score negative: ${score(i)}"))
    // balanced classes -> bias stays 0 -> an empty doc scores exactly 0
    val empty = Sampling.perceptronScore(
        Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", w)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).head
    assert(empty == ((0L, 0L, false)), s"empty doc is bias-only: $empty")
    // training is order-independent: shuffled input learns the same table
    val w2 = Sampling.perceptronTrain(train.orderBy(rand(42)), "doc_id",
      "text", positive = col("cls") === 0L, buckets = 64, epochs = 3)
    assert(w.toSeq == w2.toSeq, "full-batch updates are order-free")
  }

  test("perceptron posWeight: class weighting rescues a drowned rare positive") {
    // 1 positive vs 4 negatives, one epoch: the unweighted first-epoch
    // update sets bias = 1 - 4 = -3, drowning the positive's two +1
    // feature weights (margin 1+1-3 < 0); posWeight=4 balances the same
    // update (bias 4-4 = 0, features +4 each -> margin +8)
    val train = Seq(
      (1L, "aa bb", 1L), (2L, "cc dd", 0L), (3L, "ee ff", 0L),
      (4L, "gg hh", 0L), (5L, "ii jj", 0L)).toDF("doc_id", "text", "cls")
    def margin1(posWeight: Long): Long = {
      val w = Sampling.perceptronTrain(train, "doc_id", "text",
        positive = col("cls") === 1L, buckets = 64, epochs = 1,
        posWeight = posWeight)
      Sampling.perceptronScore(train.filter(col("cls") === 1L)
          .select("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => r.getLong(2)).head
    }
    assert(margin1(1L) < 0L, "unweighted: rare positive is drowned")
    assert(margin1(4L) > 0L, "weighted: same epoch separates it")
  }
}

/** Keeps the boilerplate expectations readable in the spec body. */
private object BoilerplateFixture {
  def collect(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    TextAnalysis.boilerplateScore(df, "doc_id", "text", n = 3, minDf = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
}
