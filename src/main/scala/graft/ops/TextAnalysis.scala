package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (north-star extension):
  * token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting — all pure Column expressions so they stay inside
  * whole-stage codegen and scan-pipeline at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens (empty strings from leading/trailing space removed). */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer regex family.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Tokenizer-REAL token count: a byte-pair-encoding merge walk over a
    * broadcast merge table (see [[graft.expressions.BpeVocab]] for the
    * exact semantics and the well-formedness precondition it validates).
    * This is the count a training-data pipeline budgets in —
    * `Sampling.packSequences` and `Sampling.budgetMix` take it directly as
    * their token-count column. Codegen'd expression; the table rides the
    * serialized plan once per executor, never per row.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeTokenCountExpression.bpeTokenCount(text, merges)

  /** Tokenizer-real ENCODE: `array<long>` token ids from the same walk —
    * code points for unmerged single characters,
    * `BpeVocab.MergedIdBase + rank` for merge outputs (see
    * [[graft.expressions.BpeEncodeExpression]]).
    * `size(bpeEncode(t, m)) === bpeTokenCount(t, m)` by construction.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeTokenCountExpression.bpeEncode(text, merges)

  /** A small well-formed demo merge table over the synthetic corpus's
    * vocabulary — each side is a single character or an earlier merge's
    * output (validated). Real deployments load a trained tokenizer's merge
    * list instead; the walk is identical.
    */
  val demoBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "r", "o" -> "r",
    "s" -> "p", "ar" -> "k", "sp" -> "ark", "l" -> "e", "t" -> "a",
    "ta" -> "b", "tab" -> "le", "r" -> "o", "ro" -> "w", "d" -> "a",
    "j" -> "o", "jo" -> "in", "q" -> "u", "s" -> "m", "a" -> "l",
    "sm" -> "al", "smal" -> "l", "f" -> "i", "l" -> "t", "fi" -> "lt",
    "filt" -> "er", "o" -> "n", "a" -> "t", "s" -> "t", "b" -> "at",
    "c" -> "h", "bat" -> "ch", "w" -> "in", "d" -> "o", "win" -> "do",
    "windo" -> "w")

  /** The DuckDB replay of [[bpeTokenCount]] for ONE whitespace-free word
    * expression: the word spelled as space-separated code points, each
    * merge applied as a string replace in rank order (twice — a replace
    * consumes the shared delimiter between adjacent occurrences, and for
    * a merge with DISTINCT sides one repeat provably reaches the fixpoint
    * since merged occurrences separate the survivors; equal-sided merges
    * are refused, see the guard), then the surviving token count. Exposed so
    * the oracle SQL is generated from the SAME merge list the Spark plan
    * uses — the two sides cannot drift.
    */
  def bpeOracleCountSql(wordExpr: String, merges: Seq[(String, String)]): String = {
    // the apply-each-replace-TWICE trick below reaches the fixpoint only
    // when a merge's two sides differ: for a merge (a, a), 'aaaa' needs
    // log(n) passes ('a a a a' -> 'aa aa' needs pass 1 AND 2 just for the
    // pairs, and 'a a a a a a' still holds an unmerged 'a a' after two) —
    // static replace nesting cannot replay that, so such tables are
    // refused HERE, at oracle-generation time (BpeVocab's lowest-rank
    // walk handles them fine; they just cannot be hash-gated this way).
    // Sides are also embedded in SQL string literals with space
    // delimiters: quotes are escaped, whitespace-bearing sides refused
    // (training can never produce one — words are whitespace-split).
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      require(a != b,
        s"BPE merge #$i ('$a','$a') has equal sides: the rank-order " +
          "double-replace SQL replay does not reach its fixpoint, so this " +
          "table cannot be oracle-gated (the engine-side count is fine)")
      require(!(a + b).exists(_.isWhitespace),
        s"BPE merge #$i ('$a','$b') contains whitespace: the SQL replay's " +
          "space-delimited token spelling cannot represent it")
    }
    s"len(${bpeOracleTokensSql(wordExpr, merges)})"
  }

  private def sqlQuote(s: String) = s.replace("'", "''")

  /** The walked token LIST (shared by count and encode replays). */
  private def bpeOracleTokensSql(wordExpr: String,
                                 merges: Seq[(String, String)]): String = {
    val spaced = s"' ' || array_to_string(string_split($wordExpr, ''), ' ') || ' '"
    val walked = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      val pat = s"' ${sqlQuote(a)} ${sqlQuote(b)} '"
      val rep = s"' ${sqlQuote(a)}${sqlQuote(b)} '"
      s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    s"string_split(trim($walked), ' ')"
  }

  /** The DuckDB replay of [[bpeEncode]] for ONE whitespace-free word
    * expression: the SAME rank-order replace walk as [[bpeOracleCountSql]]
    * (and its guards), but yielding the token id LIST instead of the
    * count — each surviving token mapped through a generated CASE: merge
    * outputs to `MergedIdBase + rank` (first producing merge wins, the
    * engine's putIfAbsent), single code points to `unicode(token)`.
    */
  def bpeOracleEncodeSql(wordExpr: String, merges: Seq[(String, String)]): String = {
    bpeOracleCountSql(wordExpr, merges)   // runs the shared guards
    val seen = scala.collection.mutable.HashSet[String]()
    val whens = merges.zipWithIndex.flatMap { case ((a, b), i) =>
      if (seen.add(a + b))
        Some(s"WHEN '${sqlQuote(a + b)}' THEN ${graft.expressions.BpeVocab.MergedIdBase + i}")
      else None
    }.mkString(" ")
    s"list_transform(${bpeOracleTokensSql(wordExpr, merges)}, " +
      s"t -> cast(CASE t $whens ELSE unicode(t) END AS BIGINT))"
  }

  /** Crude chars-per-token estimate of token inflation (quality signal). */
  def avgWordLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(wordCount(text), lit(1L)).cast("double"))

  def punctRatio(text: Column): Column =
    ((length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double"))

  private val enStop = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "mit")
  private val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour")
  private val esStop = Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por")

  private def stopHits(text: Column, stop: Seq[String]): Column =
    size(array_intersect_counted(tokens(lower(text)), stop))

  // count tokens (with multiplicity) that are in the stopword list
  private def array_intersect_counted(toks: Column, stop: Seq[String]): Column =
    filter(toks, t => t.isin(stop.map(s => s: Any): _*))

  /** Fraction of tokens that are English stopwords — quality + lang signal. */
  def stopwordRatio(text: Column): Column =
    stopHits(text, enStop).cast("double") /
      greatest(wordCount(text), lit(1L)).cast("double")

  /** N-gram-free language-ID heuristic: argmax of per-language stopword hit
    * counts, 'unk' when nothing matches. Deterministic tie-break by the
    * listed language order (en > de > fr > es).
    */
  def langIdHeuristic(text: Column): Column = {
    val en = stopHits(text, enStop); val de = stopHits(text, deStop)
    val fr = stopHits(text, frStop); val es = stopHits(text, esStop)
    val m = greatest(en, de, fr, es)
    // null text first: every when-condition below evaluates to null on null
    // input (treated as false), which would fall through to .otherwise("es")
    when(text.isNull, lit(null).cast("string"))
      .when(m === 0, "unk")
      .when(en === m, "en").when(de === m, "de")
      .when(fr === m, "fr").otherwise("es")
  }

  /** Composite quality score in [0,1]: length band + moderate punctuation +
    * stopword presence (the classic C4/Gopher-style cheap filters).
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(200, 10000), 0.4).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.1, 0.3).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.01, 0.3).otherwise(0.0)
    lenOk + punctOk + stopOk
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021, "Scaling
    * language models: methods, analysis & insights from training Gopher",
    * Appendix A quality heuristics): per-document boolean verdicts for the
    * standard cheap filters — word-count band, mean-word-length band,
    * symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alphabetic-word fraction, and the ≥2-distinct-stopwords requirement —
    * plus their conjunction as `keep`. Pure Column expressions (one struct
    * per row, no joins or shuffles), so the gate scan-pipelines at any
    * scale; every rule is exact integer/ratio arithmetic an external SQL
    * oracle replays bit-for-bit (counting via non-overlapping replace, so
    * both engines agree on '...' runs).
    */
  def gopherFlags(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val nD = greatest(n, lit(1L)).cast("double")
    val lines = array_remove(split(text, "\n"), "")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val hashCount = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellipsisCount =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val bulletLines = size(filter(lines, l => l.startsWith("-") || l.startsWith("*")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val gopherStop = array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)
    val stopDistinct = size(array_intersect(array_distinct(tokens(lower(text))), gopherStop))
    val wordCountOk = n.between(50L, 100000L)
    val meanWordLenOk = avgWordLen(text).between(3.0, 10.0)
    val symbolRatioOk = (hashCount + ellipsisCount).cast("double") / nD <= 0.1
    val bulletOk = bulletLines.cast("double") / nLines <= 0.9
    val ellipsisOk = ellipsisLines.cast("double") / nLines <= 0.3
    val alphaOk = alphaWords.cast("double") / nD >= 0.8
    val stopwordOk = stopDistinct >= 2
    struct(
      n.as("n_words"),
      wordCountOk.as("word_count_ok"),
      meanWordLenOk.as("mean_word_len_ok"),
      symbolRatioOk.as("symbol_ratio_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      (wordCountOk && meanWordLenOk && symbolRatioOk && bulletOk &&
        ellipsisOk && alphaOk && stopwordOk).as("keep"))
  }

  /** TF-IDF top-k terms per document — the classic keyword-extraction /
    * near-dup-feature weighting, shaped as two aggregations + a window
    * (linear shuffles; document frequency is a broadcastable dimension).
    */
  def tfIdfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"),
        explode(array_remove(split(lower(col(textCol)), "\\s+"), "")).as("term"))
    // tf feeds BOTH the document-frequency aggregate and the ranked join —
    // materialize it once, or Spark re-runs the corpus-wide explode+groupBy
    // (the expensive pass at 100 TB) for each consumer
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.count()   // corpus-size scalar (dimension metadata, not data)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Word n-grams (lower-cased, space-joined); empty array when the document
    * has fewer than n words. Pure Column expression — scan-pipelined.
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOf(tokens(lower(text)), n)

  /** Word n-grams from an ALREADY-TOKENIZED array column. Corpus-scale
    * callers should project the token array into a real column first and
    * pass the attribute: referenced inside the transform lambda, a derived
    * `toks` EXPRESSION is re-evaluated per n-gram index (tokenization goes
    * O(words²) per document), while a bound attribute is computed once per
    * row — the difference was ~6× on the sf0.1 n-gram queries.
    */
  def wordNgramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** 64-bit n-gram hashes straight off the token array, for callers that
    * only need a join/distinct KEY and never the n-gram's surface form.
    * Multi-argument xxhash64 over the n token slots replaces the
    * slice + concat_ws string build of wordNgramsOf — no per-index array
    * or string allocation, and (tokens being whitespace-free) the same
    * identity: two n-grams collide only with P ≈ pairs/2^64, which can at
    * most ADD a phantom match downstream.
    */
  def ngramHashesOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64((0 until n).map(j => element_at(toks, i + lit(j))): _*)))

  /** Repeated-n-gram fraction: 1 − distinct/total n-grams (0 for short docs) —
    * the Gopher/MassiveText-style repetition filter (boilerplate, spam, and
    * degenerate generations score high). Exact integer ratio in double math,
    * so any ANSI engine reproduces it bit-for-bit.
    */
  def repetitionScore(text: Column, n: Int): Column = {
    val gs = wordNgrams(text, n)
    when(size(gs) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(gs)).cast("double") / size(gs).cast("double"))
  }

  /** Cross-document boilerplate score: the fraction of a document's distinct
    * word n-grams that are corpus-common (document frequency >= minDf) — the
    * C4/CCNet-style signal for navigation chrome, license headers, and
    * templated spam that repeat across many pages. Documents shorter than n
    * words have no n-grams and drop out.
    *
    * Shape: one n-gram explode feeding both the document-frequency aggregate
    * and the per-doc rejoin — materialized once (at 100 TB the explode IS
    * the corpus pass; running it twice doubles the job). Both shuffles key
    * on the n-gram / doc id, linear in corpus n-grams.
    */
  def boilerplateScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, n: Int,
                       minDf: Long): org.apache.spark.sql.DataFrame = {
    val g = df.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(wordNgramsOf(col("__toks"), n))).as("ng"))
      .localCheckpoint(true)
    val dfreq = g.groupBy(col("ng")).agg(count(lit(1)).as("df"))
    g.join(dfreq, Seq("ng"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("__common"))
      .select(col("doc_id"), col("n_ngrams"),
        (col("__common").cast("double") / col("n_ngrams").cast("double"))
          .as("boilerplate_frac"))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram distribution — the cheap stand-in for the CCNet/KenLM perplexity
    * quality signal (gibberish and boilerplate sit in the tails). Shape: one
    * token-keyed aggregation for the frequency table, a scalar total, one
    * token-keyed join back, one doc-keyed aggregation — all linear shuffles;
    * the frequency table is Zipf-bounded (vocabulary, not corpus, sized).
    */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("tot"))
    toks.join(freq, Seq("tok"))
      .crossJoin(tot)   // 1-row scalar: broadcast nested-loop, no shuffle
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("cnt").cast("double") / col("tot").cast("double")))
          .as("avg_logprob"))
  }

  /** PII scrubbing for training corpora: emails, phone-shaped digit runs
    * with separators, and long bare digit runs are replaced by typed
    * placeholder tags. Plain regexp_replace chain (codegen'd, portable
    * regex — no lookbehind/lookahead, so RE2-family engines agree).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
        lit("\\+\\d[\\d-]{7,}\\d"), lit("<PHONE>")),
      lit("\\b\\d{7,}\\b"), lit("<NUM>"))

  /** Order-sensitive rolling document fingerprint over words:
    * h = (h*31 + ascii(first char)*256 + len(word)) mod 1e9+7.
    * A pure left fold — unlike the bag-of-words hashes, word order matters,
    * so reorderings fingerprint differently.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), w =>
        ascii(w).cast("long") * 256L + length(w).cast("long")),
      lit(0L), (h, v) => pmod(h * 31L + v, lit(1000000007L)))

  /** Corpus-wide most-common word n-grams by document frequency — the
    * report a boilerplate blocklist is seeded from. Exact top-k WITHOUT
    * ever shuffling n-gram strings: document frequency is counted on
    * 8-byte ngramHashesOf keys (one narrow corpus shuffle), the k-th df
    * value bounds a candidate hash set (k plus boundary ties), and ONE
    * second corpus pass recovers the candidates' surface strings through
    * a broadcast semi-join — rows surviving it are bounded by the
    * candidates' own document frequencies, not the corpus. Final order
    * (df desc, ng asc) matches the single-pass string groupBy, ties at
    * the boundary included; a hash collision could only merge two grams'
    * counts (P ≈ grams²/2^64, and the string-keyed oracle would surface
    * it).
    */
  def topNgramsByDf(df: org.apache.spark.sql.DataFrame, textCol: String,
                    n: Int, k: Int): org.apache.spark.sql.DataFrame = {
    val toksDf = df.select(tokens(lower(col(textCol))).as("__toks"))
    val hashDf = toksDf
      .select(explode(array_distinct(ngramHashesOf(col("__toks"), n))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)   // feeds the threshold probe AND the candidate filter
    val kth = hashDf.orderBy(col("df").desc).limit(k)
      .agg(min(col("df")).as("__t"))
    val cand = hashDf.join(broadcast(kth), col("df") >= col("__t"))
      .select("h", "df")
    val parts = split(col("ng"), " ")
    val surf = toksDf
      .select(explode(array_distinct(wordNgramsOf(col("__toks"), n))).as("ng"))
      .withColumn("h",
        xxhash64((0 until n).map(i => element_at(parts, i + 1)): _*))
    // survivor pass aggregates per 8-byte hash with map-side partials BEFORE
    // the exchange: a dominant boilerplate gram contributes at most one
    // (h, ng, df) row per partition to the shuffle, so a skewed corpus can't
    // re-skew the string shuffle the hash counting avoided. min(ng) is the
    // same value for every survivor of a hash (modulo the 2^-64 collision,
    // which the hash-keyed df count already accepted and the string-keyed
    // oracle would surface).
    surf.join(broadcast(cand), Seq("h"))
      .groupBy(col("h"), col("df")).agg(min(col("ng")).as("ng"))
      .select(col("ng"), col("df"))
      .orderBy(col("df").desc, col("ng").asc)
      .limit(k)
  }

  /** Cross-source content-overlap matrix: for every pair of sources, the
    * number of distinct word n-grams they share — the leakage/plagiarism
    * report that tells a curation run which feeds are republishing which
    * (and which "independent" sources to collapse before per-source
    * mixture weights are set).
    *
    * Shape: ONE corpus scan — explode n-gram hashes, collect_set(source)
    * per gram (map-side partial aggregation caps every partition's
    * contribution at the source count, so corpus-common grams don't skew
    * the shuffle), then expand each gram's sorted source set into its
    * ordered pairs (≤ sources²/2, a report-sized bound) and count. No
    * self-join, no broadcast of a corpus-scale index. Keys are 8-byte
    * hashes (ngramHashesOf); a collision can only add one phantom shared
    * gram.
    */
  def sourceNgramOverlap(df: org.apache.spark.sql.DataFrame, srcCol: String,
                         textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(srcCol).as("src"), tokens(lower(col(textCol))).as("__toks"))
      .select(col("src"), explode(array_distinct(
        ngramHashesOf(col("__toks"), n))).as("ngh"))
      .groupBy(col("ngh"))
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(col("srcs"),
        (a, i) => transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
          b => struct(a.as("src_a"), b.as("src_b")))))).as("p"))
      .groupBy(col("p").getField("src_a").as("src_a"),
        col("p").getField("src_b").as("src_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
}
