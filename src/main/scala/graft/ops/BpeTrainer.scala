package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table TRAINING over a corpus — the published histogram
  * formulation (Sennrich et al. 2016; the shape HuggingFace tokenizers
  * productionizes): ONE distributed word-count aggregate reduces the
  * corpus to its distinct-word histogram, and training then runs on the
  * histogram alone — pair statistics weighted by word counts — never
  * touching the corpus again. At 100 TB the Spark side is a single
  * groupBy(word) (the same shuffle class as any token aggregate) and the
  * driver holds `maxVocabWords` (word, count) rows, the same bounded-
  * codebook envelope the ANN/IVF paths use; corpus size only changes the
  * one aggregate's cost.
  *
  * Driver training is the standard incremental algorithm: maintain
  * pair -> weighted count and pair -> containing-words; each step takes
  * the most frequent pair (ties to the lexicographically smallest — a
  * total order, so training is DETERMINISTIC given the histogram), merges
  * it leftmost-non-overlapping in exactly the affected words, and updates
  * only their pair counts (a lazy max-heap with stale-entry skipping
  * makes selection O(log P) instead of a full rescan per merge). The
  * result is well-formed BY CONSTRUCTION — every merge side is a single
  * code point or an earlier merge's output — so it feeds
  * [[graft.expressions.BpeVocab]] (which re-validates) and the x69
  * counting/packing machinery directly.
  */
object BpeTrainer {

  /** Learn up to `numMerges` merges. `minPairCount` stops training once
    * the best pair's weighted count falls below it (merging a pair that
    * occurs once compresses nothing); `maxVocabWords` caps driver state,
    * keeping the most frequent words (deterministic count-then-word
    * order). A BINDING cap is never silent: the histogram fetch takes one
    * extra row, so truncation is detected in the same aggregate — it
    * either warns (default: the dropped words are the rarest, the usual
    * BPE practice) or raises when `failOnTruncatedVocab` is set.
    */
  def learnBpe(df: DataFrame, textCol: String, numMerges: Int,
               minPairCount: Long = 2L,
               minWordCount: Long = 1L,
               maxVocabWords: Int = 1000000,
               failOnTruncatedVocab: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val fetched: Array[(String, Long)] = df
      .select(explode(array_remove(split(col(textCol), "\\s+"), "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minWordCount)
      .orderBy(col("n").desc, col("word").asc)
      // +1 detects a binding cap; Long-guarded so maxVocabWords =
      // Int.MaxValue (the natural "uncapped" spelling) cannot overflow
      // into a negative limit
      .limit(math.min(maxVocabWords.toLong + 1L, Int.MaxValue.toLong).toInt)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (fetched.length > maxVocabWords) {
      val msg = s"BPE vocab histogram truncated: the corpus has more than " +
        s"$maxVocabWords distinct words passing minWordCount=$minWordCount; " +
        "training proceeds on the most frequent ones (pair statistics from " +
        "the dropped tail are lost). Raise maxVocabWords or minWordCount " +
        "to silence this."
      if (failOnTruncatedVocab) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    trainOnHistogram(fetched.take(maxVocabWords), numMerges, minPairCount)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The driver-side trainer, exposed for specs (and for callers that
    * already hold a histogram — a re-train over a saved word table).
    */
  private[graft] def trainOnHistogram(hist: Array[(String, Long)],
                                      numMerges: Int,
                                      minPairCount: Long): Seq[(String, String)] = {
    // word states as code-point symbol arrays
    val counts = hist.map(_._2)
    val words: Array[Array[String]] = hist.map { case (w, _) =>
      val out = new Array[String](w.codePointCount(0, w.length))
      var ci = 0; var ti = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        out(ti) = new String(Character.toChars(cp))
        ci += Character.charCount(cp); ti += 1
      }
      out
    }

    // lazy max-heap: (count, pair) with stale entries skipped on pop —
    // EVERY count change enqueues the new value (a pair whose count only
    // decreased would otherwise have no live entry and silently drop out
    // of selection). Ordering: higher count first, then lexicographically
    // SMALLER pair — a total order, so selection (and the whole training
    // run) is deterministic for a given histogram.
    implicit val ord: Ordering[(Long, (String, String))] =
      Ordering.by[(Long, (String, String)), (Long, String, String)] {
        case (c, (a, b)) => (c, a, b)
      }(Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
    val heap = scala.collection.mutable.PriorityQueue[(Long, (String, String))]()

    val pairCount = scala.collection.mutable.HashMap[(String, String), Long]()
    val pairWords = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.BitSet]()
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * counts(wi)
        if (c <= 0L) { pairCount.remove(p); pairWords.get(p).foreach(_ -= wi) }
        else {
          pairCount(p) = c
          heap.enqueue((c, p))
          if (sign > 0)
            pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet()) += wi
        }
        i += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (!done && merges.length < numMerges) {
      // pop to the first non-stale entry
      var best: Option[(Long, (String, String))] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, p) = heap.dequeue()
        if (pairCount.get(p).contains(c)) best = Some((c, p))
      }
      best match {
        case None => done = true
        case Some((c, _)) if c < minPairCount => done = true
        case Some((_, p @ (a, b))) =>
          merges += p
          val ab = a + b
          val affected = pairWords.getOrElse(p, scala.collection.mutable.BitSet())
            .toArray   // snapshot; updates mutate the live sets
          affected.foreach { wi =>
            val s = words(wi)
            // only rewrite words that still contain the pair (the set can
            // hold stragglers whose occurrence was consumed by an earlier
            // overlapping merge of this same pair)
            var has = false
            var i = 0
            while (!has && i < s.length - 1) {
              has = s(i) == a && s(i + 1) == b; i += 1
            }
            if (has) {
              addWordPairs(wi, -1L)
              val out = new Array[String](s.length)
              var n = 0; var j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
                  out(n) = ab; n += 1; j += 2
                } else { out(n) = s(j); n += 1; j += 1 }
              }
              words(wi) = java.util.Arrays.copyOf(out, n)
              addWordPairs(wi, 1L)   // also re-enqueues every touched pair
            }
          }
          pairCount.remove(p)
          pairWords.remove(p)
      }
    }
    merges.toSeq
  }
}
