package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines
  * (north-star extension): reproducible train/val/test assignment and
  * stratified subsampling that give the SAME answer on every run, every
  * partitioning, and every engine — no RNG, no seed files.
  *
  * The bucket hash is an affine map mod a prime over the integral id
  * (portable integer arithmetic — any ANSI-SQL engine recomputes it, which
  * is what lets the DuckDB oracle verify membership row-for-row rather than
  * just sample-size statistics). All operators are pure Column expressions
  * or window functions: scan-pipelined, no extra shuffle beyond the window.
  */
object Sampling {

  /** Deterministic pseudo-uniform bucket in [0, mod) from an integral id.
    * Affine mod-prime: ((id * 2654435761 + 12345) mod 1e9+7) mod `mod`.
    * (Knuth's multiplicative constant; values stay < 2^63 for any id the
    * data model produces, so 64-bit engines agree exactly.)
    */
  def hashBucket(id: Column, mod: Int): Column =
    pmod(pmod(id.cast("long") * lit(2654435761L) + lit(12345L),
      lit(1000000007L)), lit(mod.toLong))

  /** Train/val/test label by hash bucket percent: [0,trainPct) -> train,
    * [trainPct, trainPct+valPct) -> val, rest -> test. Assignment is a pure
    * function of the id — adding documents never reassigns existing ones
    * (the property that keeps eval sets stable as a corpus grows).
    */
  def splitLabel(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Keep ~`fraction` of rows, deterministically by id hash (ppm
    * granularity). A filter, not a sample(): pushes down, no RNG state.
    */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), 1000000) <
      lit(math.round(fraction * 1e6)))

  /** Exact-count stratified sample: ceil(fraction * |stratum|) rows per
    * stratum, chosen by hash order (id tie-break) — deterministic, and every
    * stratum is represented, unlike plain hash sampling where small strata
    * can vanish. One window shuffle keyed on the stratum.
    */
  def stratifiedSampleByHash(df: DataFrame, strataCol: String, idCol: String,
                             fraction: Double): DataFrame = {
    val order = Window.partitionBy(col(strataCol))
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    val whole = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(col("__n").cast("double") * fraction))
      .drop("__rn", "__n")
  }

  /** Temperature-style group rebalancing (multilingual / multi-source
    * mixing): keep ceil(sqrt(|group|) * scale) rows per group, chosen by
    * hash order — a concave keep-curve, so dominant groups (the English
    * pile) are downsampled hard while small groups keep most of their rows,
    * the alpha = 0.5 point of the temperature-sampling family. sqrt is used
    * rather than a general pow(n, alpha) because IEEE 754 requires sqrt to
    * be correctly rounded — every engine computes the identical keep count,
    * so membership is oracle-verifiable row-for-row (pow's last-ulp
    * variation could flip a ceil boundary). Deterministic: a pure function
    * of (group size, id hash); one window shuffle keyed on the group.
    */
  def temperatureRebalance(df: DataFrame, groupCol: String, idCol: String,
                           scale: Double = 1.0): DataFrame = {
    val order = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    val whole = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(sqrt(col("__n").cast("double")) * scale))
      .drop("__rn", "__n")
  }

  /** Sequence-packing assignment: bin documents into fixed token-budget
    * training sequences, in deterministic id order within each shard
    * (`groupCol` — a source/split shard, NEVER a global ordering: the
    * window partitions by shard, so a 100 TB corpus packs shard-parallel
    * with one shuffle). bin_id = floor(exclusive-prefix-sum(tokens) /
    * budget): fixed boundaries, so an overflowing document straddles two
    * bins — exactly what a packer that splits documents across sequence
    * boundaries (the standard pretraining concatenate-then-chunk) needs to
    * know. Pure integer window arithmetic — engine-portable, row-for-row.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    tokenCountCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokenCountCol)
      .withColumn("bin_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(budget)))
  }

  /** Top k rows per group under an explicit ordering (deterministic —
    * include a unique tie-break column in `order`). One window shuffle;
    * Spark's WindowGroupLimit rule pushes the rank bound below the
    * exchange, so each mapper ships at most k rows per group it sees —
    * the per-group form of TakeOrderedAndProject, safe for giant groups.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int,
                   order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Token-budget mixture construction: split a global token budget across
    * sources by a √supply weight (the α = 0.5 temperature curve at TOKEN
    * granularity — big sources get a sublinear share, small sources keep
    * most of theirs), then fill each source's cap in deterministic hash
    * order: a doc is selected iff its source's running token total through
    * it stays within cap_s = floor(budget · √tokens_s / Σ √tokens).
    * Appends (n_tokens, cap) to the selected rows.
    *
    * 100 TB shape: caps come from a per-source aggregate (sources × 1 rows)
    * collected like a codebook — bounded by the SOURCE CATALOG's size
    * (tens of named corpora, never the row count), the same driver-state
    * envelope as the DSIR bucket tables — and broadcast back as a literal
    * frame; selection is one per-source window cumsum. No global window
    * anywhere in the plan (an all-to-one WindowExec, even over a tiny
    * aggregate, is the exact shape a scale review greps for). sqrt is
    * IEEE-correctly-rounded and the cumsum is integer, so membership is
    * engine-replayable row-for-row, like the other samplers.
    */
  def budgetMix(df: DataFrame, sourceCol: String, idCol: String,
                tokenCountCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 token, got $budget")
    val spark = df.sparkSession
    val toks = df.withColumn("n_tokens", tokenCountCol)
    // per-source √supply weights, summed driver-side in source-name order
    // (deterministic; the FP envelope is the same one the external-oracle
    // sum carries — a handful of same-magnitude doubles)
    val supplies = toks.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).cast("long").as("__supply"))
      .collect()
      // a NULL source key or all-NULL token counts contributed no weight
      // and joined to no cap under the old window plan — keep that drop
      // semantics instead of NPE-ing on the driver
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.get(0), math.sqrt(r.getLong(1).toDouble)))
      .sortBy(_._1.toString)
    val wsum = supplies.map(_._2).sum
    val capRows = supplies.map { case (src, w) =>
      org.apache.spark.sql.Row(src, math.floor(budget.toDouble * w / wsum).toLong)
    }
    val srcField = toks.schema(toks.schema.fieldIndex(sourceCol))
    val caps = spark.createDataFrame(
      java.util.Arrays.asList(capRows: _*),
      org.apache.spark.sql.types.StructType(Seq(srcField.copy(name = sourceCol),
        org.apache.spark.sql.types.StructField("cap",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val order = Window.partitionBy(col(sourceCol))
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(caps), Seq(sourceCol))
      .withColumn("__cum", sum(col("n_tokens")).over(order))
      .filter(col("__cum") <= col("cap"))
      .drop("__cum")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data selection for
    * language models via importance resampling"): score every raw document
    * by how much more likely its hashed-unigram features are under a TARGET
    * corpus than under the raw corpus — log w(doc) = Σ_tokens
    * [ln p̂_target(b(tok)) − ln p̂_raw(b(tok))] with add-one-smoothed bucket
    * distributions. Returns (idCol, n_tokens, logw_e4, keep): the per-token
    * log-ratios are rounded to 4dp and scaled to integers (×10⁴), so the
    * per-document score is an EXACT long sum — order-independent, no FP
    * accumulation drift — and an external SQL oracle replays it (ln-at-4dp
    * is the same portability envelope the unigram-logprob report uses).
    * `keep` marks docs more target-like than raw (logw > 0) — the
    * deterministic stand-in for the paper's Gumbel resampling.
    *
    * The bucket hash is portable integer arithmetic over the first/last
    * character codes and length (the fingerprint trick) — collisions are
    * part of DSIR's design (hashed features), and identical on any engine.
    *
    * 100 TB shape: two buckets-row aggregates (collected like a codebook —
    * KB-bounded) build the log-ratio table; scoring is then ONE raw-corpus
    * scan with the table constant-folded into a fold expression — no join,
    * no shuffle, no row amplification.
    */
  /** Per-token bucket ids for the DSIR hashed-unigram features (portable
    * first-char/last-char/length integer hash, see dsirLogWeights).
    */
  private def dsirBucketed(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int, carry: Seq[String] = Nil): DataFrame =
    df.select((col(idCol).as("__id") +:
      transform(TextAnalysis.tokens(lower(col(textCol))),
        t => (ascii(t).cast("long") * 7919L +
              ascii(substring(t, -1, 1)).cast("long") * 31L +
              length(t).cast("long")) % buckets).as("__bs") +:
      carry.map(col)): _*)

  /** Train the frozen DSIR model: the per-bucket integer-scaled log-ratio
    * table (×10⁴, rounded — see dsirLogWeights). Two buckets-row aggregates,
    * each collected like a codebook (KB-bounded). The returned array is the
    * whole model — persist/broadcast it and score any corpus (or stream
    * micro-batch) against it with [[dsirScore]].
    */
  def dsirTable(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, buckets: Int = 256): Array[Long] = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    def bucketCounts(df: DataFrame): Array[Long] = {
      val arr = Array.fill(buckets)(0L)
      dsirBucketed(df, idCol, textCol, buckets)
        .select(explode(col("__bs")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect()
        .foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    val tSum = ct.sum.toDouble + buckets
    val rSum = cr.sum.toDouble + buckets
    Array.tabulate(buckets) { b =>
      math.round((math.log((ct(b) + 1.0) / tSum) -
                  math.log((cr(b) + 1.0) / rSum)) * 10000.0)
    }
  }

  /** Score documents against a frozen DSIR table: one scan, the table
    * constant-folded into a per-row fold — no join, no shuffle. Per-doc
    * scores are exact long sums, so scoring is micro-batch-invariant:
    * applying this inside foreachBatch reproduces the batch run under any
    * ingestion batching (the streaming face, like the frozen-codebook ANN
    * sink).
    */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                table: Array[Long], carry: Seq[String] = Nil): DataFrame =
    foldScore(df, idCol, textCol, table.toIndexedSeq, table.length,
      init = 0L, outCol = "logw_e4", carry)

  /** Shared frozen-table scoring scan (DSIR log-weights and perceptron
    * margins are the same plan): fold the integer table over the hashed
    * tokens from `init`, keep = score > 0. One scan, no join, no shuffle;
    * micro-batch-invariant. The tokenize+hash+fold runs as ONE native
    * codegen'd expression (graft.expressions.TokenBucketFold) — the
    * Column-tree HOF form never whole-stage-codegens and materializes the
    * bucket array per row; the native form stays in the generated loop.
    */
  private def foldScore(df: DataFrame, idCol: String, textCol: String,
                        table: IndexedSeq[Long], buckets: Int, init: Long,
                        outCol: String, carry: Seq[String]): DataFrame =
    df.select((col(idCol) +:
        graft.expressions.TokenBucketFold.fold(
          col(textCol), table.toArray, buckets, init).as("__f") +:
        carry.map(col)): _*)
      .select((col(idCol) +: col("__f.n_tokens").as("n_tokens") +:
        col("__f.score").as(outCol) +: carry.map(col)): _*)
      .withColumn("keep", col(outCol) > 0L)

  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 256): DataFrame =
    dsirScore(raw, idCol, textCol,
      dsirTable(raw, target, idCol, textCol, buckets))

  /** Train a frozen hashed-BIGRAM language model on `target` — the
    * CCNet-style perplexity filter (Wenzek et al. 2019: score a raw corpus
    * under an LM trained on a trusted reference; keep what the model finds
    * unsurprising). Tokens hash to `buckets` ids with the same portable
    * first/last/length hash as DSIR; the model is the Laplace-smoothed
    * conditional log-prob of every (prev, cur) bucket pair,
    *
    *   lp(h1, h2) = round( (ln(c(h1,h2) + 1) − ln(c(h1) + buckets)) · 10⁴ )
    *
    * where c(h1) = Σ_h2 c(h1,h2) — integer-scaled exactly like the DSIR
    * table so per-doc totals are EXACT long sums any engine replays.
    * Returns the `buckets²`-entry table (the whole model, ≤ 512 KB at the
    * 256 default — broadcast/persist it and score any corpus or stream
    * micro-batch with [[bigramLmScore]]).
    *
    * 100 TB shape: ONE target scan — hashed tokens pair up inside an array
    * transform (no token strings on the wire), the pair counts aggregate
    * map-side onto ≤ buckets² integer keys, and the context marginals are
    * summed driver-side from that same collected page (no second scan).
    */
  def bigramLmTable(target: DataFrame, idCol: String, textCol: String,
                    buckets: Int = 256): Array[Long] = {
    require(buckets >= 2 && buckets <= 1024,
      s"buckets must be in [2, 1024] (table is buckets^2 longs), got $buckets")
    val c = Array.fill(buckets * buckets)(0L)
    dsirBucketed(target, idCol, textCol, buckets)
      // sequence(2, n) DESCENDS for n < 2 — guard short docs to null, which
      // explode then drops (0- and 1-token docs contribute no bigrams)
      .select(explode(when(size(col("__bs")) >= 2, transform(
        sequence(lit(2), size(col("__bs"))),
        i => element_at(col("__bs"), i - 1) * buckets +
             element_at(col("__bs"), i)))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => c(r.getLong(0).toInt) = r.getLong(1))
    val ctx = Array.fill(buckets)(0L)
    var k = 0
    while (k < c.length) { ctx(k / buckets) += c(k); k += 1 }
    Array.tabulate(buckets * buckets) { k =>
      math.round((math.log(c(k) + 1.0) -
                  math.log(ctx(k / buckets) + buckets.toDouble)) * 10000.0)
    }
  }

  /** Score documents against a frozen bigram LM: one scan, the table
    * constant-folded into a native rolling fold (graft.expressions
    * .BigramBucketFold — the pair state lives in a loop variable, so
    * nothing materializes per row). `lp_e4` is the exact integer total
    * log-prob ×10⁴ over adjacent token pairs; `keep` marks docs whose
    * MEAN bigram log-prob clears `-minAvgE4/10⁴` (an integer cross-multiply,
    * so the perplexity cut replays exactly — no division). Docs with < 2
    * tokens have no evidence and keep vacuously. Exact long sums make
    * scoring micro-batch-invariant: the streaming face is this same call
    * inside foreachBatch, like dsirScore.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    table: Array[Long], minAvgE4: Long = 55000L,
                    carry: Seq[String] = Nil): DataFrame = {
    val buckets = math.round(math.sqrt(table.length.toDouble)).toInt
    require(buckets >= 2 && buckets * buckets == table.length,
      s"table length must be a square >= 4, got ${table.length}")
    df.select((col(idCol) +:
        graft.expressions.BigramBucketFold.fold(
          col(textCol), table, buckets).as("__f") +:
        carry.map(col)): _*)
      .select((col(idCol) +: col("__f.n_bigrams").as("n_bigrams") +:
        col("__f.score").as("lp_e4") +: carry.map(col)): _*)
      .withColumn("keep", col("lp_e4") >= lit(-minAvgE4) * col("n_bigrams"))
  }

  /** Fixed-epoch batch perceptron quality classifier over the same hashed-
    * unigram features as DSIR (Rosenblatt 1958 perceptron; the "target vs
    * rest" learned quality filter of Brown et al. 2020 Appendix A /
    * fastText-style linear text classification, Joulin et al. 2016 — made
    * engine-replayable). Features are per-bucket token COUNTS plus a
    * constant bias feature; weights, margins, and updates stay in exact
    * 64-bit integer arithmetic; and each epoch applies ONE full-batch
    * update — w += Σ_misclassified y·x — so training is order-independent
    * (no per-row SGD sequencing to replay) and any ANSI-SQL engine
    * reproduces it bit-for-bit by unrolling the epochs.
    *
    * Returns the learned weight table, length `buckets`+1 — the last slot
    * is the bias. The array IS the model: persist/broadcast it and score
    * any corpus (or stream micro-batch) with [[perceptronScore]].
    *
    * 100 TB shape: one corpus scan per epoch (the bucketed frame is
    * persisted so tokenization runs once), with an early exit as soon as
    * an epoch produces zero updates — weights unchanged means identical
    * margins means every later epoch is a guaranteed no-op; each epoch's
    * update aggregates to ≤ `buckets`+1 rows — a KB-bounded driver
    * collect, same envelope as the DSIR table and the ANN codebooks.
    * Margins are Σ w[b]·count(b) per doc: |w[b]| is bounded by
    * epochs × posWeight × corpus token count, so with the posWeight cap
    * of 10⁴ the long sum stays orders of magnitude under overflow even
    * at 10¹³ corpus tokens (≈16·10⁴·10¹³/buckets ≪ 2⁶³ per weight,
    * times ≤10⁴ tokens per doc margin).
    */
  def perceptronTrain(df: DataFrame, idCol: String, textCol: String,
                      positive: Column, buckets: Int = 256,
                      epochs: Int = 3, posWeight: Long = 1L): Array[Long] = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    require(epochs >= 1 && epochs <= 16,
      s"epochs must be in [1, 16], got $epochs")
    require(posWeight >= 1L && posWeight <= 10000L,
      s"posWeight must be in [1, 1e4] (margin-overflow envelope), got $posWeight")
    val w = Array.fill(buckets + 1)(0L)
    // tokenize+hash once, not once per epoch: the bucketed frame is what
    // every epoch re-reads (spills to disk if it outgrows memory).
    // posWeight is the class-weighted perceptron: positive updates count
    // posWeight-fold (set to ~the neg:pos ratio so a rare positive class
    // isn't drowned by the majority's first-epoch update) — still exact
    // integer arithmetic, still order-free.
    val labeled = dsirBucketed(
      df.withColumn("__y", when(positive, posWeight).otherwise(-1L)),
      idCol, textCol, buckets, carry = Seq("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var epoch = 0
      var converged = false
      while (epoch < epochs && !converged) {
        // ONE typedLit literal, not an array(lit...) constructor tree: the
        // margin fold below is an interpreted HOF, and an interpreted
        // CreateArray re-materializes all buckets+1 elements per evaluation
        // (same failure shape as the two-level codebook OOM, PLANS.md
        // round-8 second-decade addendum — harmless at 256 buckets, a wall
        // at large ones)
        val wLit = typedLit(w.toIndexedSeq)
        // margin = bias + Σ_tokens w[bucket]; misclassified iff y·margin ≤ 0
        // (zero margin counts as wrong, so the first epoch updates on every
        // row — the standard perceptron mistake rule). The bias behaves as
        // one more always-on feature: appended as pseudo-bucket `buckets`
        // below so the same explode+sum computes its update.
        val upd = labeled
          .withColumn("__m", aggregate(col("__bs"), lit(w(buckets)),
            (s, b) => s + element_at(wLit, b.cast("int") + 1)))
          .filter(col("__y") * col("__m") <= 0L)
          .select(explode(concat(col("__bs"),
            array(lit(buckets.toLong)))).as("b"), col("__y"))
          .groupBy(col("b")).agg(sum(col("__y")).as("dw"))
          .collect()
        upd.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
        // zero updates -> every remaining epoch is a no-op (separated)
        converged = upd.isEmpty
        epoch += 1
      }
    } finally labeled.unpersist(false)
    w
  }

  /** Score documents against frozen perceptron weights (length buckets+1,
    * last = bias): one scan, the table constant-folded into a per-row
    * fold — no join, no shuffle. Integer-exact margins make scoring
    * micro-batch-invariant, so this is also the streaming face (apply
    * inside foreachBatch), like [[dsirScore]].
    */
  def perceptronScore(df: DataFrame, idCol: String, textCol: String,
                      weights: Array[Long], carry: Seq[String] = Nil): DataFrame = {
    require(weights.length >= 3, "weights must be buckets+1 long (bias last)")
    val buckets = weights.length - 1
    foldScore(df, idCol, textCol, weights.toIndexedSeq, buckets,
      init = weights(buckets), outCol = "margin", carry)
  }
}
