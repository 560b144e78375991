package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (north-star extension): find training documents
  * that share any word n-gram with an evaluation/benchmark set — the overlap
  * filter every serious pretraining pipeline runs before training (the
  * GPT-3/PaLM-style "13-gram collision" check, parameterized n).
  *
  * Scale shape: distinct n-grams explode on both sides and meet in ONE
  * equi-join on the n-gram — work is linear in corpus n-grams plus matches,
  * never |train| × |benchmark|. The benchmark side is typically bounded
  * (eval sets are small), so Spark broadcasts it and the 100 TB train side
  * never shuffles. The join key is a 64-bit hash of the n tokens — narrow
  * rows through broadcast and probe; the oracle recomputes the overlap from
  * the n-gram strings, gating the hashed plan against the exact semantics.
  */
object Decontaminate {

  /** Distinct (per document) lower-cased word n-grams, exploded as 64-bit
    * hashes. The token array is projected into a bound attribute first so
    * the n-gram lambda reads it instead of re-tokenizing per index (see
    * wordNgramsOf); ngramHashesOf hashes the n token slots directly — the
    * n-gram string is never materialized, and the downstream join/broadcast
    * carries 8-byte keys instead of ~8n-char strings. A hash collision can
    * only ADD a phantom match (P ≈ pairs/2^64 — negligible, and the oracle
    * gate would surface it).
    */
  private def ngrams(df: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.ngramHashesOf(col("__toks"), n))).as("ngh"))

  /** Training documents contaminated by the benchmark: one row per train doc
    * sharing >= 1 word n-gram with any benchmark doc, with the count of
    * distinct shared n-grams (the evidence strength a threshold policy can
    * act on).
    */
  def contaminatedDocs(train: DataFrame, benchmark: DataFrame, idCol: String,
                       textCol: String, n: Int): DataFrame = {
    val bench = ngrams(benchmark, idCol, textCol, n).select("ngh").distinct()
    ngrams(train, idCol, textCol, n)
      .join(bench, Seq("ngh"))   // benchmark side is small -> auto-broadcast
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The dedup decision: train rows with every contaminated doc removed.
    * One anti-join against the contaminated-id list. No broadcast hint: the
    * dirty list is bounded by |train|, not |benchmark| — under heavy
    * contamination (or tiny n) it can be arbitrarily large, and a forced
    * broadcast would OOM the driver. AQE converts the anti-join to a
    * broadcast at runtime whenever the built side's actual size is small,
    * which is the common case, without hard-wiring that assumption.
    */
  def removeContaminated(train: DataFrame, benchmark: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    val dirty = contaminatedDocs(train, benchmark, idCol, textCol, n)
      .select(col("doc_id").as(idCol))
    train.join(dirty, Seq(idCol), "left_anti")
  }
}
