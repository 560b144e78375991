package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (a handful of viral posts receive most
  * votes; a few tokens dominate the event stream). AQE's skew-join handles
  * the join case at runtime; these are the explicit, deterministic forms for
  * aggregations and for joins where AQE can't see the skew (e.g. inside
  * `foreachBatch`).
  */
object Skew {

  /** Two-stage salted aggregation: partial-aggregate on (key, salt) — which
    * splits a hot key across `saltBuckets` reducers — then final-aggregate on
    * key. Works for any algebraic aggregate; exposed for sum/count which the
    * engine's payout and children folds use.
    *
    * Salt is derived from xxhash64 of the whole row's distributing column —
    * deterministic, so replays shuffle identically.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                distinctBy: Column, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(distinctBy), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted join of a skewed fact against a small dimension: the fact side
    * gets a deterministic salt, the dimension is replicated saltBuckets
    * times, and the join key becomes (key, salt) — a hot key's rows spread
    * over saltBuckets tasks instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 distinctBy: Column, saltBuckets: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(distinctBy), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
