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

  /** Salted join of a skewed fact against a dimension, two-path: one narrow
    * aggregate over the fact finds the keys hot enough to overload a single
    * reducer; ONLY those keys pay the salt-and-replicate cost, every other
    * row takes the plain equi-join. Replicating the whole dimension
    * saltBuckets× (the naive form) multiplies the dim shuffle by the bucket
    * count whether or not any key is hot — at fact:dim ratios like
    * lineitem:orders that is the dominant cost, and at 100 TB it is fatal.
    * Here the replicated slice is bounded by (hot keys × saltBuckets) rows,
    * and with no hot keys the plan degenerates to exactly the plain join
    * plus one count-by-key pass.
    *
    * The hot set is broadcast (it is at most a handful of keys by
    * construction), so the fact-side split is a broadcast semi/anti join —
    * no extra fact shuffle. Result rows are identical to the plain join for
    * inner and left joins (the fact side partitions disjointly by hotness).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 distinctBy: Column, saltBuckets: Int = 16,
                 joinType: String = "inner",
                 hotKeyThreshold: Long = 1000000L): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin splits the fact side; '$joinType' joins would duplicate " +
      "or drop unmatched dim rows across the two paths")
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotKeyThreshold).select(col(key))
    val factCold = fact.join(broadcast(hot), Seq(key), "left_anti")
    val factHot = fact.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("__salt", pmod(xxhash64(distinctBy), lit(saltBuckets)))
    val dimHot = dim.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    factCold.join(dim, Seq(key), joinType)
      .unionByName(factHot.join(dimHot, Seq(key, "__salt"), joinType)
        .drop("__salt"))
  }
}
