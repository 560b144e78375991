package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Partition-count invariance of the correctness surface.
  *
  * The driver's DuckDB oracle compares VALUE HASHES, so any query whose
  * result depends on physical partitioning (approx-aggregate merge order,
  * float reduction order, rank ties, iterative-loop convergence order)
  * would pass at one `spark.sql.shuffle.partitions` setting and flake at
  * another — exactly the class of bug a config change (like the round-8
  * thread-count sweep, PLANS.md) would surface in the worst possible place,
  * the driver's gate run. This spec re-executes the determinism-sensitive
  * registry queries at 4 and 13 shuffle partitions (13: prime, not a
  * divisor or multiple of anything in the fixtures) and requires
  * row-identical results.
  *
  * The full 128-query oracle sweep was run green at local[32] on
  * 2026-08-14; this spec keeps the property from regressing without
  * re-running the whole sweep per round. Queries covered, by risk class:
  *  - approx aggregates (merge-order): x44, x45
  *  - exact percentiles / medians over shuffled input: x28
  *  - hash-based sampling and splits: x22, x23
  *  - rank/tie cuts inside groups: x33
  *  - iterative connected components: x18
  *  - seeded clustering + auto-k: x50
  *  - keyed upsert fold (latest-wins order): s6
  *  - event-time sessionization: t9
  */
class PartitionInvarianceSpec extends SparkSpec {
  private val names = Seq(
    "x44_approx_percentiles", "x45_approx_distinct", "x28_percentiles",
    "x22_hash_split", "x23_stratified_sample", "x33_topk_per_group",
    "x18_neardup_clusters", "x50_semantic_auto", "s6_compact_log",
    "t9_sessionize")

  private def canonical(parts: Int, name: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try SparkEntry.queries(name)(spark, sf())
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  names.foreach { name =>
    test(s"partition-invariant: $name") {
      val at4 = canonical(4, name)
      val at13 = canonical(13, name)
      assert(at4.nonEmpty, s"$name returned no rows at sf0.001")
      assert(at4 == at13,
        s"$name differs between 4 and 13 shuffle partitions: " +
          s"${at4.diff(at13).take(3)} vs ${at13.diff(at4).take(3)}")
    }
  }
}
