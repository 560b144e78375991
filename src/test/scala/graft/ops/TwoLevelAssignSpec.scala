package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-level (coarse-then-fine) k-means assignment — the scale path for the
  * auto-k semantic family (see PLANS.md round-8: flat argmax is O(N·k) with
  * k ∝ N; the two-level router is O(N·√k)).
  *
  * Gate design mirrors the PQ/IVF specs: with EXHAUSTIVE probing (probes >=
  * number of coarse cells) the fine fold searches every centroid, so the
  * result must equal the flat exact argmax row-for-row — that pins the
  * fold/tie machinery exactly. Partial probing is then gated on determinism
  * and a measured agreement floor.
  */
class TwoLevelAssignSpec extends SparkSpec {

  private def base = {
    spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
  }

  private def seeds(k: Int): Array[(Int, Seq[Double])] = {
    import spark.implicits._
    base.filter(pmod(col("id"), lit(11)) === 0)
      .orderBy(col("id")).limit(k)
      .select(col("id"), transform(col("vec"), x => round(x, 4)).as("vec"))
      .as[(Long, Seq[Double])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  private def clustersOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("exhaustive probes reproduce the flat exact argmax row-for-row") {
    val s = seeds(32)
    val flat = clustersOf(Similarity.kmeansAssign(base, "vec", s, iters = 0))
    val two = clustersOf(Similarity.kmeansAssignTwoLevel(
      base, "vec", s, iters = 0, probes = Int.MaxValue))
    assert(two == flat, {
      val diffs = flat.keys.filter(k => two(k) != flat(k)).take(5)
      s"exhaustive two-level diverged from flat on ids $diffs"
    })
  }

  test("default probes: deterministic, valid cluster ids, bounded divergence") {
    val s = seeds(32)
    val a = clustersOf(Similarity.kmeansAssignTwoLevel(base, "vec", s, iters = 0))
    val b = clustersOf(Similarity.kmeansAssignTwoLevel(base, "vec", s, iters = 0))
    assert(a == b, "two-level assignment is not deterministic")
    val validIds = s.map(_._1).toSet
    assert(a.values.forall(validIds), "assignment produced an unknown cluster id")
    // measured on this fixture: probes=2 agrees with flat on ~75% of rows
    // (round-8 probe); pin a floor well below that so the gate catches a
    // broken router, not fixture noise
    val flat = clustersOf(Similarity.kmeansAssign(base, "vec", s, iters = 0))
    val agree = a.count { case (id, cl) => flat(id) == cl }.toDouble / a.size
    assert(agree >= 0.6, f"cluster agreement $agree%.2f below 0.6 floor")
  }

  test("semanticDedupAutoTwoLevel keeps the SemDeDup output contract") {
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val flat = Similarity.semanticDedupAuto(
      emb, "vec_id", "embedding", targetClusterSize = 16, threshold = 0.36)
      .localCheckpoint(true)
    val two = Similarity.semanticDedupAutoTwoLevel(
      emb, "vec_id", "embedding", targetClusterSize = 16, threshold = 0.36)
      .localCheckpoint(true)
    assert(two.columns.toSeq == Seq("id", "cluster", "keep"))
    assert(two.count() == flat.count(), "row count must equal the corpus")
    // keep verdicts are less router-sensitive than raw cluster labels (a
    // near-dup pair usually lands in the same cell either way); floor from
    // the round-8 probe measurement
    val keepAgree = flat.select(col("id"), col("keep").as("k1"))
      .join(two.select(col("id"), col("keep").as("k2")), "id")
      .filter(col("k1") === col("k2")).count().toDouble / flat.count()
    assert(keepAgree >= 0.8, f"keep agreement $keepAgree%.2f below 0.8 floor")
  }

  test("auto entry points route two-level at the crossover, flat below it") {
    // round-17 verdict item 7: the default path, not just an opt-in swap.
    // The crossover itself is measured at k = 32768 (twoLevelCrossoverK's
    // doc); lowering the seam drives the routed branch on a spec-sized k
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    def run() = Similarity.semanticDedupAuto(
      emb, "vec_id", "embedding", targetClusterSize = 16, threshold = 0.36)
      .orderBy("id").collect().toSeq
    def runTwo() = Similarity.semanticDedupAutoTwoLevel(
      emb, "vec_id", "embedding", targetClusterSize = 16, threshold = 0.36)
      .orderBy("id").collect().toSeq
    val saved = Similarity.twoLevelCrossoverK
    try {
      Similarity.twoLevelCrossoverK = 2      // k >= 2 always: routed
      assert(run() === runTwo(),
        "above the crossover semanticDedupAuto must BE the two-level pipeline")
      Similarity.twoLevelCrossoverK = Int.MaxValue   // never: flat
      val flat = run()
      Similarity.twoLevelCrossoverK = saved          // real default (32768)
      assert(run() === flat,
        "below the real crossover the flat exact path (and its oracle " +
          "hashes) must be untouched")
    } finally Similarity.twoLevelCrossoverK = saved

    // prototypePrune shares the routing
    def prune() = Similarity.prototypePrune(
      emb, "vec_id", "embedding", targetClusterSize = 16, keepFrac = 0.5)
      .orderBy("id").collect().toSeq
    val savedP = Similarity.twoLevelCrossoverK
    try {
      Similarity.twoLevelCrossoverK = Int.MaxValue
      val flatP = prune()
      Similarity.twoLevelCrossoverK = 2
      val routedP = prune()
      assert(routedP.size === flatP.size)
      assert(routedP !== null)   // routed path runs end to end
    } finally Similarity.twoLevelCrossoverK = savedP
  }
}
