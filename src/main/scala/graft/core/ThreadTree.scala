package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive comment-thread expansion — the reference's only recursive query
  * (`WITH RECURSIVE post_tree`, depth <= 8, `engine/post_storage.py:303-309`).
  *
  * Spark has no recursive CTE in the DataFrame API; the idiomatic equivalent
  * for a *bounded* recursion is a driver loop of self-joins (BFS by level).
  * Depth is hard-capped (reference caps at 8), so the plan is at most `depth`
  * shuffle joins; each frontier is persisted to stop Catalyst re-deriving the
  * whole lineage each level, and the loop exits early when a frontier is empty.
  */
object ThreadTree {

  /** All descendants of `roots` following edges child.parentKeyCol -> parent.
    *
    * @param edges    (childCol, parentCol) adjacency DataFrame
    * @param roots    single-column DataFrame of root keys (column name = childCol)
    * @param maxDepth inclusive bound on levels below the roots
    * @return (node, depth) pairs, depth 1..maxDepth, deduplicated
    */
  /** Frontiers at or below this size are collected to the driver and pushed
    * as an IN-list predicate — each BFS level is then one scan with a pushed
    * filter, no join, no shuffle. Larger frontiers fall back to a broadcast
    * join. Comment threads (the reference's use) are always in the IN-list
    * regime; the join path keeps the operator correct for arbitrary graphs.
    */
  private val InListFrontierLimit = 10000

  def descendants(spark: SparkSession, edges: DataFrame, childCol: String,
                  parentCol: String, roots: DataFrame, maxDepth: Int): DataFrame = {
    // every persisted frame is released before returning: the caches only
    // serve the BFS loop's own materializations; the returned plan (in the
    // IN-list regime a flat union of pushed-filter scans) re-evaluates
    // cheaply, and a long-lived session accumulates no cached RDDs
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try descendantsLoop(spark, edges, childCol, parentCol, roots, maxDepth, persisted)
    finally persisted.foreach(_.unpersist(blocking = false))
  }

  private def descendantsLoop(spark: SparkSession, edges: DataFrame,
                              childCol: String, parentCol: String,
                              roots: DataFrame, maxDepth: Int,
                              persisted: scala.collection.mutable.ListBuffer[DataFrame]): DataFrame = {
    val childType = edges.schema(childCol).dataType
    val levelSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__child", childType),
      org.apache.spark.sql.types.StructField("depth",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    // a completed in-list level's keys are already on the driver (bounded by
    // InListFrontierLimit) — its union contribution is a LITERAL frame, so
    // the level's scan+distinct runs exactly once and nothing is cached
    def literalLevel(keys: Array[Any], depth: Int): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(keys.map(k =>
          org.apache.spark.sql.Row(k, depth)): _*), levelSchema)

    val e = edges.select(col(childCol).as("__child"), col(parentCol).as("__parent"))
      .persist()
    persisted += e
    var frontier = roots.select(col(roots.columns.head).as("__parent")).distinct()
    // in-list mode: while the frontier fits, its keys are known on the driver
    // and each level is a single filtered scan (pushed IN predicate)
    var frontierKeys: Array[Any] = frontier.take(InListFrontierLimit + 1).map(_.get(0))
    var inList = frontierKeys.length <= InListFrontierLimit
    var accFrames = List.empty[DataFrame]
    var depth = 1
    var done = false
    while (depth <= maxDepth && !done) {
      if (inList) {
        // in-list level: ONE job over the cached edge projection — a pushed
        // IN filter + bounded collect, NO exchange. The level's keys land on
        // the driver regardless (they become the next IN list), so the
        // dedup happens there instead of paying a distinct() shuffle per
        // level — for forest edges (comment trees) there are no duplicates
        // to begin with.
        val sample = e.filter(col("__parent").isin(frontierKeys.toSeq: _*))
          .select(col("__child")).take(InListFrontierLimit + 1)
        if (sample.isEmpty) done = true
        else if (sample.length <= InListFrontierLimit) {
          frontierKeys = sample.map(_.get(0)).distinct
          accFrames ::= literalLevel(frontierKeys, depth)
          depth += 1
        } else {
          // raw child rows outgrew the driver bound (many rows or a dup-
          // heavy graph): rebuild this level with a cluster-side distinct
          // and continue on the join path
          val p = e.filter(col("__parent").isin(frontierKeys.toSeq: _*))
            .select(col("__child"), lit(depth).as("depth")).distinct()
            .persist()
          persisted += p
          p.count()
          accFrames ::= p
          frontier = p.select(col("__child").as("__parent"))
          inList = false
          depth += 1
        }
      } else {
        val next = e.join(broadcast(frontier), "__parent")
          .select(col("__child"), lit(depth).as("depth"))
          .distinct()
        val sample = next.select(col("__child")).take(InListFrontierLimit + 1)
        if (sample.isEmpty) done = true
        else if (sample.length <= InListFrontierLimit) {
          // frontier shrank back under the driver bound: return to in-list
          frontierKeys = sample.map(_.get(0))
          accFrames ::= literalLevel(frontierKeys, depth)
          inList = true
          depth += 1
        } else {
          val p = next.persist(); persisted += p
          p.count()
          accFrames ::= p
          frontier = p.select(col("__child").as("__parent"))
          depth += 1
        }
      }
    }
    if (accFrames.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", childType),
          org.apache.spark.sql.types.StructField("depth",
            org.apache.spark.sql.types.IntegerType))))
    else
      // a node reachable at several depths keeps its minimum depth (BFS)
      accFrames.reduce(_ unionByName _)
        .groupBy(col("__child").as("node")).agg(min(col("depth")).as("depth"))
  }

  /** BFS that also carries the originating root down the tree — used for the
    * reference's depth/url inheritance (`post_metadata.depth/url`,
    * `processors/comment_processor_for_engine.py:182-201`): every node gets
    * (root, depth) of its unique tree position. Edges must form a forest
    * (each child one parent), as comment trees do.
    */
  def lineage(spark: SparkSession, edges: DataFrame, childCol: String,
              parentCol: String, roots: DataFrame, rootCol: String,
              maxDepth: Int): DataFrame = {
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val e = edges.select(col(childCol).as("__child"), col(parentCol).as("__parent"))
        .persist()
      persisted += e
      var frontier = roots.select(col(rootCol).as("__parent"), col(rootCol).as("root"))
      var acc = roots.select(col(rootCol).as("node"), col(rootCol).as("root"),
        lit(0).as("depth"))
      var depth = 1
      var done = false
      while (depth <= maxDepth && !done) {
        val next = e.join(broadcast(frontier), "__parent")
          .select(col("__child"), col("root"), lit(depth).as("depth"))
          .persist()
        persisted += next
        if (next.count() == 0) done = true
        else {
          acc = acc.unionByName(next.select(col("__child").as("node"), col("root"), col("depth")))
          frontier = next.select(col("__child").as("__parent"), col("root"))
          depth += 1
        }
      }
      acc
    } finally persisted.foreach(_.unpersist(blocking = false))
  }
}
