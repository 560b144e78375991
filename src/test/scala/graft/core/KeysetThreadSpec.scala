package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeysetThreadSpec extends SparkSpec {
  import spark.implicits._

  test("keyset pages concatenate to the unpaginated top-N (FIXTURES §B4)") {
    // 25 rows, limit 20: page1 = ranks 1-20, page2 from anchor = ranks 21-25
    val df = (1 to 25).map(i => (i.toLong, (100 - i).toDouble)).toDF("id", "score")
    val p1 = Keyset.pageDesc(df, col("score"), col("id"), None, 20)
      .collect().map(_.getLong(0)).toList
    val anchor = p1.last
    val anchorScore = (100 - anchor).toDouble
    val p2 = Keyset.pageDesc(df, col("score"), col("id"),
      Some((lit(anchorScore), lit(anchor))), 20)
      .collect().map(_.getLong(0)).toList
    val full = df.orderBy(col("score").desc, col("id").asc)
      .collect().map(_.getLong(0)).toList
    assert(p1 ++ p2 == full)
    assert(p1.size == 20 && p2.size == 5)
  }

  test("keyset anchor with tied scores pages past the anchor row only") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 4.0)).toDF("id", "score")
    val p = Keyset.pageDesc(df, col("score"), col("id"),
      Some((lit(5.0), lit(1L))), 10).collect().map(_.getLong(0)).toList
    assert(p == List(2L, 3L, 4L))
  }

  test("offsetPage == ORDER BY ... LIMIT l OFFSET o, capped") {
    val df = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val got = Keyset.offsetPage(df, Seq(col("v").desc), limit = 10, offset = 5)
      .collect().map(_.getLong(0)).toList
    assert(got == (45 to 36 by -1).map(_.toLong).toList.take(10).drop(0) &&
      got == (45L to 36L by -1).toList)
  }

  test("thread tree: bounded depth, min-depth on multi-path reach") {
    // diamond: 1 -> 2, 1 -> 3, 2 -> 4, 3 -> 4, 4 -> 5
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L), (5L, 4L))
      .toDF("child", "parent")
    val roots = Seq(1L).toDF("node")
    val got = ThreadTree.descendants(spark, edges, "child", "parent", roots, 8)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got == List((2L, 1), (3L, 1), (4L, 2), (5L, 3)))
  }

  test("thread tree: depth cap truncates") {
    val edges = (2L to 20L).map(i => (i, i - 1)).toDF("child", "parent")
    val roots = Seq(1L).toDF("node")
    val got = ThreadTree.descendants(spark, edges, "child", "parent", roots, 3)
      .orderBy("node").collect().map(_.getLong(0)).toList
    assert(got == List(2L, 3L, 4L))
  }

  test("thread tree leaves no cached RDDs behind (long-lived session safety)") {
    val edges = (2L to 200L).map(i => (i, i / 2)).toDF("child", "parent")
    val roots = Seq(1L).toDF("node")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val r = ThreadTree.descendants(spark, edges, "child", "parent", roots, 8)
    assert(r.count() > 0)
    val l = ThreadTree.lineage(spark, edges, "child", "parent", roots, "node", 8)
    assert(l.count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDD ids: $leaked")
  }
}
