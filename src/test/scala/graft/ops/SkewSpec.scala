package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum == plain groupBy sum (hot-key distribution)") {
    // 90% of rows on one key — the salted form must still be exact
    val df = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toLong)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(df, Seq("k"), "v", distinctBy = col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin == plain join (hot path engaged)") {
    val fact = (1 to 500).map(i => ("hot", i.toLong)).toDF("k", "v")
      .unionByName((1 to 50).map(i => (s"k$i", i.toLong)).toDF("k", "v"))
    val dim = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"D$i")))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // threshold 100 < 500 rows on "hot": that key takes the salted path,
    // the k1..k50 singles take the plain path — same rows either way
    val salted = Skew.saltedJoin(fact, dim, "k", distinctBy = col("v"),
        hotKeyThreshold = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin with no hot keys degenerates to the plain join") {
    val fact = (1 to 50).map(i => (s"k${i % 10}", i.toLong)).toDF("k", "v")
    val dim = (0 until 10).map(i => (s"k$i", s"D$i")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", distinctBy = col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin left join keeps unmatched fact rows once") {
    val fact = (1 to 200).map(i => ("hot", i.toLong)).toDF("k", "v")
      .unionByName(Seq(("orphan", 0L)).toDF("k", "v"))
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k"), "left").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", distinctBy = col("v"),
        joinType = "left", hotKeyThreshold = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(salted == plain)
  }
}
