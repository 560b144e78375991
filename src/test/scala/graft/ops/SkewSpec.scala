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

  test("saltedJoin == plain join") {
    val fact = (1 to 500).map(i => ("hot", i.toLong)).toDF("k", "v")
      .unionByName((1 to 50).map(i => (s"k$i", i.toLong)).toDF("k", "v"))
    val dim = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"D$i")))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", distinctBy = col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }
}
