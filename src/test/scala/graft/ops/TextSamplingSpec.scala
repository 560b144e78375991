package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repetition scoring, PII redaction, and deterministic sampling/splitting —
  * the curation-side text ops (oracle-gated via x19–x23; these specs pin the
  * hand-checkable semantics).
  */
class TextSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionScore: hand-computed duplicate 2-gram fraction") {
    val df = Seq(
      (1L, "a b a b a"),        // 2-grams [a b, b a, a b, b a] -> 2/4 distinct -> 0.5
      (2L, "all words differ here"),  // 3 distinct 2-grams of 3 -> 0.0
      (3L, "single")).toDF("id", "text")   // no 2-grams -> 0.0
    val got = df.select(col("id"), TextAnalysis.repetitionScore(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.5)
    assert(got(2L) == 0.0)
    assert(got(3L) == 0.0)
  }

  test("redactPii: emails, phones, and long digit runs are tagged; prose is untouched") {
    val df = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "call +1-555-0012345 now",
      "order 123456789 shipped",
      "short 123 id and plain text stay").toDF("text")
    val got = df.select(TextAnalysis.redactPii(col("text"))).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> now")
    assert(got(2) == "order <NUM> shipped")
    assert(got(3) == "short 123 id and plain text stay")
  }

  test("splitLabel: total, deterministic, and stable as the corpus grows") {
    val a = (0L until 500L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly 80/10/10 (pseudo-uniform hash; loose bounds)
    val train = a.values.count(_ == "train")
    assert(train > 350 && train < 450, s"train=$train of 500")
    // growing the corpus never reassigns an existing id
    val b = (0L until 1000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("stratifiedSampleByHash: exactly ceil(fraction * n) per stratum, deterministic") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "lang")
    val s1 = Sampling.stratifiedSampleByHash(df, "lang", "id", 0.10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("big") == 9)       // ceil(90 * 0.1)
    assert(byLang("small") == 1)     // ceil(10 * 0.1) — small stratum survives
    val s2 = Sampling.stratifiedSampleByHash(df, "lang", "id", 0.10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.toSeq == s2.sorted.toSeq)
  }

  test("sampleByHash: deterministic subset with roughly the asked fraction") {
    val df = (0L until 2000L).toDF("id")
    val kept = Sampling.sampleByHash(df, "id", 0.25).as[Long].collect().toSet
    assert(kept.size > 380 && kept.size < 620, s"kept ${kept.size} of 2000")
    val again = Sampling.sampleByHash(df, "id", 0.25).as[Long].collect().toSet
    assert(kept == again)
  }
}
