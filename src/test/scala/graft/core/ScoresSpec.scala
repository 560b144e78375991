package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden values from the reference formulas (engine/utils.py:25-46),
  * FIXTURES.md §B4.
  */
class ScoresSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).first().get(0)

  test("_score positive rshares: sign +1, log10 order term") {
    val got = eval1(Scores.score(lit(1000.0), lit(1600000000L), 480000L)).asInstanceOf[Double]
    val want = 3.0 + 1600000000.0 / 480000.0
    assert(math.abs(got - want) < 1e-9)
  }

  test("_score negative rshares: sign -1") {
    val got = eval1(Scores.score(lit(-1000.0), lit(1600000000L), 480000L)).asInstanceOf[Double]
    val want = -3.0 + 1600000000.0 / 480000.0
    assert(math.abs(got - want) < 1e-9)
  }

  test("_score zero rshares: order term 0 (reference gives sign -1, value unaffected)") {
    val got = eval1(Scores.score(lit(0.0), lit(1600000000L), 480000L)).asInstanceOf[Double]
    val want = 1600000000.0 / 480000.0
    assert(math.abs(got - want) < 1e-9)
  }

  test("hot/trend timescales (10000 / 480000)") {
    val hot = eval1(Scores.scoreHot(lit(100.0), lit(1600000000L))).asInstanceOf[Double]
    assert(math.abs(hot - (2.0 + 160000.0)) < 1e-9)
    val tr = eval1(Scores.scoreTrend(lit(100.0), lit(1600000000L))).asInstanceOf[Double]
    assert(math.abs(tr - (2.0 + 1600000000.0 / 480000.0)) < 1e-9)
  }

  test("convergent_linear matches python int(((r+s)^2-s^2)/(r+4s))") {
    // int(((1e12+2e12)^2 - 4e24) / (1e12 + 8e12)) = int(5e24/9e12)
    val got = eval1(Scores.convergentLinear(lit(1000000000000L), lit(2000000000000L)))
    assert(got == ((math.pow(3e12, 2) - 4e24) / 9e12).toLong)
    assert(got == 555555555555L)
  }

  test("convergent_square_root with truncating int_sqrt") {
    // int_sqrt(1e12 + 4e12) = int(sqrt(5e12)) = 2236067; int(1e12/2236067)
    val got = eval1(Scores.convergentSquareRoot(lit(1000000000000L), lit(2000000000000L)))
    assert(got == (1e12 / math.sqrt(5e12).toLong).toLong)
    assert(got == 447213L)
  }

  test("int_sqrt truncates, never rounds up") {
    val got = eval1(Scores.intSqrt(lit(15L)))
    assert(got == 3L)
    assert(eval1(Scores.intSqrt(lit(16L))) == 4L)
  }
}
