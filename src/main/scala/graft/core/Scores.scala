package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ranking-score and reward-curve scalar functions, as pure Column expression
  * combos (codegen'd by Catalyst, no UDFs).
  *
  * Reference: `engine/utils.py:25-46`. The reference computes these row-at-a-time
  * in Python at write time; here they are vectorized expressions usable at write
  * time (score maintenance) or query time.
  */
object Scores {

  /** Trending/hot score — `engine/utils.py:41-46`:
    * sign(rshares>0 ? 1 : -1) * log10(max(|rshares|, 1)) + epoch_seconds/timescale.
    * Note the reference's sign convention: rshares == 0 gets sign -1, but the
    * order term is 0 so the value is unaffected; we replicate with when().
    */
  def score(rshares: Column, createdEpochSec: Column, timescale: Long): Column = {
    val order = log10(greatest(abs(rshares), lit(1.0)))
    val sign = when(rshares > 0, 1.0).otherwise(-1.0)
    sign * order + createdEpochSec / lit(timescale.toDouble)
  }

  /** Trending uses timescale 480000 (`engine_comments_contract_processor.py:101-103`). */
  def scoreTrend(rshares: Column, createdEpochSec: Column): Column =
    score(rshares, createdEpochSec, 480000L)

  /** Hot uses timescale 10000 (`engine_comments_contract_processor.py:104-106`). */
  def scoreHot(rshares: Column, createdEpochSec: Column): Column =
    score(rshares, createdEpochSec, 10000L)

  /** `int(math.sqrt(x))` — truncating integer sqrt (`engine/utils.py:25-26`).
    * IEEE sqrt is correctly rounded, so floor(sqrt(x)) matches Python for
    * x < 2^53 exactly representable in double.
    */
  def intSqrt(x: Column): Column = floor(sqrt(x.cast("double"))).cast("long")

  /** Reward curve `((r+s)^2 - s^2) / (r + 4s)` with final int() truncation
    * (`engine/utils.py:33-34`). Dormant in the reference flow but part of the
    * public surface. Python computes in float then truncates toward zero.
    */
  def convergentLinear(rshares: Column, s: Column): Column = {
    val r = rshares.cast("double"); val sd = s.cast("double")
    val v = ((r + sd) * (r + sd) - sd * sd) / (r + lit(4.0) * sd)
    // int() truncates toward zero
    when(v >= 0, floor(v)).otherwise(ceil(v)).cast("long")
  }

  /** Reward curve `int(r / int_sqrt(r + 2s))` (`engine/utils.py:37-38`). */
  def convergentSquareRoot(rshares: Column, s: Column): Column = {
    val denom = intSqrt(rshares + lit(2) * s)
    val v = rshares.cast("double") / denom.cast("double")
    when(v >= 0, floor(v)).otherwise(ceil(v)).cast("long")
  }
}
