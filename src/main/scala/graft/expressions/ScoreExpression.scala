package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst implementation of the reference's ranking score
  * (`engine/utils.py:41-46`):
  *
  *   score = (rshares > 0 ? 1 : -1) * log10(max(|rshares|, 1)) + epoch/timescale
  *
  * Semantically identical to the `Scores.score` built-in combo; this form
  * exists to keep the whole formula a single codegen'd expression (one
  * Java expression in the generated code, no Column-tree overhead) and as
  * the library's demonstrator for custom expressions with `doGenCode`.
  */
case class ScoreExpression(rshares: Expression, epochSec: Expression,
                           timescale: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def first: Expression = rshares
  override def second: Expression = epochSec
  override def third: Expression = timescale

  // analysis-time coercion/rejection for the SQL-registered paths — the
  // Column entry point casts explicitly, but `SELECT graft_score(int, ...)`
  // must coerce instead of throwing ClassCastException mid-job
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, LongType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override protected def nullSafeEval(r: Any, e: Any, t: Any): Any = {
    val rs = r.asInstanceOf[Double]
    val sign = if (rs > 0) 1.0 else -1.0
    sign * math.log10(math.max(math.abs(rs), 1.0)) +
      e.asInstanceOf[Long].toDouble / t.asInstanceOf[Long].toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, e, t) => {
      // freshName: a fixed local name would collide (duplicate-variable
      // Janino error -> silent interpreted fallback) when two graft_score
      // calls land in one codegen scope
      val sign = ctx.freshName("graftSign")
      s"""
         |double $sign = ($r > 0.0) ? 1.0 : -1.0;
         |${ev.value} = $sign * java.lang.Math.log10(
         |    java.lang.Math.max(java.lang.Math.abs($r), 1.0))
         |  + ((double) $e) / ((double) $t);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(rshares = newFirst, epochSec = newSecond, timescale = newThird)

  override def prettyName: String = "graft_score"
}

object ScoreExpression {
  /** Column-API entry point. */
  def score(rshares: Column, epochSec: Column, timescale: Column): Column =
    GraftSqlBridge.toColumn(ScoreExpression(
      GraftSqlBridge.toExpr(rshares.cast("double")),
      GraftSqlBridge.toExpr(epochSec.cast("long")),
      GraftSqlBridge.toExpr(timescale.cast("long"))))

  /** Register `graft_score(rshares, epoch_sec, timescale)` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_score",
      exprs => ScoreExpression(exprs(0), exprs(1), exprs(2)),
      "built-in")
}
