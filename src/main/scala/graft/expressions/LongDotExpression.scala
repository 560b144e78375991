package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact integer dot product of two long arrays as one fused loop — the
  * SQ8 code-cosine kernel (`Similarity.int8Search` runs it once per
  * (corpus row × query)). Replaces the interpreted
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` HOF chain with the identical
  * elementwise left-to-right 64-bit sum (integer math — associativity is
  * exact, so the value cannot differ). Mismatched lengths return NULL —
  * exactly what the replaced form did (zip_with pads the shorter side with
  * nulls, null*x = null, and the aggregate sum absorbs it to NULL), so a
  * mis-dimensioned corpus row is EXCLUDED by downstream comparisons
  * instead of scoring a plausible truncated dot (round-20 ADVICE). Null
  * ARRAY inputs propagate null.
  */
case class LongDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_long_dot expects two array<bigint> inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_long_dot"
}

object LongDotExpression {
  /** Column-API entry point. */
  def longDot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(LongDotExpression(
      GraftSqlBridge.toExpr(a), GraftSqlBridge.toExpr(b)))
}
