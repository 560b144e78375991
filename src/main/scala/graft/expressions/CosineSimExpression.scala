package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst cosine similarity over two numeric array columns.
  *
  * The Column-HOF form (`aggregate(zip_with(...))`) is semantically right but
  * executes interpreted: higher-order functions allocate lambda variables and
  * evaluate element-by-element outside whole-stage codegen — a constant
  * factor that dominates ANN rescoring, where cosine runs once per candidate
  * row over 64-wide vectors. This expression generates a single fused Java
  * loop (dot product and both norms in one pass), keeping the rescore stage
  * inside WholeStageCodegen. Summation order is elementwise left-to-right,
  * bit-identical to the HOF form it replaces, so DuckDB oracles that compare
  * rounded cosines are unaffected.
  *
  * Both inputs may be array<float> or array<double> (mixed allowed); shorter
  * input truncates the dot product while each norm runs over its own full
  * length — the same convention as the HOF form for equal-length vectors,
  * which is the only case the operators produce.
  */
case class CosineSimExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  // analysis-time rejection for the SQL-registered paths: without this a
  // `graft_cosine(string_array, ...)` query fails per-row mid-job instead
  // of at planning
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects numeric array inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(a, ta, i) * get(b, tb, i); i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val x = get(a, ta, i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val y = get(b, tb, i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def getterFor(dt: DataType): String = dt match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case LongType    => "getLong"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (getterFor(elemType(left)), getterFor(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double graft_x = (double) $a.$ga($i);
         |  $na += graft_x * graft_x;
         |}
         |double $nb = 0.0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double graft_y = (double) $b.$gb($i);
         |  $nb += graft_y * graft_y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object CosineSimExpression {
  /** Column-API entry point. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(CosineSimExpression(
      GraftSqlBridge.toExpr(a), GraftSqlBridge.toExpr(b)))

  /** Register `graft_cosine(a, b)` for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimExpression(exprs(0), exprs(1)),
      "built-in")
}
