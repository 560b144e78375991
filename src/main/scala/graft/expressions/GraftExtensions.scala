package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: deploy with
  * `--conf spark.sql.extensions=graft.expressions.GraftExtensions` to get the
  * engine's native functions in every session (SQL and DataFrame) without
  * touching application code. In-process callers can use
  * `ScoreExpression.register(spark)` instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_score"),
      new ExpressionInfo(classOf[ScoreExpression].getName, "graft_score"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ScoreExpression(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimExpression].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimExpression(exprs(0), exprs(1))))
  }
}
