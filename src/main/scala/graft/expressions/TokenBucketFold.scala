package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd tokenize→bucket-hash→fold for the frozen-table scorers
  * (DSIR log-weights, perceptron margins): one pass over the text computes
  * `struct(n_tokens, score)` where
  *
  *   score = init + Σ_tokens table[(cp(first)·7919 + cp(last)·31 + chars) % buckets]
  *
  * Semantically identical to the Column-tree form in `Sampling.foldScore`
  * (`transform(tokens(lower(text)), hash)` + `aggregate(...)`), but those
  * higher-order functions never whole-stage-codegen and materialize the
  * token-bucket array per row; this expression stays inside the generated
  * loop (the compute helper is a static call — no interpreted fallback,
  * no Invoke-per-element overhead) and allocates nothing but the 2-field
  * result row. Parity notes: `ascii` = code point of the FIRST character
  * (Spark's Ascii does `substring(0,1).toString.codePointAt(0)`), last
  * character via codePointBefore, `length` = code-point count, lowering
  * via UTF8String.toLowerCase (what Spark's Lower calls), split on the
  * same `\s+` Java regex — pinned by a fuzz spec against the Column form
  * on unicode corpora.
  */
case class TokenBucketFold(child: Expression, table: Array[Long],
                           buckets: Int, init: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 2 && buckets <= table.length,
    s"buckets ($buckets) must be in [2, table.length=${table.length}]")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TokenBucketFold.compute(input.asInstanceOf[UTF8String], table, buckets, init)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("graftFoldTable", table, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TokenBucketFold.compute(" +
        s"$c, $tableRef, $buckets, ${init}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_bucket_fold"

  // table identity is part of equality for plan canonicalization
  override def equals(other: Any): Boolean = other match {
    case t: TokenBucketFold =>
      child == t.child && java.util.Arrays.equals(table, t.table) &&
        buckets == t.buckets && init == t.init
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(buckets),
      java.lang.Long.valueOf(init), Integer.valueOf(java.util.Arrays.hashCode(table)))
}

object TokenBucketFold {

  /** One pass: lowercase (UTF8String semantics, as Spark's Lower), split on
    * `\s+`, fold the bucket table. Called from both eval and the generated
    * code. Returns the 2-field (n_tokens, score) row.
    */
  def compute(text: UTF8String, table: Array[Long], buckets: Int,
              init: Long): InternalRow = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    var n = 0L
    var s = init
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        n += 1L
        val first = t.codePointAt(0).toLong
        val last = t.codePointBefore(t.length).toLong
        val chars = t.codePointCount(0, t.length).toLong
        s += table(((first * 7919L + last * 31L + chars) % buckets).toInt)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, s))
  }

  /** Column entry point: `struct(n_tokens, score)` of folding `table` over
    * the hashed tokens of `text`, starting from `init`.
    */
  def fold(text: Column, table: Array[Long], buckets: Int, init: Long): Column =
    GraftSqlBridge.toColumn(TokenBucketFold(
      GraftSqlBridge.toExpr(text.cast("string")), table, buckets, init))
}
