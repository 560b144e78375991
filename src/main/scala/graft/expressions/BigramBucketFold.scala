package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd tokenize→bucket-hash→BIGRAM fold for the frozen-table
  * LM scorer (the CCNet-style perplexity filter, `Sampling.bigramLmScore`):
  * one pass over the text computes `struct(n_bigrams, score)` where
  *
  *   score = Σ_adjacent-pairs table[h(prev) · buckets + h(cur)]
  *   h(t)  = (cp(first)·7919 + cp(last)·31 + chars) % buckets
  *
  * i.e. the same portable per-token bucket hash as [[TokenBucketFold]], but
  * the fold state carries the PREVIOUS token's bucket so each step looks up
  * the conditional-log-prob cell of the (prev, cur) pair. The table has
  * `buckets²` entries — the whole frozen bigram LM.
  *
  * Like TokenBucketFold, this replaces a higher-order-function tree
  * (`transform` to hash + `transform(sequence(...))` to pair + `aggregate`)
  * that would never whole-stage-codegen and would materialize both arrays
  * per row; here the pairing is a rolling variable inside the generated
  * loop. Tokenization parity (lowercase via UTF8String, split on `\s+`,
  * code-point first/last/length) is pinned by the same fuzz spec family.
  */
case class BigramBucketFold(child: Expression, table: Array[Long],
                            buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 2 && buckets * buckets == table.length,
    s"table must have buckets^2 entries (buckets=$buckets, got ${table.length})")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    BigramBucketFold.compute(input.asInstanceOf[UTF8String], table, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("graftBigramTable", table, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BigramBucketFold.compute(" +
        s"$c, $tableRef, $buckets);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_bucket_fold"

  // table identity is part of equality for plan canonicalization
  override def equals(other: Any): Boolean = other match {
    case t: BigramBucketFold =>
      child == t.child && java.util.Arrays.equals(table, t.table) &&
        buckets == t.buckets
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(buckets),
      Integer.valueOf(java.util.Arrays.hashCode(table)))
}

object BigramBucketFold {

  /** One pass: lowercase, split on `\s+`, hash each token to its bucket,
    * and sum the table cell of every adjacent (prev, cur) bucket pair.
    * Called from both eval and the generated code.
    */
  def compute(text: UTF8String, table: Array[Long], buckets: Int): InternalRow = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    var n = 0L
    var s = 0L
    var prev = -1
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        val first = t.codePointAt(0).toLong
        val last = t.codePointBefore(t.length).toLong
        val chars = t.codePointCount(0, t.length).toLong
        val h = ((first * 7919L + last * 31L + chars) % buckets).toInt
        if (prev >= 0) {
          n += 1L
          s += table(prev * buckets + h)
        }
        prev = h
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, s))
  }

  /** Column entry point: `struct(n_bigrams, score)` of folding the frozen
    * bigram table over the hashed adjacent token pairs of `text`.
    */
  def fold(text: Column, table: Array[Long], buckets: Int): Column =
    GraftSqlBridge.toColumn(BigramBucketFold(
      GraftSqlBridge.toExpr(text.cast("string")), table, buckets))
}
