package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** A byte-pair-encoding merge table plus the token-count walk over it —
  * the tokenizer-real replacement for whitespace counting in every
  * token-budget operator (`Sampling.packSequences` / `budgetMix` take the
  * count as a Column, so this plugs straight in).
  *
  * Semantics (what the DuckDB oracle replays literally): a word starts as
  * its code points; merges apply IN RANK ORDER, each to its leftmost-
  * non-overlapping fixpoint; the count is the surviving token total over
  * whitespace-split words. The implementation runs the equivalent
  * lowest-rank-first loop (the published GPT-2 BPE shape) because it is
  * O(word²) regardless of merge-table size, where rank-order scanning is
  * O(merges × word) — 50k merges would make every word pay the full table.
  * The two walks agree exactly when each merge's sides already exist
  * before it (single code points or earlier outputs): then a lower-rank
  * pair can never REAPPEAR after its pass, because its constituent tokens
  * are all created earlier still. The constructor VALIDATES that
  * well-formedness and fails loudly, making oracle equivalence a checked
  * precondition instead of an assumption. Every table produced by actual
  * BPE training is well-formed by construction.
  *
  * Scale shape: the table ships once per executor inside the serialized
  * expression (a 50k-merge GPT-2-class table is ~1 MB — broadcast-class,
  * not data-class); per-word results are memoized per JVM, so natural-
  * language word reuse amortizes the walk to a hash probe.
  */
final class BpeVocab(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "BPE merge table must not be empty")
  locally {
    val outputs = scala.collection.mutable.HashSet[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def known(s: String): Boolean =
        (s.nonEmpty && s.codePointCount(0, s.length) == 1) || outputs.contains(s)
      require(known(a) && known(b),
        s"BPE merge #$i ('$a','$b') is not well-formed: each side must be a " +
          "single code point or the output of an earlier merge (lowest-rank " +
          "merging and rank-order replay are only equivalent for such tables)")
      outputs += (a + b)
    }
  }

  // pair -> rank, first occurrence wins (a duplicate pair can never fire:
  // the earlier rank consumes every occurrence)
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  // per-JVM word memo; bounded crudely (clear past the cap) — corpora have
  // zipf-distributed word reuse, so the hot set is tiny and a rare clear
  // only costs re-walks
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 17

  /** Token count of one whitespace-free word. */
  def countWord(word: String): Long = {
    val hit = memo.get(word)
    if (hit != null) return hit.longValue()
    val count = tokenizeWord(word).length.toLong
    if (memo.size >= MemoCap) memo.clear()
    memo.put(word, count)
    count
  }

  /** The surviving token STRINGS of one whitespace-free word — the walk
    * [[countWord]] counts, exposed for id assignment.
    */
  def tokenizeWord(word: String): Array[String] = {
    var toks = new Array[String](word.codePointCount(0, word.length))
    var ci = 0
    var ti = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      toks(ti) = new String(Character.toChars(cp))
      ci += Character.charCount(cp)
      ti += 1
    }
    var done = false
    while (!done && toks.length > 1) {
      // lowest-rank pair present in the word
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + " " + toks(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = mergeArr(best)
        val ab = a + b
        // one leftmost-non-overlapping pass reaches this pair's fixpoint:
        // merging (a,b) cannot create a new (a,b) adjacency (ab equals
        // neither side)
        val out = new Array[String](toks.length)
        var n = 0
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out(n) = ab; n += 1; j += 2
          } else { out(n) = toks(j); n += 1; j += 1 }
        }
        toks = java.util.Arrays.copyOf(out, n)
      }
    }
    toks
  }

  // token -> id: a single-code-point token is its code point (0..0x10FFFF);
  // a merged token (always >= 2 code points, so the ranges cannot collide)
  // is 0x110000 + the rank of the FIRST merge producing it
  @transient private lazy val tokenIds: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + b, java.lang.Long.valueOf(BpeVocab.MergedIdBase + i))
    }
    m
  }

  @transient private lazy val idMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** Merge-rank ids of one whitespace-free word's tokens. */
  def encodeWord(word: String): Array[Long] = {
    val hit = idMemo.get(word)
    if (hit != null) return hit
    val toks = tokenizeWord(word)
    val ids = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val mid = tokenIds.get(toks(i))
      ids(i) = if (mid != null) mid.longValue() else toks(i).codePointAt(0).toLong
      i += 1
    }
    if (idMemo.size >= MemoCap) idMemo.clear()
    idMemo.put(word, ids)
    ids
  }

  /** Token ids of a document: concatenation over whitespace-split words,
    * in order — `encodeTokens(text).length == countTokens(text)` always.
    */
  def encodeTokens(text: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.min(text.length, 1 << 12))
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) out ++= encodeWord(text.substring(start, i))
    }
    out.toArray
  }

  /** Deserialization funnels through the intern pool: the vocab rides the
    * serialized plan, which every TASK deserializes — without this, each
    * task would carry its own rank map and cold word memo.
    */
  private def readResolve(): Object = BpeVocab.interned(merges)

  /** Token count of a document: sum over whitespace-split words. */
  def countTokens(text: String): Long = {
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) total += countWord(text.substring(start, i))
    }
    total
  }
}

/** `bpe_token_count(text)` over a fixed [[BpeVocab]] — stays inside
  * whole-stage codegen (the generated code calls the referenced vocab's
  * walk directly, like Spark's own regexp expressions reference their
  * compiled pattern).
  */
case class BpeTokenCountExpression(child: Expression,
                                   merges: Seq[(String, String)])
    extends UnaryExpression {

  // interned per JVM, not built per expression copy: every TASK
  // deserializes its own plan (and with it this expression), and a
  // per-task vocab would rebuild the 50k-entry rank map and restart the
  // word memo on every partition — the interned instance pays both once
  // per executor and lets the memo amortize across the whole job
  @transient private lazy val vocab = BpeVocab.interned(merges)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    vocab.countTokens(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $vocabRef.countTokens($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

object BpeVocab {
  /** First id assigned to a MERGED token: one past the Unicode code-point
    * space, so single-code-point tokens (id = their code point) and merge
    * outputs (id = MergedIdBase + rank) can never collide — a merge output
    * always has >= 2 code points.
    */
  val MergedIdBase: Long = 0x110000L

  // per-JVM intern pool keyed by the merge list itself (tables are a few
  // hundred KB of strings; a handful of distinct tables live per job).
  // Bounded crudely like the word memo: clearing just re-interns.
  private val pool =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], BpeVocab]()

  def interned(merges: Seq[(String, String)]): BpeVocab = {
    if (pool.size > 64) pool.clear()
    pool.computeIfAbsent(merges, m => new BpeVocab(m))
  }
}

/** `bpe_encode(text)` over a fixed [[BpeVocab]] — the id-emitting sibling
  * of [[BpeTokenCountExpression]] (same walk, same interned vocab):
  * returns `array<long>` token ids — code points for unmerged single
  * characters, `MergedIdBase + rank` for merge outputs — so
  * `size(bpe_encode(t)) == bpe_token_count(t)` by construction and
  * sequence packing can consume real ids. Codegen'd; the array is built
  * as an UnsafeArrayData straight from the primitive longs.
  */
case class BpeEncodeExpression(child: Expression,
                               merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val vocab = BpeVocab.interned(merges)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a string input, got ${child.dataType.sql}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(vocab.encodeTokens(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray($vocabRef.encodeTokens($c.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeTokenCountExpression {
  /** Column-API entry point; validates the merge table eagerly (driver-
    * side, analysis time) so a malformed table fails before any job runs.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    new BpeVocab(merges)   // fail loudly now, not on an executor
    GraftSqlBridge.toColumn(BpeTokenCountExpression(
      GraftSqlBridge.toExpr(text.cast("string")), merges))
  }

  /** Column-API entry point for [[BpeEncodeExpression]]. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    new BpeVocab(merges)   // fail loudly now, not on an executor
    GraftSqlBridge.toColumn(BpeEncodeExpression(
      GraftSqlBridge.toExpr(text.cast("string")), merges))
  }
}
