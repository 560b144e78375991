package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst argmax-cosine over a frozen centroid codebook — the
  * assignment scan of auto-k clustering (`Similarity.kmeansAssign`, k > 16).
  *
  * The HOF-fold form (`aggregate(sequence(0, k-1), ...)` over an
  * array-of-arrays literal) is semantically right but costs two ways at
  * large k: it evaluates interpreted (lambda variable binding per centroid
  * per row — measured ~1 µs per 64-dim cosine, 22 s for one 20k-row scan at
  * k = 1250), and the codebook literal is k × dims expression NODES, so
  * plan analysis alone took seconds. Here the codebook rides as ONE
  * flattened `Array[Double]` reference object (plan tree is constant-size)
  * and doGenCode emits a fused two-level Java loop that stays inside
  * WholeStageCodegen.
  *
  * Semantics are bit-identical to the fold it replaces, which is what keeps
  * the frozen DuckDB oracles (x41/x47/x50/x54/x55/x49) unchanged:
  *  - centroids are iterated in ascending-id order with a strictly-greater
  *    replace, so ties keep the smallest cluster id;
  *  - each cosine uses CosineSimExpression's exact loop math (dot over the
  *    shorter length, each norm over its own full length, left-to-right
  *    summation);
  *  - best starts at (-2.0, first id): a NaN cosine (zero-norm vector)
  *    never replaces under Java's NaN comparison, exactly like the fold's
  *    `cos > acc` predicate.
  */
case class CentroidArgmaxExpression(child: Expression,
                                    codebook: IndexedSeq[IndexedSeq[Double]],
                                    ids: IndexedSeq[Int])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.length == ids.length,
    s"codebook/ids mismatch: ${codebook.length} vs ${ids.length}")
  require(codebook.forall(_.length == codebook.head.length),
    "ragged codebook")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_centroid_argmax expects a numeric array input, got ${other.simpleString}")
    }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val dims: Int = codebook.head.length
  // flattened row-major codebook + per-centroid squared norm, precomputed
  // once on the driver (norms don't depend on the row)
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](codebook.length * dims)
    var j = 0
    while (j < codebook.length) {
      var d = 0
      while (d < dims) { a(j * dims + d) = codebook(j)(d); d += 1 }
      j += 1
    }
    a
  }
  @transient private lazy val norms: Array[Double] = {
    val a = new Array[Double](codebook.length)
    var j = 0
    while (j < codebook.length) {
      var s = 0.0; var d = 0
      while (d < dims) { val x = codebook(j)(d); s += x * x; d += 1 }
      a(j) = s
      j += 1
    }
    a
  }
  @transient private lazy val idArr: Array[Int] = ids.toArray

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dt = elemType
    val nv = v.numElements()
    var na = 0.0
    var i = 0
    while (i < nv) { val x = get(v, dt, i); na += x * x; i += 1 }
    val sqa = math.sqrt(na)
    var bestCos = -2.0
    var bestId = idArr(0)
    var j = 0
    while (j < idArr.length) {
      val n = math.min(nv, dims)
      var dot = 0.0
      i = 0
      while (i < n) { dot += get(v, dt, i) * flat(j * dims + i); i += 1 }
      val cos = dot / (sqa * math.sqrt(norms(j)))
      if (cos > bestCos) { bestCos = cos; bestId = idArr(j) }
      j += 1
    }
    bestId
  }

  private def getterFor(dt: DataType): String = dt match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case LongType    => "getLong"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = getterFor(elemType)
    val flatRef = ctx.addReferenceObj("graftCodebook", flat, "double[]")
    val normRef = ctx.addReferenceObj("graftNorms", norms, "double[]")
    val idRef = ctx.addReferenceObj("graftIds", idArr, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nv = ctx.freshName("nv")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sqa = ctx.freshName("sqa")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val bestCos = ctx.freshName("bestCos")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $nv = $v.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double graft_x = (double) $v.$g($i);
         |  $na += graft_x * graft_x;
         |}
         |double $sqa = java.lang.Math.sqrt($na);
         |double $bestCos = -2.0;
         |int $bestId = $idRef[0];
         |int $n = java.lang.Math.min($nv, $dims);
         |for (int $j = 0; $j < $idRef.length; $j++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.$g($i)) * $flatRef[$j * $dims + $i];
         |  }
         |  double $cos = $dot / ($sqa * java.lang.Math.sqrt($normRef[$j]));
         |  if ($cos > $bestCos) { $bestCos = $cos; $bestId = $idRef[$j]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_centroid_argmax"
}

object CentroidArgmaxExpression {
  /** Column-API entry point; `cents` must be (id, centroid) pairs. */
  def argmax(vec: Column, cents: Array[(Int, Seq[Double])]): Column =
    GraftSqlBridge.toColumn(CentroidArgmaxExpression(
      GraftSqlBridge.toExpr(vec),
      cents.map(_._2.toIndexedSeq).toIndexedSeq,
      cents.map(_._1).toIndexedSeq))
}
