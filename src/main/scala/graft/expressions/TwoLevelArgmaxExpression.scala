package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst coarse-then-fine centroid argmax — the two-level k-means
  * assignment router (`Similarity.kmeansAssignTwoLevel`), as one fused
  * codegen'd scan.
  *
  * The Column-HOF form (per-row coarse-cosine array + p successive-argmax
  * probe columns + per-probe child folds) carried two costs at scale:
  * its codebooks were `array(array(lit(...)))` constructor TREES (~k·dims
  * literal nodes — OOMed an 8 GiB heap at k = 12.5k before the typedLit
  * fix, PLANS.md round-8 second-decade addendum), and even fixed, every
  * fold evaluates as an interpreted higher-order function — measured 87.9 s
  * for the 200k-vector 100x probe vs 36.0 s for FLAT argmax, i.e. the
  * interpreted constant factor swallowed the O(√k) asymptotic win. Here
  * the coarse/child codebooks ride as flattened double[] reference objects
  * (like CentroidArgmaxExpression) and the whole router — coarse cosines,
  * p successive probes, fine argmax over probed cells' children — is one
  * generated Java loop nest.
  *
  * Semantics are bit-identical to the Column form it replaces (pinned by
  * TwoLevelAssignSpec's exhaustive-probes ≡ flat gate):
  *  - every cosine uses CosineSimExpression's loop math (dot truncated to
  *    the shorter length, each norm over its own full length, left-to-right
  *    summation; NaN from a zero norm never wins a comparison);
  *  - probe s is the strictly-greatest coarse cosine excluding probes
  *    0..s-1, starting from (-3.0, cell 0) — ties keep the earlier cell,
  *    and an all-NaN row re-probes cell 0 harmlessly;
  *  - the fine argmax starts at (-2.0, first child id of cell 0) and
  *    replaces on strictly-greater cosine OR equal cosine with smaller id,
  *    ids compared as doubles exactly like the fold's array accumulator.
  */
case class TwoLevelArgmaxExpression(
    child: Expression,
    coarse: IndexedSeq[IndexedSeq[Double]],
    cellVecs: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
    cellIds: IndexedSeq[IndexedSeq[Int]],
    probes: Int)
    extends UnaryExpression {

  require(coarse.nonEmpty && coarse.length == cellVecs.length &&
    coarse.length == cellIds.length,
    s"cell count mismatch: ${coarse.length}/${cellVecs.length}/${cellIds.length}")
  require(cellVecs.zip(cellIds).forall { case (v, i) =>
    v.nonEmpty && v.length == i.length }, "empty or ragged cell")
  require(probes >= 1, s"probes must be >= 1, got $probes")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_twolevel_argmax expects a numeric array input, got ${other.simpleString}")
    }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val dims: Int = coarse.head.length
  @transient private lazy val c: Int = coarse.length
  @transient private lazy val p: Int = math.min(probes, c)

  @transient private lazy val coarseFlat: Array[Double] = {
    val a = new Array[Double](c * dims)
    var j = 0
    while (j < c) {
      var d = 0; while (d < dims) { a(j * dims + d) = coarse(j)(d); d += 1 }
      j += 1
    }
    a
  }
  @transient private lazy val coarseNorm: Array[Double] =
    coarse.map(v => v.map(x => x * x).sum).toArray
  @transient private lazy val cellStart: Array[Int] =
    cellVecs.scanLeft(0)(_ + _.length).init.toArray
  @transient private lazy val cellLen: Array[Int] = cellVecs.map(_.length).toArray
  @transient private lazy val kidFlat: Array[Double] = {
    val total = cellLen.sum
    val a = new Array[Double](total * dims)
    var t = 0
    cellVecs.foreach(_.foreach { v =>
      var d = 0; while (d < dims) { a(t * dims + d) = v(d); d += 1 }
      t += 1
    })
    a
  }
  @transient private lazy val kidNorm: Array[Double] =
    cellVecs.flatMap(_.map(v => v.map(x => x * x).sum)).toArray
  @transient private lazy val kidId: Array[Int] = cellIds.flatten.toArray

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
    val n = math.min(nv, dims)
    // coarse cosines, one pass
    val cos = new Array[Double](c)
    var j = 0
    while (j < c) {
      var dot = 0.0
      i = 0
      while (i < n) { dot += get(v, dt, i) * coarseFlat(j * dims + i); i += 1 }
      cos(j) = dot / (sqa * math.sqrt(coarseNorm(j)))
      j += 1
    }
    // p successive strictly-greater argmax probes (ties keep earlier cell)
    val probeIdx = new Array[Int](p)
    var s = 0
    while (s < p) {
      var best = -3.0
      var bestIdx = 0
      j = 0
      while (j < c) {
        var fresh = true
        var t = 0
        while (t < s) { if (probeIdx(t) == j) fresh = false; t += 1 }
        if (fresh && cos(j) > best) { best = cos(j); bestIdx = j }
        j += 1
      }
      probeIdx(s) = bestIdx
      s += 1
    }
    // fine argmax over the probed cells' children
    var bestCos = -2.0
    var bestId = kidId(cellStart(0)).toDouble
    s = 0
    while (s < p) {
      val cell = probeIdx(s)
      var t = cellStart(cell)
      val end = cellStart(cell) + cellLen(cell)
      while (t < end) {
        var dot = 0.0
        i = 0
        while (i < n) { dot += get(v, dt, i) * kidFlat(t * dims + i); i += 1 }
        val kc = dot / (sqa * math.sqrt(kidNorm(t)))
        val id = kidId(t).toDouble
        if (kc > bestCos || (kc == bestCos && id < bestId)) {
          bestCos = kc; bestId = id
        }
        t += 1
      }
      s += 1
    }
    bestId.toInt
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
    val cfRef = ctx.addReferenceObj("graftCoarse", coarseFlat, "double[]")
    val cnRef = ctx.addReferenceObj("graftCoarseNorm", coarseNorm, "double[]")
    val ksRef = ctx.addReferenceObj("graftCellStart", cellStart, "int[]")
    val klRef = ctx.addReferenceObj("graftCellLen", cellLen, "int[]")
    val kfRef = ctx.addReferenceObj("graftKids", kidFlat, "double[]")
    val knRef = ctx.addReferenceObj("graftKidNorm", kidNorm, "double[]")
    val kiRef = ctx.addReferenceObj("graftKidIds", kidId, "int[]")
    // per-instance scratch (one generated class instance per task thread)
    val cosBuf = ctx.addMutableState("double[]", "graftCosBuf",
      name => s"$name = new double[$c];")
    val probeBuf = ctx.addMutableState("int[]", "graftProbeBuf",
      name => s"$name = new int[$p];")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val nv = ctx.freshName("nv")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sqa = ctx.freshName("sqa")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val fresh = ctx.freshName("fresh")
      val bestCos = ctx.freshName("bestCos")
      val bestId = ctx.freshName("bestId")
      val cell = ctx.freshName("cell")
      val end = ctx.freshName("end")
      val kc = ctx.freshName("kc")
      val kid = ctx.freshName("kid")
      s"""
         |int $nv = $v.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double graft_x = (double) $v.$g($i);
         |  $na += graft_x * graft_x;
         |}
         |double $sqa = java.lang.Math.sqrt($na);
         |int $n = java.lang.Math.min($nv, $dims);
         |for (int $j = 0; $j < $c; $j++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.$g($i)) * $cfRef[$j * $dims + $i];
         |  }
         |  $cosBuf[$j] = $dot / ($sqa * java.lang.Math.sqrt($cnRef[$j]));
         |}
         |for (int $s = 0; $s < $p; $s++) {
         |  double $best = -3.0;
         |  int $bestIdx = 0;
         |  for (int $j = 0; $j < $c; $j++) {
         |    boolean $fresh = true;
         |    for (int $t = 0; $t < $s; $t++) {
         |      if ($probeBuf[$t] == $j) $fresh = false;
         |    }
         |    if ($fresh && $cosBuf[$j] > $best) { $best = $cosBuf[$j]; $bestIdx = $j; }
         |  }
         |  $probeBuf[$s] = $bestIdx;
         |}
         |double $bestCos = -2.0;
         |double $bestId = (double) $kiRef[$ksRef[0]];
         |for (int $s = 0; $s < $p; $s++) {
         |  int $cell = $probeBuf[$s];
         |  int $end = $ksRef[$cell] + $klRef[$cell];
         |  for (int $t = $ksRef[$cell]; $t < $end; $t++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ((double) $v.$g($i)) * $kfRef[$t * $dims + $i];
         |    }
         |    double $kc = $dot / ($sqa * java.lang.Math.sqrt($knRef[$t]));
         |    double $kid = (double) $kiRef[$t];
         |    if ($kc > $bestCos || ($kc == $bestCos && $kid < $bestId)) {
         |      $bestCos = $kc; $bestId = $kid;
         |    }
         |  }
         |}
         |${ev.value} = (int) $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_twolevel_argmax"
}

object TwoLevelArgmaxExpression {
  /** Column-API entry point; `cells` pairs each coarse routing vector with
    * its (centroid id, centroid) children, exactly the shape
    * `kmeansAssignTwoLevel.coarsen` produces.
    */
  def argmax(vec: Column,
             cells: Array[(Seq[Double], Array[(Int, Seq[Double])])],
             probes: Int): Column =
    GraftSqlBridge.toColumn(TwoLevelArgmaxExpression(
      GraftSqlBridge.toExpr(vec),
      cells.map(_._1.toIndexedSeq).toIndexedSeq,
      cells.map(_._2.map(_._2.toIndexedSeq).toIndexedSeq).toIndexedSeq,
      cells.map(_._2.map(_._1).toIndexedSeq).toIndexedSeq,
      probes))
}
