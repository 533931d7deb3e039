package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as CONSTANT-SIZE expressions.
  *
  * The composed forms — `array_min(array(struct(round(csq − 2·dot), cid)
  * × nCodes))` for the encode argmin and `array(DotProduct × nCodes)`
  * for the per-query ADC lookup table — have O(nCodes) expression NODES
  * per subspace: at the gated scale (nCodes=8) that is harmless, but at
  * the published standard PQ parameters (m=8, nCodes=256) a single
  * projection carries m·nCodes ≈ 2k inlined dot-product loops and the
  * generated `processNext()` blows the JVM's 64KB method limit
  * (observed: janino InternalCompilerException at m=8/nCodes=256).
  * These expressions carry the codebook as ONE broadcast-referenced
  * double[][] and run the same arithmetic as a compiled loop — constant
  * generated-code size at any nCodes, bit-identical results (the
  * existing ANN gates are the oracle; LlmOpsSpec compiles the
  * production-dimension plan with codegen fallback disabled).
  *
  * Bit-exactness contract (shared by eval and codegen):
  *  - element reads widen float→double exactly like [[VectorBinaryOp]];
  *  - dots accumulate left-to-right in double ([[DotProduct]] order);
  *  - the encode distance is `round(csq_j − 2.0·dot_j, 6)` with Spark's
  *    Round semantics for doubles (java BigDecimal.valueOf → setScale
  *    HALF_UP; NaN/±Inf pass through unrounded);
  *  - the argmin tie-breaks to the LOWEST cid (the
  *    `array_min(struct(d, cid))` lexicographic order it replaces).
  *
  * A vector with fewer than `offset + subDim` elements yields NULL
  * (the sliced composed form produced a short array whose DotProduct
  * nulled out — same observable result on the score path). */
private[graft] object PqAdc {
  /** Spark `round(x, 6)` for doubles, replicated exactly. */
  @inline def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

private[graft] trait PqSubspaceExpr extends UnaryExpression {
  def offset: Int
  def subDim: Int
  /** codebook sub-vectors, codebook order (structural equality for
    * Catalyst expression equality — hence Seq, not Array). */
  def cvs: IndexedSeq[IndexedSeq[Double]]

  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<float|double> vector, got $other")
    }

  protected final def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient protected lazy val cbArr: Array[Array[Double]] =
    cvs.map(_.toArray).toArray

  @inline protected final def elemAt(a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor for element `i` of ArrayData variable `v`. */
  protected final def jElem(v: String, i: String): String =
    if (isFloat) s"((double) $v.getFloat($i))" else s"$v.getDouble($i)"
}

/** The PQ code of subspace `[offset, offset+subDim)`: argmin_j of
  * `round(csq(j) − 2·dot(x_s, cv_j), 6)` over the codebook, ties to the
  * lowest cid — [[graft.operators.Similarity.pqCode]]'s contract as one
  * compiled loop. */
case class PqCodeOf(child: Expression, offset: Int, subDim: Int,
                    cids: IndexedSeq[Long],
                    cvs: IndexedSeq[IndexedSeq[Double]],
                    csq: IndexedSeq[Double]) extends PqSubspaceExpr {
  require(cids.nonEmpty && cids.length == cvs.length && csq.length == cvs.length,
    s"codebook shape drift: ${cids.length} cids, ${cvs.length} sub-vectors, " +
      s"${csq.length} norms")
  require(cvs.forall(_.length == subDim),
    s"codebook sub-vectors must have $subDim dims")

  override def dataType: DataType = LongType

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val csqArr: Array[Double] = csq.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < offset + subDim) return null
    var bestD = Double.NaN
    var bestCid = 0L
    var first = true
    var j = 0
    while (j < cbArr.length) {
      val cv = cbArr(j)
      var dot = 0.0
      var i = 0
      while (i < subDim) { dot += elemAt(a, offset + i) * cv(i); i += 1 }
      val d = PqAdc.round6(csqArr(j) - 2.0 * dot)
      // array_min over struct(d, cid): lexicographic (d asc, cid asc)
      // under Spark's double ordering (-0.0 == 0.0, NaN greatest) —
      // SQLOrderingUtil semantics: equal fast-path, else Double.compare
      val cmp = if (first) -1
        else if (d == bestD) 0 else java.lang.Double.compare(d, bestD)
      if (cmp < 0 || (cmp == 0 && cidArr(j) < bestCid)) {
        bestD = d; bestCid = cidArr(j); first = false
      }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCb", cbArr, "double[][]")
    val cidsRef = ctx.addReferenceObj("pqCids", cidArr, "long[]")
    val csqRef = ctx.addReferenceObj("pqCsq", csqArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val d = ctx.freshName("d")
      val bd = ctx.freshName("bestD"); val bc = ctx.freshName("bestCid")
      val cv = ctx.freshName("cv"); val raw = ctx.freshName("raw")
      val fst = ctx.freshName("first"); val cmp = ctx.freshName("cmp")
      s"""
         |if ($a.numElements() < ${offset + subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bd = 0.0; long $bc = 0L; boolean $fst = true;
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    final double[] $cv = $cb[$j];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $dot += ${jElem(a, s"$offset + $i")} * $cv[$i];
         |    }
         |    final double $raw = $csqRef[$j] - 2.0 * $dot;
         |    final double $d =
         |      (Double.isNaN($raw) || Double.isInfinite($raw)) ? $raw :
         |      java.math.BigDecimal.valueOf($raw)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |    final int $cmp = $fst ? -1 :
         |      ($d == $bd ? 0 : java.lang.Double.compare($d, $bd));
         |    if ($cmp < 0 || ($cmp == 0 && $cidsRef[$j] < $bc)) {
         |      $bd = $d; $bc = $cidsRef[$j]; $fst = false;
         |    }
         |  }
         |  ${ev.value} = $bc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Coarse-cell assignment PLUS residual in one compiled pass:
  * `struct(cell: bigint, res: array<double>)` where `cell` is the
  * argmax-cosine centroid ([[graft.operators.Similarity.cellOf]]'s
  * contract bit-for-bit: [[CosineSim]] arithmetic, ties to the LOWEST
  * cid, zero-norm/dim-mismatch sims skipped exactly like the
  * array_max-over-struct form skips nulls, all-null → lowest cid) and
  * `res = x − centroid_cell` elementwise — the residual the published
  * IVF-PQ recipe quantizes instead of x. One pass per row, constant
  * expression size in nCells (the composed form would be a CASE chain
  * over nCells to pick the centroid for the subtraction — the LUT
  * blowup again, at production cell counts). NULL when the assigned
  * centroid's dimension differs from the vector's (no silent
  * truncation). Real `doGenCode` like its [[PqCodeOf]]/[[AdcLutOf]]
  * siblings — the residual ENCODE is the one full-corpus vector pass of
  * a residual index build, so it must not break whole-stage codegen for
  * that projection (LlmOpsSpec compiles the m=8/nCodes=256 residual
  * chain with codegen fallback disabled). */
case class CellResidual(child: Expression,
                        cids: IndexedSeq[Long],
                        cvs: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(cids.nonEmpty && cids.length == cvs.length,
    s"centroid shape drift: ${cids.length} cids, ${cvs.length} vectors")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("res", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<float|double> vector, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cbArr: Array[Array[Double]] =
    cvs.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    @inline def el(i: Int): Double =
      if (fl) a.getFloat(i).toDouble else a.getDouble(i)
    var bestSim = 0.0
    var bestCid = Long.MaxValue
    var bestJ = -1
    var anySim = false
    var j = 0
    while (j < cbArr.length) {
      val cv = cbArr(j)
      if (cv.length == n) {
        // CosineSim order: dot pass, then the two norm passes
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) { dot += el(i) * cv(i); i += 1 }
        i = 0
        while (i < n) { val x = el(i); na += x * x; i += 1 }
        i = 0
        while (i < n) { nb += cv(i) * cv(i); i += 1 }
        if (na != 0.0 && nb != 0.0) {
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          // array_max over struct(sim, -cid): greater sim wins
          // (SQLOrderingUtil double order), equal sim → lower cid
          val cmp = if (!anySim) 1
            else if (sim == bestSim) 0 else java.lang.Double.compare(sim, bestSim)
          if (cmp > 0 || (cmp == 0 && cidArr(j) < bestCid)) {
            bestSim = sim; bestCid = cidArr(j); bestJ = j; anySim = true
          }
        }
      }
      j += 1
    }
    if (!anySim) {
      // every sim null: the struct form falls through to max(-cid) —
      // the lowest cid — with no meaningful residual; refuse the
      // residual rather than subtract a mismatched/zero-norm centroid
      var mn = 0
      var jj = 1
      while (jj < cidArr.length) { if (cidArr(jj) < cidArr(mn)) mn = jj; jj += 1 }
      bestJ = mn; bestCid = cidArr(mn)
      if (cbArr(bestJ).length != n) return null
    }
    val cv = cbArr(bestJ)
    val res = new Array[Double](n)
    var i = 0
    while (i < n) { res(i) = el(i) - cv(i); i += 1 }
    InternalRow(bestCid, new GenericArrayData(res))
  }

  /** Java accessor for element `i` of ArrayData variable `v` —
    * float widened to double exactly like [[nullSafeEval]]'s `el`. */
  private def jElem(v: String, i: String): String =
    if (isFloat) s"((double) $v.getFloat($i))" else s"$v.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("crCb", cbArr, "double[][]")
    val cidsRef = ctx.addReferenceObj("crCids", cidArr, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val sim = ctx.freshName("sim"); val cmp = ctx.freshName("cmp")
      val bs = ctx.freshName("bestSim"); val bc = ctx.freshName("bestCid")
      val bj = ctx.freshName("bestJ"); val any = ctx.freshName("anySim")
      val mn = ctx.freshName("mn"); val jj = ctx.freshName("jj")
      val bad = ctx.freshName("bad"); val res = ctx.freshName("res")
      val bcv = ctx.freshName("bestCv")
      s"""
         |final int $n = $a.numElements();
         |double $bs = 0.0; long $bc = java.lang.Long.MAX_VALUE;
         |int $bj = -1; boolean $any = false;
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  final double[] $cv = $cb[$j];
         |  if ($cv.length == $n) {
         |    double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ${jElem(a, i)} * $cv[$i];
         |    }
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $x = ${jElem(a, i)};
         |      $na += $x * $x;
         |    }
         |    for (int $i = 0; $i < $n; $i++) {
         |      $nb += $cv[$i] * $cv[$i];
         |    }
         |    if ($na != 0.0 && $nb != 0.0) {
         |      final double $sim = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |      final int $cmp = !$any ? 1 :
         |        ($sim == $bs ? 0 : java.lang.Double.compare($sim, $bs));
         |      if ($cmp > 0 || ($cmp == 0 && $cidsRef[$j] < $bc)) {
         |        $bs = $sim; $bc = $cidsRef[$j]; $bj = $j; $any = true;
         |      }
         |    }
         |  }
         |}
         |boolean $bad = false;
         |if (!$any) {
         |  int $mn = 0;
         |  for (int $jj = 1; $jj < $cidsRef.length; $jj++) {
         |    if ($cidsRef[$jj] < $cidsRef[$mn]) $mn = $jj;
         |  }
         |  $bj = $mn; $bc = $cidsRef[$mn];
         |  if ($cb[$bj].length != $n) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $bcv = $cb[$bj];
         |  final double[] $res = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $res[$i] = ${jElem(a, i)} - $bcv[$i];
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ java.lang.Long.valueOf($bc),
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($res) });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The per-query ADC lookup table of subspace `[offset, offset+subDim)`:
  * `array(dot(q_s, cv_j) for j in codebook order)` as one compiled loop
  * — the m·nCodes-column/2k-branch projection it replaces, collapsed to
  * m array columns of constant expression size. */
case class AdcLutOf(child: Expression, offset: Int, subDim: Int,
                    cvs: IndexedSeq[IndexedSeq[Double]]) extends PqSubspaceExpr {
  require(cvs.nonEmpty, "empty codebook")
  require(cvs.forall(_.length == subDim),
    s"codebook sub-vectors must have $subDim dims")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < offset + subDim) return null
    val out = new Array[Double](cbArr.length)
    var j = 0
    while (j < cbArr.length) {
      val cv = cbArr(j)
      var dot = 0.0
      var i = 0
      while (i < subDim) { dot += elemAt(a, offset + i) * cv(i); i += 1 }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("adcCb", cbArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val out = ctx.freshName("out")
      val cv = ctx.freshName("cv")
      s"""
         |if ($a.numElements() < ${offset + subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $out = new double[$cb.length];
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    final double[] $cv = $cb[$j];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $dot += ${jElem(a, s"$offset + $i")} * $cv[$i];
         |    }
         |    $out[$j] = $dot;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
