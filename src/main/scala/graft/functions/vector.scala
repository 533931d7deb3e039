package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector math over array columns for the similarity-search hot path
  * (SURVEY.md §2.10). The composed `zip_with`+`aggregate` forms are
  * interpreted higher-order functions (no codegen, boxing per element);
  * these expressions run a primitive loop — same left-to-right double
  * accumulation, so results are bit-identical to the composed forms and
  * to the DuckDB oracle.
  *
  * Both expressions implement `doGenCode`, so they stay INSIDE
  * whole-stage codegen: the generated Java is the same primitive loop,
  * with the element accessor (`getFloat`/`getDouble`) chosen at
  * compile time from the array element type. At corpus scale this is
  * the per-row inner kernel of every ANN / embedding-dedup operator, so
  * no per-row boxing or virtual `eval` call is acceptable there. */
private[graft] trait VectorBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected final def elementIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Java accessor for element `i` of array-valued java variable `v`. */
  protected final def jElem(v: String, i: String, e: Expression): String =
    if (elementIsFloat(e)) s"((double) $v.getFloat($i))" else s"$v.getDouble($i)"
}

/** dot(a, b) with double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null // as zip_with+sum would
    val af = elementIsFloat(left); val bf = elementIsFloat(right)
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(a, i, af) * elem(b, i, bf); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${jElem(a, i, left)} * ${jElem(b, i, right)};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** cosine(a, b) = dot / (sqrt(na) * sqrt(nb)), all accumulated
  * left-to-right in double — the exact arithmetic of the composed form. */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null // dim mismatch: no silent truncation
    val af = elementIsFloat(left); val bf = elementIsFloat(right)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, af); val y = elem(b, i, bf)
      dot += x * y; i += 1
    }
    i = 0
    while (i < n) { val x = elem(a, i, af); na += x * x; i += 1 }
    i = 0
    while (i < n) { val y = elem(b, i, bf); nb += y * y; i += 1 }
    // zero-norm vectors have no direction: null, not NaN (NaN sorts
    // ABOVE real values in Spark's descending order and would wreck
    // top-k). NOTE this deliberately diverges from DuckDB's
    // list_cosine_similarity, which returns -1.0 on zero norm — an
    // oracle over a corpus containing zero vectors must CASE-guard
    // (list_sum of squares = 0 -> NULL); the test fixtures contain none.
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      // identical accumulation order to nullSafeEval: dot pass, then the
      // two norm passes — keeps bit-exact parity with the oracle
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${jElem(a, i, left)} * ${jElem(b, i, right)};
         |  }
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${jElem(a, i, left)}; $na += $x * $x;
         |  }
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $y = ${jElem(b, i, right)}; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}
