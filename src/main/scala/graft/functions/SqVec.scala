package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 SCALAR quantization of an embedding column — the "SQ" member of
  * the quantization family (per-vector max-abs scale, one signed-byte
  * code per dimension): the stored index keeps one int8-VALUED code per
  * dimension (emitted as `array<int>` — parquet bit-packs the narrow
  * values, so the stored schema is int32 but the on-disk footprint
  * approaches 1 byte/dim) + one double per vector, and serving scores the
  * DEQUANTIZED vectors, so the whole path is bit-replayable by the
  * DuckDB oracle (unlike learned PQ codebooks, nothing is trained).
  *
  * Bit-exactness contract (shared by eval and codegen, both ops):
  *  - element reads widen float→double exactly like [[VectorBinaryOp]];
  *  - `scale = max_i |x_i| / 127.0` (plain max — order-independent);
  *  - `q_i = floor(x_i / scale + 0.5)` (round-half-up via floor — the
  *    engine-portable rounding: floor/division/addition are IEEE-exact
  *    on both engines, unlike round()'s half-even/away-from-zero split);
  *    a zero vector (scale 0) quantizes to all-zero codes, never NaN;
  *  - dequant is `q_i · scale` (exact double product) — serving feeds
  *    it to the audited [[CosineSim]], so the score contract is the
  *    existing one. |x̂_i − x_i| ≤ scale/2 by construction (spec-pinned).
  */
case class SqEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false))))
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_encode expects array<float|double> vector, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    @inline def el(i: Int): Double =
      if (fl) a.getFloat(i).toDouble else a.getDouble(i)
    var mx = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(el(i))
      if (x > mx) mx = x
      i += 1
    }
    val scale = mx / 127.0
    val q = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(el(i) / scale + 0.5).toInt
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  private def jElem(v: String, i: String): String =
    if (isFloat) s"((double) $v.getFloat($i))" else s"$v.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val x = ctx.freshName("x")
      val sc = ctx.freshName("scale"); val q = ctx.freshName("q")
      s"""
         |final int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = java.lang.Math.abs(${jElem(a, i)});
         |  if ($x > $mx) $mx = $x;
         |}
         |final double $sc = $mx / 127.0;
         |final int[] $q = new int[$n];
         |if ($sc != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (int) java.lang.Math.floor(${jElem(a, i)} / $sc + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Double.valueOf($sc),
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($q) });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Dequantize an [[SqEncode]] code array back to `array<double>`
  * (`q_i · scale`, one compiled loop) — serving composes this under the
  * audited [[CosineSim]], so SQ scoring adds no new score contract. */
case class SqDequant(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_dequant expects (array<int> codes, double scale), got $other")
    }

  override def nullSafeEval(qv: Any, sv: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val scale = sv.asInstanceOf[Double]
    val n = q.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = q.getInt(i) * scale; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, sc) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $q.numElements();
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $q.getInt($i) * $sc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
