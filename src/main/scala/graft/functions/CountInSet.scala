package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a fixed word set (duplicates
  * counted — exactly `size(filter(arr, t => t.isin(words)))`, which is
  * what stopword/lang-id scoring needs).
  *
  * Exists because the `filter` higher-order-function form is INTERPRETED
  * (lambda per element, boxing, no codegen, no common-subexpression
  * elimination — the measured 37× minhash trap, see Dedup scaladoc) and
  * text-quality scoring puts five such counts in the per-row hot path of
  * every corpus scan. This expression is a codegen'd primitive loop over
  * a shared UTF8String hash set. Null elements don't match; a null array
  * yields null. */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_in_set expects array<string>, got $other")
  }

  // one shared immutable set per expression instance; UTF8String hashes
  // on bytes, so lookups never materialize java Strings
  @transient private lazy val set: java.util.HashSet[UTF8String] = buildSet

  private def buildSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(arr: ArrayData, s: java.util.HashSet[UTF8String]): Int = {
    var n = 0; var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && s.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(v: Any): Any = count(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", buildSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
         |int $n = 0;
         |final int $len = $c.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$c.isNullAt($i) && $setRef.contains($c.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
