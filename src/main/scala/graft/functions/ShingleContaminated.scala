package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** True iff ANY n-token shingle of a token-array column hashes
  * ([[graft.operators.Dedup.sharedHash]] semantics: first 4 md5 digest
  * bytes as an unsigned 32-bit value) into a fixed long set — the fused
  * streaming-decontamination probe ([[graft.streaming.Corpus]]).
  *
  * Exists because the composable form —
  * `transform(shinglesOfTokens(toks, n), s -> sharedHash(s))` plus a
  * membership test — is a tree of INTERPRETED higher-order lambdas
  * (element_at per gram position, hex-string md5, substring, conv), the
  * same trap documented on the minhash pipeline: measured 36 s for a
  * 4,900-doc sweep this expression runs in under a second. One pass per
  * row: build each gram's bytes directly, digest, probe, early-exit on
  * the first hit. The relational batch shape (explode + hash semi-join)
  * is NOT stream-safe — it needs a per-doc re-aggregation, i.e. keyed
  * state — which is exactly what this per-row form avoids.
  *
  * Gram strings are the tokens joined with a single space, byte-exact
  * with `concat_ws(' ', ...)` over non-null tokens, so results match
  * the batch pipeline and its DuckDB oracle bit-for-bit.
  * CodegenFallback: the md5 digests dominate, codegen would not move
  * the needle. Null tokens are treated as absent (concat_ws semantics);
  * a null array yields null. */
case class ShingleContaminated(child: Expression, n: Int, values: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_contaminated expects array<string>, got $other")
  }

  @transient private lazy val set: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](values.size * 2)
    values.foreach(v => s.add(java.lang.Long.valueOf(v)))
    s
  }

  // expressions evaluate single-threaded within a task; reuse one digest
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private val space = Array[Byte](' ')

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    // materialize token bytes once (each token participates in n grams)
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    var start = 0
    while (start + n <= len) {
      md.reset()
      var k = 0
      var first = true
      while (k < n) {
        val t = toks(start + k)
        if (t != null) { // concat_ws skips nulls entirely
          if (!first) md.update(space)
          md.update(t)
          first = false
        }
        k += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (set.contains(java.lang.Long.valueOf(h))) return true
      start += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
