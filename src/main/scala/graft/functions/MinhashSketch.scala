package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row minhash sketch of a token-array column:
  * `struct(hset: array<bigint>, sig: array<bigint>)` — the distinct
  * n-gram shingle hashes ([[graft.operators.Dedup.sharedHash]]
  * semantics: first 4 md5 digest bytes as an unsigned 32-bit value,
  * first-occurrence order) and the k-permutation minhash signature
  * (`min over hset of (h·(2i+1) + 101·i + 17) mod 4294967311`,
  * bit-identical to [[graft.operators.Dedup.minhashSignature]]).
  *
  * Exists for the STREAMING probe ([[graft.streaming.Corpus.admitProbe]]):
  * the batch sketch shape (explode + window + per-id aggregate) needs
  * keyed state and is not stream-safe, and the composable per-row form —
  * `array_distinct(transform(shingles(text), s -> sharedHash(s)))` plus
  * the signature HOF — is a tree of INTERPRETED higher-order lambdas
  * (element_at per gram position, hex-string md5, substring, conv; the
  * [[ShingleContaminated]] trap). Measured on the sf0.1 admission gates:
  * the HOF sketch alone cost ~8 s for a 300-doc micro-batch; this
  * expression computes the same sketch in one pass per row — gram bytes
  * built directly, one digest each, k running minima updated in place.
  *
  * Gram strings are tokens joined with a single space (byte-exact with
  * `concat_ws(' ', ...)` over non-null tokens), so hashes match the
  * batch pipeline and its DuckDB oracle bit-for-bit. Fewer than n
  * tokens → NULL (the caller filters, mirroring the empty-shingle-array
  * guard of the HOF form). CodegenFallback: the md5 digests dominate,
  * codegen would not move the needle. */
case class MinhashSketch(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(k >= 1, s"signature size must be >= 1, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("hset", ArrayType(LongType, containsNull = false)),
    StructField("sig", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sketch expects array<string>, got $other")
  }

  // expressions evaluate single-threaded within a task; reuse one digest
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private val space = Array[Byte](' ')
  private val P = 4294967311L

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return null
    // materialize token bytes once (each token participates in n grams)
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](len * 2)
    var start = 0
    while (start + n <= len) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val t = toks(start + j)
        if (t != null) { // concat_ws skips nulls entirely
          if (!first) md.update(space)
          md.update(t)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      seen.add(java.lang.Long.valueOf(h))
      start += 1
    }
    val hset = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { hset(p) = it.next().longValue(); p += 1 }
    val sig = new Array[Long](k)
    var perm = 0
    while (perm < k) {
      val a = perm * 2 + 1
      val b = perm * 101 + 17
      var mn = Long.MaxValue
      var q = 0
      while (q < hset.length) {
        val hv = (hset(q) * a + b) % P
        if (hv < mn) mn = hv
        q += 1
      }
      sig(perm) = mn
      perm += 1
    }
    InternalRow(new GenericArrayData(hset), new GenericArrayData(sig))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
