package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** 64-bit perceptual dHash of a binary payload as ONE fused expression —
  * [[graft.operators.Multimodal.dHash]]'s contract in a single pass.
  *
  * The composed form (72 independent `md5(substr(hex(payload), …))`
  * slice subtrees + a 64-branch gradient-bit sum) is ~500 expression
  * nodes per projection — the O(N-nodes) janino trajectory
  * [[PqCodeOf]] eliminated from the PQ family — and the image family
  * pays it on BOTH sides of every banded join. This expression builds
  * the lowercase hex bytes once, digests each of the 72 slices with one
  * reused MessageDigest, and folds the 64 gradient bits in place.
  *
  * Bit-exactness contract (the composed chain, replicated):
  *  - hex = `lower(hex(payload))`, length L = 2·bytes;
  *  - slice k of 72 covers hex chars `[⌊L·k/72⌋, ⌊L·(k+1)/72⌋)`
  *    (0-based; the 1-based `substr(h, ⌊L·k/72⌋+1, len)` form), bounds
  *    computed in LONG (the composed form widens `length(h)` first);
  *  - luma(k) = `u32(md5(slice)) mod 256` — i.e. exactly the FOURTH
  *    md5 digest byte (`conv(substring(md5hex,1,8),16,10) % 256` keeps
  *    only the low 8 of the first-4-byte u32); empty slices hash the
  *    empty string (u32 of `d41d8cd9…` → 0xd9), never null;
  *  - bit i (= r·8+c) set when luma(r·9+c+1) > luma(r·9+c);
  *  - NULL payload → 0L, NOT null: the composed form's per-bit
  *    `when(null > null, bit).otherwise(0)` summed to zero.
  * LlmOpsSpec pins byte-parity against the composed chain, null and
  * empty payloads included; the DuckDB brute-force image oracles are
  * unchanged. CodegenFallback — the 72 md5 digests dominate
  * ([[MinhashSketch]]/[[LrLogit]] precedent), codegen would not move
  * the needle. */
case class DHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case BinaryType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dhash64 expects binary payload, got $other")
  }

  // expressions evaluate single-threaded within a task; reuse one digest
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private val HEX = "0123456789abcdef".getBytes

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L // composed form: all-null gradients sum to 0
    val bytes = v.asInstanceOf[Array[Byte]]
    // hex doubles the length: a payload over ~1 GiB would overflow Int
    // on the hex buffer size — fail deliberately, not with a negative
    // allocation (the composed form's early-widen fix, carried here)
    val hlL = bytes.length.toLong * 2
    if (hlL > Int.MaxValue)
      throw new IllegalArgumentException(
        s"dhash64: payload of ${bytes.length} bytes exceeds the " +
          "hex-form Int.MaxValue ceiling (~1 GiB); hash a bounded " +
          "prefix or store oversized media out of row")
    val hl = hlL.toInt
    val hexB = new Array[Byte](hl)
    var p = 0
    while (p < bytes.length) {
      val b = bytes(p) & 0xff
      hexB(2 * p) = HEX(b >>> 4)
      hexB(2 * p + 1) = HEX(b & 0xf)
      p += 1
    }
    val lum = new Array[Int](72)
    val L = hl.toLong // widen BEFORE multiplying (the composed-form fix)
    var k = 0
    while (k < 72) {
      val st = (L * k / 72).toInt
      val en = (L * (k + 1) / 72).toInt
      md.reset()
      md.update(hexB, st, en - st)
      // u32(first 4 digest bytes) mod 256 = the 4th digest byte
      lum(k) = md.digest()(3) & 0xff
      k += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val cell = (i / 8) * 9 + (i % 8)
      if (lum(cell + 1) > lum(cell)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
