package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row LR logit over a token-array column — the stream-side scorer
  * of [[graft.operators.Classifier]] as ONE compiled pass, replacing the
  * interpreted HOF chain (`transform(split) → md5-hex → conv → pmod →
  * try_element_at(map)` per token — the [[ShingleContaminated]] /
  * [[MinhashSketch]] trap, measured ~100× on the admission gates).
  *
  * BIT-EXACT with the batch scorer
  * ([[graft.operators.Classifier.lrScore]]'s decimal aggregate), not
  * with the old per-token double chain: per row it counts tf per
  * feature bucket (token → 60-bit md5 hash → `pmod(h, buckets)`,
  * [[graft.operators.Dedup.sharedHash60]] semantics, byte-for-byte),
  * then sums `CAST(tf·w AS DECIMAL(20,10))` per OCCURRING bucket in
  * exact java BigDecimal arithmetic — order-independent, the same
  * number the batch `sum(decimal)` lands on — casts to double and
  * rounds to 6 (Spark Round semantics). The old left-to-right
  * per-token double sum could land on the opposite side of the
  * round(·,6) grid from the batch scorer (round-8 ADVICE finding);
  * this form CANNOT diverge: both sides compute the identical decimal
  * sum. Buckets absent from the trained weights contribute exactly the
  * batch scorer's left-join 0.0. NULL tokens hash to a NULL bucket in
  * the batch frame, join nothing, and contribute 0 — skipped here.
  *
  * NULL input → NULL (the batch feature frame simply omits the doc —
  * the one documented divergence, unchanged). CodegenFallback: the md5
  * digests dominate; the win is the fused JVM loop, not codegen. */
case class LrLogit(child: Expression, buckets: Int,
                   bucketIds: IndexedSeq[Int],
                   ws: IndexedSeq[Double])
    extends UnaryExpression with CodegenFallback {

  require(buckets >= 2, s"buckets must be >= 2, got $buckets")
  require(bucketIds.length == ws.length,
    s"weight shape drift: ${bucketIds.length} buckets, ${ws.length} weights")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lr_logit expects array<string> tokens, got $other")
    }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  @transient private lazy val wmap: java.util.HashMap[Integer, java.lang.Double] = {
    val m = new java.util.HashMap[Integer, java.lang.Double](ws.length * 2)
    var i = 0
    while (i < ws.length) { m.put(bucketIds(i), ws(i)); i += 1 }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val tf = new java.util.HashMap[Integer, Integer](len * 2)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 15 hex chars of the md5 as a long (sharedHash60):
        // bytes 0..6 in full plus the high nibble of byte 7 — 60 bits,
        // always nonnegative, so pmod is plain %
        val h = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
          ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
          ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
          ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
        val b = java.lang.Integer.valueOf((h % buckets).toInt)
        val prev = tf.get(b)
        tf.put(b, if (prev == null) 1 else prev.intValue() + 1)
      }
      i += 1
    }
    // Σ_buckets CAST(tf·w AS DECIMAL(20,10)) exactly, like the batch
    // sum; zero-weight/untrained buckets contribute decimal 0 — skip
    var sum = java.math.BigDecimal.ZERO
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = wmap.get(e.getKey)
      if (w != null && w.doubleValue() != 0.0) {
        val prod = e.getValue.intValue().toDouble * w.doubleValue()
        sum = sum.add(java.math.BigDecimal.valueOf(prod)
          .setScale(10, java.math.RoundingMode.HALF_UP))
      }
    }
    PqAdc.round6(sum.doubleValue())
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
