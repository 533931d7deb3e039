package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** 64-bit AUDIO fingerprint of a binary payload as ONE fused expression
  * — the Haitsma–Kalker energy-difference recipe ("A Highly Robust
  * Audio Fingerprint Based on Signal Processing", 2002 — the public
  * method behind broadcast-monitoring fingerprinters): the signal is
  * framed, each frame's spectrum split into energy bands, and bit
  * (frame f, band b) is the SIGN of the double difference
  * `(E(f,b) − E(f,b+1)) − (E(f−1,b) − E(f−1,b+1))` — a descriptor
  * robust to gain and coding noise because only energy-ORDER survives.
  *
  * The frame/band ENERGY GRID is the stub decode ([[DHash64]]'s
  * discipline for the image modality, applied to audio): this container
  * has no audio codecs, so energy(f, b) comes from the payload's hex
  * form sliced into 3 frames × 33 bands = 99 contiguous slices (slice
  * k covers hex chars `[⌊L·k/99⌋, ⌊L·(k+1)/99⌋)`, energy =
  * `u32(md5(slice)) mod 256` — the 4th digest byte). A same-length
  * LOCAL edit perturbs only the frames covering it, exactly as a local
  * audio edit perturbs only its frames' band energies; a real
  * implementation swaps the slice-md5 for FFT band energies over PCM
  * frames and everything downstream (difference bits, banding, hamming)
  * is the production algorithm.
  *
  * Bits: i = (f−1)·32 + b for f ∈ {1,2}, b ∈ 0..31, set when
  * `(E(f,b) − E(f,b+1)) > (E(f−1,b) − E(f−1,b+1))` (strict, exact int
  * operands). NULL payload → 0L (the [[DHash64]] convention); empty
  * payloads hash empty slices, never null. DuckDB replays the identical
  * chain (`audioFpCtes`). CodegenFallback — 99 md5 digests dominate. */
case class AudioFp64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case BinaryType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_fp64 expects binary payload, got $other")
  }

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private val HEX = "0123456789abcdef".getBytes

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val bytes = v.asInstanceOf[Array[Byte]]
    val hlL = bytes.length.toLong * 2
    if (hlL > Int.MaxValue)
      throw new IllegalArgumentException(
        s"audio_fp64: payload of ${bytes.length} bytes exceeds the " +
          "hex-form Int.MaxValue ceiling (~1 GiB); fingerprint a bounded " +
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
    // 3 frames x 33 band edges = 99 energy slices
    val e = new Array[Int](99)
    val L = hl.toLong
    var k = 0
    while (k < 99) {
      val st = (L * k / 99).toInt
      val en = (L * (k + 1) / 99).toInt
      md.reset()
      md.update(hexB, st, en - st)
      e(k) = md.digest()(3) & 0xff
      k += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val f = i / 32 + 1
      val b = i % 32
      if ((e(f * 33 + b) - e(f * 33 + b + 1)) >
          (e((f - 1) * 33 + b) - e((f - 1) * 33 + b + 1)))
        hash |= (1L << i)
      i += 1
    }
    hash
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
