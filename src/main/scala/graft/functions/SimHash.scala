package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row kernel for [[SimHashN]], callable from generated Java via
  * the scalac static forwarder (`graft.functions.SimHashKernel.compute`).
  * The MessageDigest is thread-local: one instance per task thread for
  * the whole scan, instead of one allocation per row. */
object SimHashKernel {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Token hash: the first `bits/4` hex chars of md5(salt ++ tok),
    * big-endian — i.e. exactly
    * `CAST('0x'||substr(md5(salt||tok),1,bits/4) AS BIGINT)` in SQL.
    * For bits=32/no salt this is the first 4 digest bytes, identical to
    * the MinHash pipeline's sharedHash. The salt is what lets a
    * MULTI-WORD sketch derive independent 60-bit words from one md5
    * family (word w salts with "w:"). */
  private def tokenHash(md: MessageDigest, salt: Array[Byte], tok: String,
                        bits: Int): Long = {
    md.reset()
    if (salt.length > 0) md.update(salt)
    val digest = md.digest(tok.getBytes(StandardCharsets.UTF_8))
    val nibbles = bits / 4
    var h = 0L
    var i = 0
    while (i < nibbles) {
      val b = digest(i / 2)
      val nib = if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf
      h = (h << 4) | nib.toLong
      i += 1
    }
    h
  }

  def compute(arr: ArrayData, bits: Int): Long =
    compute(arr, bits, Array.emptyByteArray)

  def compute(arr: ArrayData, bits: Int, salt: Array[Byte]): Long = {
    val votes = new Array[Int](bits)
    val md = digests.get()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(md, salt, arr.getUTF8String(i).toString, bits)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `bits`-bit SimHash over a token array (SURVEY.md §2.10 near-dup
  * sketch), bits ∈ {4,8,…,60} (a whole number of md5 hex chars, capped
  * at 60 so the value — and its SQL twin — fits a signed 64-bit int).
  *
  * Token hash = leading md5 hex chars — deliberately the same
  * `sharedHash` family the MinHash pipeline uses, so the whole
  * computation is reproducible in SQL (and hence DuckDB-oracle-
  * verifiable bit-for-bit): bit b of the result is set iff
  * Σ_tokens (2·bit_b(h)−1) > 0.
  *
  * Near-dup detection = small hamming distance (`bit_count(a ^ b)`);
  * a single long per document, so the pairwise stage at scale runs on
  * 8-byte sketches, never the documents. Width scales with the corpus:
  * banded candidate generation needs ~log2(n/target_occupancy) bits PER
  * BAND, so 32-bit/4-band is fine to ~10⁶ docs and 60-bit/4-band to
  * ~10⁸; beyond that, widen to a multi-word sketch (see
  * [[graft.operators.Dedup.simhashPairs]] scaladoc).
  *
  * Codegen'd (the generated code calls the static [[SimHashKernel]]), so
  * the sketch projection stays inside whole-stage codegen with no row
  * boxing; md5 itself dominates the per-token cost either way. */
case class SimHashN(child: Expression, bits: Int, salt: String = "")
    extends UnaryExpression {
  require(bits > 0 && bits <= 60 && bits % 4 == 0,
    s"simhash bits must be a positive multiple of 4, <= 60; got $bits")

  @transient private lazy val saltBytes: Array[Byte] =
    salt.getBytes(StandardCharsets.UTF_8)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.compute(v.asInstanceOf[ArrayData], bits, saltBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("simhashSalt",
      salt.getBytes(StandardCharsets.UTF_8), "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($c, $bits, $saltRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SimHash32 {
  /** The 32-bit form the `llm_simhash` gate pins. */
  def apply(child: Expression): SimHashN = SimHashN(child, 32)
}
