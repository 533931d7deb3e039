package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row kernel for [[SimHash32]], callable from generated Java via
  * the scalac static forwarder (`graft.functions.SimHashKernel.compute`).
  * The MessageDigest is thread-local: one instance per task thread for
  * the whole scan, instead of one allocation per row. */
object SimHashKernel {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](32)
    val md = digests.get()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i).toString
        md.reset()
        val digest = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        // first 4 bytes big-endian, as unsigned 32-bit in a long —
        // identical to parsing the first 8 hex chars of md5
        val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** 32-bit SimHash over a token array (SURVEY.md §2.10 near-dup sketch).
  *
  * Token hash = first 4 bytes (big-endian) of md5 — deliberately the same
  * `sharedHash` the MinHash pipeline uses, so the whole computation is
  * reproducible in SQL (and hence DuckDB-oracle-verifiable bit-for-bit):
  * bit b of the result is set iff Σ_tokens (2·bit_b(h)−1) > 0.
  *
  * Near-dup detection = small hamming distance (`bit_count(a ^ b)`);
  * a single long per document, so the pairwise stage at scale runs on
  * 8-byte sketches, never the documents.
  *
  * Codegen'd (the generated code calls the static [[SimHashKernel]]), so
  * the sketch projection stays inside whole-stage codegen with no row
  * boxing; md5 itself dominates the per-token cost either way. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash32 expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($c);")

  override protected def withNewChildInternal(c: Expression) = copy(c)
}
