package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Token count under a TRAINED BPE merge table — the upgrade from the
  * regex proxy ([[graft.operators.TextAnalysis.bpeishTokenCount]]) to
  * real merges: each whitespace word starts as its codepoint symbols
  * and the LOWEST-RANK applicable merge is applied repeatedly (all
  * left-to-right non-overlapping occurrences per application — the
  * published BPE apply loop) until none applies; the document's count
  * is the summed terminal symbol count over its words.
  *
  * `lefts(i)`/`rights(i)` is the rank-i merge — the broadcast-inlined
  * form of a stored (rank, left, right) parquet table, the classifier-
  * weights symmetry: train/choose merges once, store, count every run.
  * One compiled pass per row; the DuckDB oracle replays the identical
  * process as a recursive CTE over space-separated symbol strings
  * (string `replace` IS left-to-right non-overlapping application).
  *
  * Empty words (a leading-whitespace split artifact) and NULL tokens
  * contribute 0 symbols — mirrored by the oracle's length guard.
  * Codepoint symbols, not UTF-16 units, so multibyte text merges like
  * DuckDB's character semantics. NULL input → NULL.
  *
  * Constraint: merge-table symbols must be whitespace-free (enforced at
  * construction) — words are whitespace-split before merging, so no
  * trained table can violate it, and the space-separated rank key (and
  * the oracle's space-separated symbol strings) rely on it. */
case class BpeCount(child: Expression,
                    lefts: IndexedSeq[String],
                    rights: IndexedSeq[String])
    extends UnaryExpression with CodegenFallback {

  require(lefts.length == rights.length,
    s"merge table shape drift: ${lefts.length} lefts, ${rights.length} rights")
  // the rank-map key is left + ' ' + right: safe for tables produced by
  // bpeTrain (symbols come from whitespace-split words), but this is a
  // public surface — a user-supplied symbol CONTAINING whitespace would
  // make ('a b','c') collide with ('a','b c'). Refuse loudly instead.
  require(lefts.forall(s => s != null && !s.exists(_.isWhitespace)) &&
          rights.forall(s => s != null && !s.exists(_.isWhitespace)),
    "bpe merge-table symbols must be non-null and whitespace-free: the " +
      "rank-map separator (and the tokenizer itself) assume symbols come " +
      "from whitespace-split words")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_count expects array<string> tokens, got $other")
    }

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lefts.length * 2)
    var i = 0
    // key = left + ' ' + right (the separator cannot occur inside
    // a symbol built from whitespace-split words)
    while (i < lefts.length) {
      m.putIfAbsent(lefts(i) + " " + rights(i), i)
      i += 1
    }
    m
  }

  private def codepoints(s: String): scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out += s.substring(i, i + n)
      i += n
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var total = 0
    var t = 0
    while (t < len) {
      if (!arr.isNullAt(t)) {
        val w = arr.getUTF8String(t).toString
        if (w.nonEmpty) {
          val syms = codepoints(w)
          var done = false
          while (!done && syms.length > 1) {
            // lowest-rank pair present anywhere in the word
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = rank.get(syms(i) + " " + syms(i + 1))
              if (r != null && r.intValue() < best) best = r.intValue()
              i += 1
            }
            if (best == Int.MaxValue) done = true
            else {
              val l = lefts(best); val rr = rights(best)
              // apply ALL occurrences left-to-right, non-overlapping
              var j = 0
              while (j < syms.length - 1) {
                if (syms(j) == l && syms(j + 1) == rr) {
                  syms(j) = l + rr
                  syms.remove(j + 1)
                }
                j += 1
              }
            }
          }
          total += syms.length
        }
      }
      t += 1
    }
    total
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
