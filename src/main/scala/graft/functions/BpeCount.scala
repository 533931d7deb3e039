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

  @transient private lazy val rank = BpeApply.rankMap(lefts, rights)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var total = 0
    var t = 0
    while (t < len) {
      if (!arr.isNullAt(t)) {
        val w = arr.getUTF8String(t).toString
        if (w.nonEmpty) {
          val syms = BpeApply.codepoints(w)
          BpeApply.mergeAll(syms, rank, lefts, rights)
          total += syms.length
        }
      }
      t += 1
    }
    total
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
