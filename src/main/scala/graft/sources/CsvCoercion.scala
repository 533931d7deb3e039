package graft.sources

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, BinaryArithmetic, BinaryComparison, Cast, EvalMode, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** exosql's dynamic-coercion semantics over untyped (all-strings) CSV
  * columns (SURVEY.md §1.3; reference `lib/expr.ex`, `lib/csv.ex` [U]):
  * a string column used in a numeric comparison or arithmetic coerces
  * per-expression, and a value that doesn't parse becomes NULL — never a
  * runtime error.
  *
  * Spark 4 runs ANSI mode by default, so the implicit string→numeric
  * casts its analyzer inserts for `csv_col > 3` THROW on unparseable
  * input. This optimizer rule flips exactly those casts to TRY
  * evaluation — but only when every attribute under the cast comes from
  * a CSV scan, so typed tables keep full ANSI behavior. CSV provenance
  * is decided two ways, because the optimizer runs AFTER alias collapse:
  * attributes that still carry the [[Csv]] metadata tag, plus the output
  * sets of the plan's CSV `LogicalRelation`s (alias collapse rewrites
  * `tagged#21` back to the untagged scan attribute `raw#18`, so the
  * metadata alone is not visible by optimization time). Catalyst-native
  * (a `Rule[LogicalPlan]`, no UDF, no per-row overhead — TRY casts stay
  * inside whole-stage codegen).
  */
object CsvCoercion extends Rule[LogicalPlan] {
  /** Column-metadata marker identifying untyped CSV string columns. */
  val Tag = "graft.csv.string"

  /** Outputs of CSV relations carrying the exosql all-strings scan
    * signature (every data column StringType — the shape [[Csv.table]]
    * produces). A user's own `spark.read.schema(...).csv` with typed
    * columns does NOT match, so it keeps full ANSI semantics. */
  private def csvScanOutputs(plan: LogicalPlan): AttributeSet =
    AttributeSet(plan.collect {
      case lr: LogicalRelation if (lr.relation match {
            case fs: HadoopFsRelation =>
              fs.fileFormat.isInstanceOf[CSVFileFormat] &&
                fs.dataSchema.nonEmpty &&
                fs.dataSchema.forall(_.dataType.isInstanceOf[StringType])
            case _ => false
          }) => lr.output
    }.flatten)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val csvAttrs = csvScanOutputs(plan)
    plan.transformAllExpressions {
      case c @ Cast(child, dt, _, EvalMode.ANSI)
          if dt.isInstanceOf[NumericType] &&
            child.dataType.isInstanceOf[StringType] &&
            child.references.nonEmpty &&
            child.references.forall(a =>
              a.metadata.contains(Tag) || csvAttrs.contains(a)) =>
        c.copy(evalMode = EvalMode.TRY)
    }
  }

  /** Idempotently attach the rule to `spark`'s optimizer. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(CsvCoercion))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CsvCoercion

  /** Session-builder hook: `.withExtensions(CsvCoercion.extensions)`
    * registers the analysis-time [[CsvNumericCoercion]] (full exosql
    * float semantics). The optimizer-time TRY flip above still installs
    * lazily on first CSV read, so sessions built without the extension
    * degrade to "no crash, NULL on junk" rather than throwing. */
  def extensions(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(_ => CsvNumericCoercion)
}

/** Analysis-time half of exosql coercion: arithmetic or comparison
  * between an untyped CSV string column and a NUMBER evaluates in FLOAT
  * (exosql's dynamic `to_number` yields floats for decimal strings —
  * `"1.5" * 2 = 3.0`, reference `lib/expr.ex` [U]), never in the
  * integer type ANSI Spark picks (`try_cast('1.5' AS BIGINT)` would be
  * NULL, silently dropping rows exosql keeps).
  *
  * Runs inside the analyzer's resolution fixed point AFTER Spark's own
  * AnsiTypeCoercion has inserted its casts, so the pattern to undo is
  * `op(cast(taggedStr AS <numeric> ANSI), other)`: both sides are
  * re-cast to DOUBLE, the string side with TRY evaluation. Running at
  * analysis time (vs the optimizer fallback) is what lets the RESULT
  * TYPE be double, visible in the query schema — exactly what the
  * DuckDB oracle's `try_cast(col AS DOUBLE)` produces. String-vs-string
  * comparisons are untouched (exosql compares those lexically). */
object CsvNumericCoercion extends Rule[LogicalPlan] {

  private def taggedString(e: Expression): Boolean =
    e.dataType.isInstanceOf[StringType] && e.references.nonEmpty &&
      e.references.forall(_.metadata.contains(CsvCoercion.Tag))

  /** The tagged-string operand under Spark's inserted ANSI numeric cast
    * (or bare, if coercion hasn't fired yet this iteration). */
  private def unwrap(e: Expression): Option[Expression] = e match {
    case Cast(child, _: NumericType, _, EvalMode.ANSI) if taggedString(child) =>
      Some(child)
    case _ if taggedString(e) => Some(e)
    case _ => None
  }

  private def toDouble(e: Expression): Expression = unwrap(e) match {
    case Some(s) => Cast(s, DoubleType, None, EvalMode.TRY)
    case None if e.dataType == DoubleType => e
    case None => Cast(e, DoubleType)
  }

  /** Rewrite only when the op genuinely mixes a tagged string with a
    * numeric context: a side that is Spark's ANSI numeric cast of a
    * tagged string, or a bare tagged string opposite a numeric side. */
  private def mixesCsvAndNumber(l: Expression, r: Expression): Boolean = {
    def ansiNumCast(e: Expression): Boolean = e match {
      case Cast(child, _: NumericType, _, EvalMode.ANSI) => taggedString(child)
      case _ => false
    }
    ansiNumCast(l) || ansiNumCast(r) ||
      (taggedString(l) && r.dataType.isInstanceOf[NumericType]) ||
      (taggedString(r) && l.dataType.isInstanceOf[NumericType])
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case b: BinaryArithmetic
            if b.childrenResolved && mixesCsvAndNumber(b.left, b.right) =>
          b.withNewChildren(Seq(toDouble(b.left), toDouble(b.right)))
        case c: BinaryComparison
            if c.childrenResolved && mixesCsvAndNumber(c.left, c.right) =>
          c.withNewChildren(Seq(toDouble(c.left), toDouble(c.right)))
      }
    }
}
