package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** S1 — the reference's CSV extractor (`lib/csv.ex` [U]): every `*.csv`
  * in a directory is a table; the header row is the schema; ALL values
  * are strings (exosql carries no types — coercion happens
  * per-expression, SURVEY.md §1.3).
  *
  * Spark mapping is direct: `header=true` + NO inferSchema gives the
  * same all-strings scan. exosql's permissive per-expression coercion
  * (`WHERE csv_col > 3` parses per row, unparseable → NULL) is restored
  * by tagging every CSV column and letting [[CsvCoercion]] flip the
  * analyzer's ANSI string→numeric casts to TRY casts for tagged columns
  * only. Scales for free: Spark's CSV source is splittable and
  * distributed. */
object Csv {

  /** One CSV file as an all-strings table (exosql scan semantics); every
    * column carries the [[CsvCoercion.Tag]] marker so numeric contexts
    * coerce permissively. */
  def table(spark: SparkSession, path: String): DataFrame = {
    CsvCoercion.install(spark)
    val raw = spark.read.option("header", "true").csv(path)
    val meta = new MetadataBuilder().putBoolean(CsvCoercion.Tag, true).build()
    raw.select(raw.columns.map(c => col(c).as(c, meta)).toIndexedSeq: _*)
  }

  /** Register every *.csv under `dir` as a temp view named after the
    * file (exosql: one table per file in the configured directory). */
  def registerDir(spark: SparkSession, dir: String): Seq[String] =
    SourceDirs.register(spark, dir, ".csv")(table(spark, _))
}
