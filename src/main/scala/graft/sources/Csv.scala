package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — the reference's CSV extractor (`lib/csv.ex` [U]): every `*.csv`
  * in a directory is a table; the header row is the schema; ALL values
  * are strings (exosql carries no types — coercion happens
  * per-expression, SURVEY.md §1.3).
  *
  * Spark mapping is direct: `header=true` + NO inferSchema gives the
  * same all-strings scan; exosql's permissive per-expression coercion is
  * reproduced with `try_cast`/`to_number` (see Builtins). Scales for
  * free: Spark's CSV source is splittable and distributed. */
object Csv {

  /** One CSV file as an all-strings table (exosql scan semantics). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Register every *.csv under `dir` as a temp view named after the
    * file (exosql: one table per file in the configured directory). */
  def registerDir(spark: SparkSession, dir: String): Seq[String] = {
    val files = new java.io.File(dir).listFiles()
    val csvs = if (files == null) Array.empty[java.io.File]
      else files.filter(_.getName.endsWith(".csv"))
    csvs.map { f =>
      val name = f.getName.stripSuffix(".csv")
      table(spark, f.getPath).createOrReplaceTempView(name)
      name
    }.toSeq.sorted
  }
}
