package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source — the de-facto interchange
  * format for LLM training corpora. The reference's extractor model
  * (SURVEY.md §1.2) serves any tabular source through a schema +
  * row-iterator contract; Spark's native json reader is the same idea
  * with a distributed, splittable scan: each line is a record, the
  * schema is inferred (or supplied — ALWAYS supply it at scale: an
  * inference pass reads the whole input once before the real scan).
  *
  * Scale posture: newline-delimited json is splittable, so a 100 TB
  * corpus fans out by HDFS/S3 block like parquet; corrupt lines land in
  * `_corrupt_record` (PERMISSIVE) instead of failing the job, matching
  * a pipeline's skip-bad-docs posture. When a schema is supplied, the
  * `_corrupt_record` column is appended to it if absent — PERMISSIVE
  * mode without that column would turn corrupt lines into
  * indistinguishable all-null rows, silently poisoning the corpus
  * instead of making bad docs filterable. */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** One JSONL file/dir as a DataFrame. Pass `schema` in production;
    * omitting it is fine for tests/ad-hoc (extra inference scan). A
    * supplied schema gains a `_corrupt_record` string column if it
    * lacks one — filter `col("_corrupt_record").isNull` for clean rows. */
  def table(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    val withCorrupt = schema.map { s =>
      if (s.fieldNames.contains(CorruptCol)) s
      else StructType(s.fields :+ StructField(CorruptCol, StringType, nullable = true))
    }
    withCorrupt.fold(r)(r.schema).json(path)
  }

  /** Register every *.jsonl under `dir` as a temp view named after the
    * file (mirrors [[Csv.registerDir]]). */
  def registerDir(spark: SparkSession, dir: String): Seq[String] =
    SourceDirs.register(spark, dir, ".jsonl")(table(spark, _))
}
