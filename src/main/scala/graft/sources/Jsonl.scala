package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  * a pipeline's skip-bad-docs posture. */
object Jsonl {

  /** One JSONL file/dir as a DataFrame. Pass `schema` in production;
    * omitting it is fine for tests/ad-hoc (extra inference scan). */
  def table(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r)(r.schema).json(path)
  }

  /** Register every *.jsonl under `dir` as a temp view named after the
    * file (mirrors [[Csv.registerDir]]). */
  def registerDir(spark: SparkSession, dir: String): Seq[String] = {
    val files = new java.io.File(dir).listFiles()
    val jsonls = if (files == null) Array.empty[java.io.File]
      else files.filter(_.getName.endsWith(".jsonl"))
    jsonls.map { f =>
      val name = f.getName.stripSuffix(".jsonl")
      table(spark, f.getPath).createOrReplaceTempView(name)
      name
    }.toSeq.sorted
  }
}
