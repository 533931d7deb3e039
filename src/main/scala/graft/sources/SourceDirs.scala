package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared directory→temp-views registration (the exosql "one table per
  * file in the configured directory" convention, `lib/csv.ex` [U]) —
  * used by [[Csv]] and [[Jsonl]]. */
private[sources] object SourceDirs {
  def register(spark: SparkSession, dir: String, ext: String)
              (table: String => DataFrame): Seq[String] = {
    val files = new java.io.File(dir).listFiles()
    val matching = if (files == null) Array.empty[java.io.File]
      else files.filter(_.getName.endsWith(ext))
    matching.map { f =>
      val name = f.getName.stripSuffix(ext)
      table(f.getPath).createOrReplaceTempView(name)
      name
    }.toSeq.sorted
  }
}
