package graft.sources

import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** The reference's pluggability contract (SURVEY.md §2.1 S5): an exosql
  * extractor implements `schema/1,2` and `execute(config, quals,
  * columns)` — it is handed the pushed-down predicates ("quals") and the
  * required column list, and returns rows (`lib/exosql.ex` behaviour
  * [U]).
  *
  * Spark-native restatement: this trait is the extractor behaviour; the
  * DSv2 plumbing in [[ExtractorSource]] delivers Catalyst's pushed
  * filters and pruned columns to it, exactly as exosql's planner does —
  * except here pushdown is decided by Catalyst's optimizer and execution
  * is distributed over `partitions()` slices.
  */
trait Extractor extends Serializable {

  /** Table schema for the given options (exosql `schema/2`). */
  def schema(options: Map[String, String]): StructType

  /** Split the work into independent slices (1 = single partition).
    * Each slice is read by one Spark task — the distribution axis exosql
    * (single-process) does not have. */
  def partitions(options: Map[String, String]): Int = 1

  /** Which of the offered quals this extractor can apply at the source
    * (returned ones are CONSUMED; the rest Spark re-applies engine-side,
    * mirroring exosql's conservative re-filtering). */
  def acceptedQuals(options: Map[String, String], quals: Seq[Filter]): Seq[Filter] =
    Seq.empty

  /** Produce rows for one slice (exosql `execute/3`, sliced). Row values
    * must be external Scala/Java types matching `schema` field order —
    * always the FULL schema; column pruning is applied by the reader
    * (extractors may still use `columns` to fetch less). */
  def execute(options: Map[String, String], quals: Seq[Filter],
              columns: Seq[String], slice: Int, nSlices: Int): Iterator[Seq[Any]]
}

/** Extractor registry: name → implementation (exosql's context map). */
object Extractors {
  private val all = scala.collection.concurrent.TrieMap[String, Extractor](
    "env" -> new EnvExtractor,
    "metrics" -> new MetricsExtractor,
    "http" -> new HttpStubExtractor,
    "range" -> new RangeExtractor,
    "warc" -> new WarcExtractor)

  def register(name: String, e: Extractor): Unit = all.put(name, e)
  def apply(name: String): Extractor = all.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown extractor '$name' (have: ${all.keys.mkString(", ")})"))
}
