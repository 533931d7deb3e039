package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 carrier for the extractor contract (SURVEY.md §2.1 S5,
  * §4): `SupportsPushDownFilters` delivers Catalyst's pushed predicates
  * as the extractor's "quals"; `SupportsPushDownRequiredColumns` delivers
  * the required-columns list; `planInputPartitions` distributes the
  * extractor's slices across the cluster.
  *
  * Usage: `spark.read.format("graft-extractor")
  *   .option("extractor", "range").option("end", "1000").load()`.
  */
class ExtractorSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-extractor"

  private def extractorFor(options: CaseInsensitiveStringMap): (Extractor, Map[String, String]) = {
    val opts = options.asScala.toMap
    val name = opts.getOrElse("extractor",
      throw new IllegalArgumentException("graft-extractor requires option 'extractor'"))
    (Extractors(name), opts)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (e, opts) = extractorFor(options)
    e.schema(opts)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (e, o) = extractorFor(opts)
    new ExtractorTable(e, o, schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

class ExtractorTable(e: Extractor, opts: Map[String, String], tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"extractor(${opts.getOrElse("extractor", "?")})"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExtractorScanBuilder(e, opts, tschema)
}

class ExtractorScanBuilder(e: Extractor, opts: Map[String, String], full: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var quals: Seq[Filter] = Seq.empty
  private var required: StructType = full

  /** Catalyst offers every convertible predicate; the extractor says
    * which it will apply. Everything is returned as residual (exosql is
    * equally conservative: quals are hints, the engine re-filters). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    quals = e.acceptedQuals(opts, filters.toSeq)
    filters // all residual — Spark re-applies, correctness never depends on the source
  }
  override def pushedFilters(): Array[Filter] = quals.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ExtractorScan(e, opts, full, required, quals)
}

class ExtractorScan(e: Extractor, opts: Map[String, String], full: StructType,
                    required: StructType, quals: Seq[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ExtractorScan(${opts.getOrElse("extractor", "?")}, quals=${quals.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(e.partitions(opts), 1)
    (0 until n).map(i => ExtractorPartition(i, n): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ExtractorReaderFactory(e, opts, full, required, quals)
}

case class ExtractorPartition(slice: Int, nSlices: Int) extends InputPartition

class ExtractorReaderFactory(e: Extractor, opts: Map[String, String],
                             full: StructType, required: StructType,
                             quals: Seq[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ExtractorPartition]
    new PartitionReader[InternalRow] {
      private val requiredIdx = required.fieldNames.map(full.fieldIndex).toIndexedSeq
      private val converter =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val it = e.execute(opts, quals, required.fieldNames.toIndexedSeq,
        p.slice, p.nSlices)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val fullRow = it.next()
          val pruned = requiredIdx.map(fullRow)
          current = converter(org.apache.spark.sql.Row.fromSeq(pruned))
            .asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
