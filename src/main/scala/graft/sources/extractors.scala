package graft.sources

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, LessThan}
import org.apache.spark.sql.types._

/** S4 (`lib/env.ex` [U]): OS environment variables as a table. */
class EnvExtractor extends Extractor {
  override def schema(o: Map[String, String]): StructType =
    StructType(Seq(StructField("name", StringType), StructField("value", StringType)))
  override def execute(o: Map[String, String], quals: Seq[Filter],
                       columns: Seq[String], slice: Int, n: Int): Iterator[Seq[Any]] =
    sys.env.iterator.map { case (k, v) => Seq[Any](k, v) }
}

/** S3 (`lib/node.ex` [U] — Erlang node introspection): the JVM/Spark
  * analog, runtime metrics as a table. */
class MetricsExtractor extends Extractor {
  override def schema(o: Map[String, String]): StructType =
    StructType(Seq(StructField("metric", StringType), StructField("value", LongType)))
  override def execute(o: Map[String, String], quals: Seq[Filter],
                       columns: Seq[String], slice: Int, n: Int): Iterator[Seq[Any]] = {
    val rt = Runtime.getRuntime
    Iterator(
      Seq[Any]("available_processors", rt.availableProcessors().toLong),
      Seq[Any]("total_memory", rt.totalMemory()),
      Seq[Any]("free_memory", rt.freeMemory()),
      Seq[Any]("max_memory", rt.maxMemory()),
      Seq[Any]("uptime_ms", java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime))
  }
}

/** S2 (`lib/http.ex` [U]): HTTP-backed table where quals become request
  * parameters. Offline stub: the "response" is a deterministic function
  * of the synthesized request URL, so the pushdown path (qual → request →
  * different data) is real and oracle-checkable, only the socket is fake.
  */
class HttpStubExtractor extends Extractor {
  override def schema(o: Map[String, String]): StructType = StructType(Seq(
    StructField("id", LongType), StructField("requested_url", StringType),
    StructField("payload", StringType), StructField("score", DoubleType)))

  /** Accept equality quals on id — they become request parameters,
    * exactly like exosql's HTTP extractor builds its GET URL from quals. */
  override def acceptedQuals(o: Map[String, String], quals: Seq[Filter]): Seq[Filter] =
    quals.collect { case f @ EqualTo("id", _) => f }

  override def execute(o: Map[String, String], quals: Seq[Filter],
                       columns: Seq[String], slice: Int, n: Int): Iterator[Seq[Any]] = {
    val base = o.getOrElse("url", "http://stub.local/api")
    val idParam = quals.collectFirst { case EqualTo("id", v) => v.toString }
    val url = base + idParam.map(v => s"?id=$v").getOrElse("")
    // offline: deterministic fake of the remote dataset the URL names
    val ids = idParam.map(v => Seq(v.toLong)).getOrElse(1L to o.getOrElse("rows", "20").toLong)
    ids.iterator.map(i => Seq[Any](i, url, s"payload-$i", i * 0.5))
  }
}

/** Range extractor (S6 table-function analog) with genuine pushdown:
  * accepted quals shrink what gets GENERATED, not just what survives the
  * engine-side filter — observable in the `generated` audit column. */
class RangeExtractor extends Extractor {
  override def schema(o: Map[String, String]): StructType = StructType(Seq(
    StructField("id", LongType), StructField("square", LongType),
    StructField("slice", IntegerType)))
  override def partitions(o: Map[String, String]): Int =
    o.getOrElse("slices", "4").toInt

  override def acceptedQuals(o: Map[String, String], quals: Seq[Filter]): Seq[Filter] =
    quals.collect {
      case f @ GreaterThan("id", _) => f
      case f @ LessThan("id", _) => f
    }

  override def execute(o: Map[String, String], quals: Seq[Filter],
                       columns: Seq[String], slice: Int, n: Int): Iterator[Seq[Any]] = {
    var lo = o.getOrElse("start", "1").toLong
    var hi = o.getOrElse("end", "100").toLong // inclusive
    quals.foreach {
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue() + 1)
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue() - 1)
      case _ =>
    }
    // contiguous slice of the (already qual-narrowed) range
    val total = math.max(hi - lo + 1, 0)
    val per = (total + n - 1) / math.max(n, 1)
    val s0 = lo + slice * per
    val s1 = math.min(s0 + per - 1, hi)
    (s0 to s1).iterator.map(i => Seq[Any](i, i * i, slice))
  }
}
