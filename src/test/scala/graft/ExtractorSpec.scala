package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 extractor contract (SURVEY.md S2–S5): schema inference, filter
  * pushdown reaching the source as quals, column pruning, partitioned
  * (sliced) reads. */
class ExtractorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def read(extractor: String, opts: (String, String)*) = {
    val r = spark.read.format("graft-extractor").option("extractor", extractor)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("env extractor serves the OS environment (exosql S4)") {
    import spark.implicits._
    val df = read("env")
    assert(df.columns.toSeq == Seq("name", "value"))
    val path = df.filter($"name" === "PATH").collect()
    assert(path.length == 1 && path.head.getString(1).nonEmpty)
  }

  test("metrics extractor serves JVM introspection (exosql S3 analog)") {
    import spark.implicits._
    val m = read("metrics").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("available_processors") > 0 && m("max_memory") > 0)
  }

  test("http stub: equality qual becomes the request (exosql S2)") {
    import spark.implicits._
    // no qual → full listing, base url
    val all = read("http", "url" -> "http://stub.local/api", "rows" -> "20")
    assert(all.count() == 20)
    assert(all.select($"requested_url").head().getString(0) == "http://stub.local/api")
    // qual on id → pushed to the source → URL carries the parameter
    val one = read("http", "url" -> "http://stub.local/api").filter($"id" === 7).collect()
    assert(one.length == 1)
    assert(one.head.getAs[String]("requested_url") == "http://stub.local/api?id=7")
  }

  test("range extractor: pushdown shrinks generation; slices partition the work") {
    import spark.implicits._
    val df = read("range", "start" -> "1", "end" -> "1000", "slices" -> "4")
      .filter($"id" > 900 && $"id" < 950)
    val rows = df.collect()
    assert(rows.length == 49)
    // pushdown observable: generated ids only span the narrowed range,
    // and the plan shows the pushed quals
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(id,900)") || plan.contains("quals"))
    assert(df.rdd.getNumPartitions == 4)
    // slice audit column proves distribution across partitions
    assert(rows.map(_.getAs[Int]("slice")).distinct.length > 1)
  }

  test("column pruning reaches the reader (required schema only)") {
    import spark.implicits._
    val df = read("range", "end" -> "50").select($"square")
    assert(df.schema.fieldNames.toSeq == Seq("square"))
    assert(df.collect().map(_.getLong(0)).sum == (1L to 50).map(i => i * i).sum)
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("square") && !scanLine.contains("slice"))
  }

  test("warc extractor: round-trip, split-size invariance, header-only pruning") {
    import spark.implicits._
    val out = "target/test_sink/warc_spec"
    val docs = (1L to 200L).map(i =>
        (i, s"http://x.local/$i", s"doc $i body " + ("word " * (i % 17).toInt).trim))
      .toDF("doc_id", "uri", "text")
    graft.sources.Warc.write(docs, "doc_id", "uri", "text", out, nFiles = 3)
    def rows(splitBytes: Long) =
      read("warc", "path" -> out, "splitBytes" -> splitBytes.toString)
        .select($"record_id", $"warc_type", $"warc_date", $"target_uri",
          $"content_length", $"payload")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getString(5))).toSet
    // round-trip: every record back with exact headers and payload
    val big = rows(1L << 20) // one split per file — pure parsing
    assert(big.size == 200)
    val expect = docs.collect().map { r =>
      val t = r.getString(2)
      (s"<urn:graft:${r.getLong(0)}>", "response", graft.sources.Warc.FixtureDate,
        r.getString(1), t.getBytes("UTF-8").length.toLong, t)
    }.toSet
    assert(big == expect)
    // record-boundary splitting: a split size far below record size
    // forces every task to resynchronize mid-record — the result set
    // must be IDENTICAL (no dropped or duplicated records)
    for (sb <- Seq(64L, 100L, 257L, 4096L)) {
      assert(rows(sb) == expect, s"splitBytes=$sb drifted")
    }
    // and the tiny split size really produced many partitions
    assert(read("warc", "path" -> out, "splitBytes" -> "100")
      .rdd.getNumPartitions > 10)
    // header-only projection: payload column absent from the scan's
    // read schema (the reader then SKIPS payload bytes via
    // Content-Length instead of reading + decoding them)
    val pruned = read("warc", "path" -> out, "splitBytes" -> "1048576")
      .select($"record_id", $"content_length")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("record_id") && !scanLine.contains("payload"))
    assert(pruned.collect().length == 200)
  }

  test("warc.gz extractor: per-record gzip members — round-trip, split invariance, pruning") {
    import spark.implicits._
    val out = "target/test_sink/warc_gz_spec"
    val docs = (1L to 200L).map(i =>
        (i, s"http://x.local/$i", s"doc $i body " + ("word " * (i % 17).toInt).trim))
      .toDF("doc_id", "uri", "text")
    graft.sources.Warc.write(docs, "doc_id", "uri", "text", out,
      nFiles = 3, gzip = true)
    // the layout really is one gzip member per record: each file must
    // contain as many gzip magics at member boundaries as records, and
    // plain gunzip of the whole file (members concatenate) must yield
    // the plain-text framing
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.endsWith(".warc.gz"))
    assert(files.length == 3)
    val oneFile = files.head.getPath
    val gunzipped = {
      val in = new java.util.zip.GZIPInputStream(fs.open(oneFile))
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = in.read(buf)
      while (r > 0) { bo.write(buf, 0, r); r = in.read(buf) }
      in.close()
      bo.toString("UTF-8")
    }
    val nRecords = "WARC/1\\.0\r\n".r.findAllIn(gunzipped).length
    assert(nRecords >= 2, "a 3-file split of 200 records holds >=2 each")
    def rows(splitBytes: Long) =
      read("warc", "path" -> out, "splitBytes" -> splitBytes.toString)
        .select($"record_id", $"warc_type", $"warc_date", $"target_uri",
          $"content_length", $"payload")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getString(5))).toSet
    val expect = docs.collect().map { r =>
      val t = r.getString(2)
      (s"<urn:graft:${r.getLong(0)}>", "response", graft.sources.Warc.FixtureDate,
        r.getString(1), t.getBytes("UTF-8").length.toLong, t)
    }.toSet
    assert(rows(1L << 20) == expect) // one split per file — pure parsing
    // member-boundary resynchronization: split sizes far below the
    // compressed file size force every task to scan+validate for gzip
    // member starts mid-file — the record set must be IDENTICAL
    for (sb <- Seq(64L, 100L, 257L, 4096L)) {
      assert(rows(sb) == expect, s"gz splitBytes=$sb drifted")
    }
    assert(read("warc", "path" -> out, "splitBytes" -> "100")
      .rdd.getNumPartitions > 10)
    // header-only projection prunes payload from the scan schema (gz
    // skips via decompress-discard — no UTF-8 decode, no allocation)
    val pruned = read("warc", "path" -> out, "splitBytes" -> "1048576")
      .select($"record_id", $"content_length")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("record_id") && !scanLine.contains("payload"))
    assert(pruned.collect().length == 200)
  }

  test("custom extractor registration (exosql user-module behaviour)") {
    import org.apache.spark.sql.types._
    Extractors.register("fib", new graft.sources.Extractor {
      override def schema(o: Map[String, String]) =
        StructType(Seq(StructField("n", IntegerType), StructField("fib", LongType)))
      override def execute(o: Map[String, String], quals: Seq[org.apache.spark.sql.sources.Filter],
                           cols: Seq[String], slice: Int, n: Int): Iterator[Seq[Any]] = {
        val k = o.getOrElse("n", "10").toInt
        Iterator.iterate((0, 0L, 1L)) { case (i, a, b) => (i + 1, b, a + b) }
          .take(k).map { case (i, a, _) => Seq[Any](i, a) }
      }
    })
    val df = read("fib", "n" -> "10")
    assert(df.count() == 10)
    assert(df.select("n", "fib").collect().map(r => r.getInt(0)).last == 9)
    assert(df.agg(max("fib")).head().getLong(0) == 34L)
  }

  def Extractors = graft.sources.Extractors
}
