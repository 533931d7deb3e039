package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** WARC-style record source/sink (SURVEY.md §2.1 S9 — the raw-crawl
  * record format a web-scale ingestion pipeline starts from, public
  * spec ISO 28500 / the Common-Crawl layout): records framed as
  *
  * {{{
  * WARC/1.0\r\n
  * <Header-Name>: <value>\r\n ...
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * The READER is an [[Extractor]] ("warc"), so the DSv2 plumbing
  * ([[ExtractorSource]]) delivers Catalyst's pruned column list and
  * distributes slices across the cluster. The 100 TB posture lives in
  * two properties:
  *
  *  - RECORD-BOUNDARY SPLITTING: files split at `splitBytes` byte
  *    offsets (one Spark task per split, the Hadoop input-split
  *    discipline); a task whose split starts mid-record scans forward
  *    to the next record magic and a record belongs to the split
  *    containing its FIRST byte — no record is read twice or dropped,
  *    whatever the split size (spec-pinned: split-size invariance).
  *  - COLUMN PUSHDOWN: when `payload` is not in the required columns,
  *    payload bytes are SKIPPED via Content-Length (a seek, not a
  *    read+decode) — header-only scans over 100 TB of crawl touch
  *    headers only.
  *
  * Boundary-scan caveat (shared with every offset-splittable WARC
  * reader): resynchronization looks for the `WARC/1.0\r\n` magic, so a
  * PAYLOAD containing that exact byte sequence at a split boundary
  * could misalign one task; real crawls store per-record gzip members
  * where this cannot occur, and the writer here frames text payloads
  * (no `\r`), where it cannot occur either.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("payload", StringType)))

  private[sources] val Magic =
    "WARC/1.0\r\n".getBytes(StandardCharsets.ISO_8859_1)

  /** Fixed date for the deterministic fixture writer (a crawl's real
    * dates ride the same header; determinism is the oracle contract). */
  val FixtureDate = "2026-01-01T00:00:00Z"

  /** Distributed WARC SINK: frame (id, uri, text) rows as WARC records,
    * one `.warc` file per partition — the write side of the crawl
    * round-trip (the s7 sink discipline applied to the record format).
    * Overwrites `path`. */
  def write(df: DataFrame, idCol: String, uriCol: String, textCol: String,
            path: String, nFiles: Int = 4): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    import org.apache.spark.sql.functions.col
    val fs = new Path(path).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    df.select(col(idCol).cast("string"), col(uriCol).cast("string"),
        col(textCol).cast("string"))
      .repartition(nFiles, col(idCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new Path(path, f"part-$pid%05d.warc")
          val out = p.getFileSystem(new Configuration()).create(p, true)
          try rows.foreach { r =>
            val payload = r.getString(2).getBytes(StandardCharsets.UTF_8)
            val head = ("WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:${r.getString(0)}>\r\n" +
              s"WARC-Date: $FixtureDate\r\n" +
              s"WARC-Target-URI: ${r.getString(1)}\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n").getBytes(StandardCharsets.ISO_8859_1)
            out.write(head)
            out.write(payload)
            out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
          } finally out.close()
        }
      }
  }
}

/** The "warc" [[Extractor]]: byte-range-split record reader over a
  * directory of `.warc` files. Options: `path` (required), `splitBytes`
  * (default 4 MiB). */
class WarcExtractor extends Extractor {

  override def schema(options: Map[String, String]): StructType = Warc.schema

  private def splits(options: Map[String, String]): IndexedSeq[(String, Long, Long)] = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("warc extractor requires option 'path'"))
    // DSv2 delivers option keys LOWERCASED (CaseInsensitiveStringMap)
    val splitBytes = options.get("splitbytes").orElse(options.get("splitBytes"))
      .getOrElse((4L << 20).toString).toLong
    require(splitBytes >= 64,
      s"splitBytes must be >= 64, got $splitBytes")
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.listStatus(new Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".warc"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        (0L until st.getLen by splitBytes).map(off =>
          (st.getPath.toString, off, math.min(off + splitBytes, st.getLen)))
      }.toIndexedSeq
  }

  override def partitions(options: Map[String, String]): Int =
    splits(options).length

  override def execute(options: Map[String, String],
                       quals: Seq[org.apache.spark.sql.sources.Filter],
                       columns: Seq[String], slice: Int,
                       nSlices: Int): Iterator[Seq[Any]] = {
    val sp = splits(options)
    if (slice >= sp.length) return Iterator.empty
    val (file, start, end) = sp(slice)
    val needPayload = columns.contains("payload")
    val fsPath = new Path(file)
    val in = fsPath.getFileSystem(new Configuration()).open(fsPath)
    in.seek(start)
    val bin = new java.io.BufferedInputStream(in, 64 * 1024)
    var pos = start
    def readByte(): Int = {
      val b = bin.read()
      if (b >= 0) pos += 1
      b
    }
    def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var b = readByte()
      while (b >= 0 && b != '\n') {
        sb.append(b.toChar); b = readByte()
        require(sb.length < 65536, s"warc: unterminated header line in $file")
      }
      require(b == '\n', s"warc: truncated header line in $file @ $pos")
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r')
        sb.setLength(sb.length - 1)
      sb.toString
    }
    def readN(n: Long, decode: Boolean): String = {
      if (!decode) {
        var left = n
        while (left > 0) {
          val skipped = bin.skip(left)
          require(skipped > 0, s"warc: truncated payload in $file @ $pos")
          left -= skipped
        }
        pos += n
        null
      } else {
        require(n <= Int.MaxValue, s"warc: payload too large ($n) in $file")
        val buf = new Array[Byte](n.toInt)
        var off = 0
        while (off < n) {
          val r = bin.read(buf, off, n.toInt - off)
          require(r > 0, s"warc: truncated payload in $file @ $pos")
          off += r
        }
        pos += n
        new String(buf, StandardCharsets.UTF_8)
      }
    }
    // position at the first record whose START byte is in [start, end):
    // split 0 starts exactly on a record; later splits scan forward for
    // the magic (the earliest possible record start with a partial
    // match of m bytes is pos - m, so the scan stops once that crosses
    // `end`)
    var primed = false // true = magic already consumed, a record follows
    var done = false
    if (start == 0L) primed = false
    else {
      var m = 0
      var found = false
      var eof = false
      while (!found && !eof && (pos - m) < end) {
        val b = readByte()
        if (b < 0) eof = true
        else if (b == Warc.Magic(m)) { m += 1; if (m == Warc.Magic.length) found = true }
        else m = if (b == Warc.Magic(0)) 1 else 0
      }
      if (!found || (pos - Warc.Magic.length) >= end) done = true
      else primed = true
    }
    new Iterator[Seq[Any]] {
      private var nextRow: Seq[Any] = _
      private def parseRecord(): Seq[Any] = {
        val headers = scala.collection.mutable.Map.empty[String, String]
        var line = readLine()
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          require(i > 0, s"warc: malformed header '$line' in $file")
          headers.put(line.substring(0, i).trim, line.substring(i + 1).trim)
          line = readLine()
        }
        val len = headers.getOrElse("Content-Length",
          throw new IllegalStateException(
            s"warc: record without Content-Length in $file")).toLong
        val payload = readN(len, needPayload)
        // trailing CRLFCRLF record separator
        require(readByte() == '\r' && readByte() == '\n' &&
          readByte() == '\r' && readByte() == '\n',
          s"warc: missing record separator in $file @ $pos")
        Seq(headers.getOrElse("WARC-Record-ID", null),
          headers.getOrElse("WARC-Type", null),
          headers.getOrElse("WARC-Date", null),
          headers.getOrElse("WARC-Target-URI", null),
          java.lang.Long.valueOf(len), payload)
      }
      private def advance(): Unit = {
        nextRow = null
        if (done) return
        if (primed) { // magic consumed by the boundary scan
          primed = false
          nextRow = parseRecord()
        } else if (pos < end) { // next record starts in this split
          val first = readByte()
          if (first < 0) { done = true; return } // clean end of file
          require(first == Warc.Magic(0), s"warc: bad record magic in $file @ $pos")
          var i = 1
          while (i < Warc.Magic.length) {
            require(readByte() == Warc.Magic(i),
              s"warc: bad record magic in $file @ $pos")
            i += 1
          }
          nextRow = parseRecord()
        } else done = true
      }
      advance()
      override def hasNext: Boolean = {
        if (nextRow == null && !done) advance()
        val has = nextRow != null
        if (!has) bin.close()
        has
      }
      override def next(): Seq[Any] = {
        val r = nextRow
        nextRow = null
        r
      }
    }
  }
}
