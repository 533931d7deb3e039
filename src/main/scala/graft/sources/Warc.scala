package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
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
  * Two on-disk layouts, matching the two layouts in the wild:
  *
  *  - `.warc` — plain-text framing, records concatenated;
  *  - `.warc.gz` — ONE GZIP MEMBER PER RECORD, members concatenated
  *    (the actual Common-Crawl layout, ISO 28500 Annex C). Per-record
  *    members are what make a compressed crawl file splittable: any
  *    byte offset can resynchronize to the next member boundary
  *    without decompressing from the file start.
  *
  * The READER is an [[Extractor]] ("warc"), so the DSv2 plumbing
  * ([[ExtractorSource]]) delivers Catalyst's pruned column list and
  * distributes slices across the cluster. The 100 TB posture lives in
  * two properties:
  *
  *  - RECORD-BOUNDARY SPLITTING: files split at `splitBytes` byte
  *    offsets (one Spark task per split, the Hadoop input-split
  *    discipline); a task whose split starts mid-record scans forward
  *    to the next record boundary and a record belongs to the split
  *    containing its FIRST byte — no record is read twice or dropped,
  *    whatever the split size (spec-pinned: split-size invariance,
  *    both layouts).
  *  - COLUMN PUSHDOWN: when `payload` is not in the required columns,
  *    payload bytes are SKIPPED via Content-Length — for `.warc` a
  *    seek (no read), for `.warc.gz` a decompress-discard (inherent to
  *    gzip: member length is unknown until inflated) with no UTF-8
  *    decode and no string allocation.
  *
  * Boundary-resync caveats: for `.warc` the scan looks for the
  * `WARC/1.0\r\n` magic, so a PAYLOAD containing that exact byte
  * sequence at a split boundary could misalign one task (the writer
  * here frames text payloads where `\r` cannot occur). For `.warc.gz`
  * a candidate gzip magic (`1F 8B 08`) is VALIDATED by inflating the
  * member's head and requiring the record magic — a false positive
  * would need compressed bytes that form a valid gzip header AND
  * inflate to exactly `WARC/1.0\r\n`, which does not occur in
  * practice (the same validation every splittable Common-Crawl reader
  * performs).
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

  /** `close()`-isolating wrapper: a GZIPOutputStream must be closed to
    * release its Deflater, but the underlying per-partition file
    * stream outlives every member. */
  private class NonClosing(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def close(): Unit = out.flush()
  }

  /** Derive the extractor `splitBytes` that keeps ~`boundariesPerFile`
    * split boundaries inside EVERY written part file, clamped to
    * [minBytes, maxBytes] — so a gate reading its own fixture always
    * exercises split-boundary resync REGARDLESS of corpus scale
    * (ADVICE r14: a fixed 256 KiB silently stops covering resync when
    * the fixture shrinks below ~1 MiB/file; a fixed 16 KiB costs ~30×
    * the scan tasks at bench scale for no extra coverage — measured
    * round 14, e_sql_pipeline14 8.5→4.9 s). Extraction results are
    * split-invariant (ExtractorSpec pins), so only task count moves. */
  def resyncSplitBytes(spark: org.apache.spark.sql.SparkSession,
                       path: String, boundariesPerFile: Int = 4,
                       minBytes: Long = 16384L,
                       maxBytes: Long = 262144L): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(p).filter(_.isFile).map(_.getLen)
      .filter(_ > 0L)
    require(sizes.nonEmpty, s"resyncSplitBytes: no part files under $path")
    math.max(minBytes,
      math.min(maxBytes, sizes.min / boundariesPerFile))
  }

  /** Distributed WARC SINK: frame (id, uri, text) rows as WARC records,
    * one `.warc` (or, with `gzip=true`, `.warc.gz` — one gzip member
    * per record, the Common-Crawl layout) file per partition — the
    * write side of the crawl round-trip (the s7 sink discipline applied
    * to the record format). Overwrites `path`. */
  def write(df: DataFrame, idCol: String, uriCol: String, textCol: String,
            path: String, nFiles: Int = 4, gzip: Boolean = false): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val fs = new Path(path).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    // the session's Hadoop conf must reach the executor tasks (fs
    // settings/credentials for non-default filesystems); NULL uri/text
    // frame as empty header value / zero-length payload rather than NPE
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val suffix = if (gzip) ".warc.gz" else ".warc"
    df.select(col(idCol).cast("string"),
        coalesce(col(uriCol).cast("string"), lit("")),
        coalesce(col(textCol).cast("string"), lit("")))
      .repartition(nFiles, col(idCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new Path(path, f"part-$pid%05d$suffix")
          val out = p.getFileSystem(confSer.value).create(p, true)
          try rows.foreach { r =>
            // loud refusal beats an executor NPE (ADVICE r13): a WARC
            // record needs id, uri and payload — nullable upstream
            // columns must be filtered/coalesced by the caller
            require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
              "Warc.write: NULL id/uri/text row — filter or coalesce " +
                "nullable columns before the sink")
            val payload = r.getString(2).getBytes(StandardCharsets.UTF_8)
            val head = ("WARC/1.0\r\n" +
              "WARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:graft:${r.getString(0)}>\r\n" +
              s"WARC-Date: $FixtureDate\r\n" +
              s"WARC-Target-URI: ${r.getString(1)}\r\n" +
              s"Content-Length: ${payload.length}\r\n" +
              "\r\n").getBytes(StandardCharsets.ISO_8859_1)
            val sink: java.io.OutputStream =
              if (gzip) new GZIPOutputStream(new NonClosing(out), 8192)
              else out
            sink.write(head)
            sink.write(payload)
            sink.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
            if (gzip) sink.close() // finishes the member, frees the Deflater
          } finally out.close()
        }
      }
  }
}

/** The "warc" [[Extractor]]: byte-range-split record reader over a
  * directory of `.warc` / `.warc.gz` files. Options: `path` (required),
  * `splitBytes` (default 4 MiB). */
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
    val fs = new Path(path).getFileSystem(
      org.apache.spark.sql.GraftBridge.hadoopConf())
    fs.listStatus(new Path(path))
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".warc") ||
        s.getPath.getName.endsWith(".warc.gz")))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        (0L until st.getLen by splitBytes).map(off =>
          (st.getPath.toString, off, math.min(off + splitBytes, st.getLen)))
      }.toIndexedSeq
  }

  override def partitions(options: Map[String, String]): Int =
    splits(options).length

  /** Byte-count-tracking wrapper (reads AND skips) — the plain-text
    * path's split accounting runs on consumed raw bytes. */
  private class Counting(in: java.io.InputStream) extends java.io.InputStream {
    var count: Long = 0L
    override def read(): Int = {
      val b = in.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); if (r > 0) count += r; r
    }
    override def skip(n: Long): Long = {
      val s = in.skip(n); if (s > 0) count += s; s
    }
    override def close(): Unit = in.close()
  }

  /** Parse ONE record (headers + payload + CRLFCRLF separator) from an
    * already-positioned stream — shared by the plain path (positioned
    * after the consumed record magic) and the gzip path (positioned
    * after the validated member head's record magic). Skips payload
    * bytes without decoding when `needPayload` is false. */
  private def parseRecord(bin: java.io.InputStream, needPayload: Boolean,
                          file: String): Seq[Any] = {
    def readByte(): Int = bin.read()
    def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var b = readByte()
      while (b >= 0 && b != '\n') {
        sb.append(b.toChar); b = readByte()
        require(sb.length < 65536, s"warc: unterminated header line in $file")
      }
      require(b == '\n', s"warc: truncated header line in $file")
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r')
        sb.setLength(sb.length - 1)
      sb.toString
    }
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
    val payload: String =
      if (!needPayload) {
        var left = len
        while (left > 0) {
          var s = bin.skip(left)
          if (s == 0) { // skip() may be a no-op near buffer edges
            val b = bin.read()
            require(b >= 0, s"warc: truncated payload in $file")
            s = 1
          }
          left -= s
        }
        null
      } else {
        require(len <= Int.MaxValue, s"warc: payload too large ($len) in $file")
        val buf = new Array[Byte](len.toInt)
        var off = 0
        while (off < len) {
          val r = bin.read(buf, off, len.toInt - off)
          require(r > 0, s"warc: truncated payload in $file")
          off += r
        }
        new String(buf, StandardCharsets.UTF_8)
      }
    require(readByte() == '\r' && readByte() == '\n' &&
      readByte() == '\r' && readByte() == '\n',
      s"warc: missing record separator in $file")
    Seq(headers.getOrElse("WARC-Record-ID", null),
      headers.getOrElse("WARC-Type", null),
      headers.getOrElse("WARC-Date", null),
      headers.getOrElse("WARC-Target-URI", null),
      java.lang.Long.valueOf(len), payload)
  }

  override def execute(options: Map[String, String],
                       quals: Seq[org.apache.spark.sql.sources.Filter],
                       columns: Seq[String], slice: Int,
                       nSlices: Int): Iterator[Seq[Any]] = {
    val sp = splits(options)
    if (slice >= sp.length) return Iterator.empty
    val (file, start, end) = sp(slice)
    val needPayload = columns.contains("payload")
    if (file.endsWith(".warc.gz")) executeGz(file, start, end, needPayload)
    else executePlain(file, start, end, needPayload)
  }

  /** Plain-text-framed path: seek to the split, resync to the record
    * magic, stream records whose first byte is in [start, end). */
  private def executePlain(file: String, start: Long, end: Long,
                           needPayload: Boolean): Iterator[Seq[Any]] = {
    val fsPath = new Path(file)
    val in = fsPath.getFileSystem(
      org.apache.spark.sql.GraftBridge.hadoopConf()).open(fsPath)
    in.seek(start)
    val cin = new Counting(new java.io.BufferedInputStream(in, 64 * 1024))
    // a limit/early-stop query abandons the iterator before hasNext
    // returns false — close with the task, not only on exhaustion
    // (idempotent: FSDataInputStream.close is safe to call twice)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => cin.close()))
    def pos: Long = start + cin.count
    // position at the first record whose START byte is in [start, end):
    // split 0 starts exactly on a record; later splits scan forward for
    // the magic (the earliest possible record start with a partial
    // match of m bytes is pos - m, so the scan stops once that crosses
    // `end`)
    var primed = false // true = magic already consumed, a record follows
    var done = false
    if (start > 0L) {
      var m = 0
      var found = false
      var eof = false
      while (!found && !eof && (pos - m) < end) {
        val b = cin.read()
        if (b < 0) eof = true
        else if (b == Warc.Magic(m)) { m += 1; if (m == Warc.Magic.length) found = true }
        else m = if (b == Warc.Magic(0)) 1 else 0
      }
      if (!found || (pos - Warc.Magic.length) >= end) done = true
      else primed = true
    }
    new Iterator[Seq[Any]] {
      private var nextRow: Seq[Any] = _
      private def advance(): Unit = {
        nextRow = null
        if (done) return
        if (primed) { // magic consumed by the boundary scan
          primed = false
          nextRow = parseRecord(cin, needPayload, file)
        } else if (pos < end) { // next record starts in this split
          val first = cin.read()
          if (first < 0) { done = true; return } // clean end of file
          require(first == Warc.Magic(0), s"warc: bad record magic in $file @ $pos")
          var i = 1
          while (i < Warc.Magic.length) {
            require(cin.read() == Warc.Magic(i),
              s"warc: bad record magic in $file @ $pos")
            i += 1
          }
          nextRow = parseRecord(cin, needPayload, file)
        } else done = true
      }
      advance()
      override def hasNext: Boolean = {
        if (nextRow == null && !done) advance()
        val has = nextRow != null
        if (!has) cin.close()
        has
      }
      override def next(): Seq[Any] = {
        val r = nextRow
        nextRow = null
        r
      }
    }
  }

  /** Per-record-gzip-member path (`.warc.gz`, the Common-Crawl
    * layout): scan raw bytes for the gzip magic, VALIDATE each
    * candidate by inflating the member head and requiring the record
    * magic, and emit every validated member whose first compressed
    * byte is in [start, end). Uses two seekable streams — one raw
    * scanner, one inflater — both closed with the task. */
  private def executeGz(file: String, start: Long, end: Long,
                        needPayload: Boolean): Iterator[Seq[Any]] = {
    val fsPath = new Path(file)
    val fs = fsPath.getFileSystem(org.apache.spark.sql.GraftBridge.hadoopConf())
    val scanIn = fs.open(fsPath) // raw magic scanner
    val dataIn = fs.open(fsPath) // member validation + inflation
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit] { _ =>
        scanIn.close(); dataIn.close()
      })
    // inflate the member at `off` and return a stream positioned past
    // the record magic, or null if `off` is not a member start (bad
    // gzip header / deflate error / wrong record magic — the raw-scan
    // false-positive filter)
    def openMember(off: Long): java.io.InputStream = {
      dataIn.seek(off)
      try {
        val gz = new GZIPInputStream(
          new java.io.BufferedInputStream(dataIn, 64 * 1024), 8192)
        val head = new Array[Byte](Warc.Magic.length)
        var got = 0
        while (got < head.length) {
          val r = gz.read(head, got, head.length - got)
          if (r < 0) return null
          got += r
        }
        if (java.util.Arrays.equals(head, Warc.Magic)) gz else null
      } catch { case _: java.io.IOException => null }
    }
    // next VALIDATED member start at raw offset >= from and < limit —
    // the same partial-match scanner as the plain path (0x1F occurs
    // only at pattern position 0, so overlap handling is one branch);
    // a candidate that fails validation restarts the scan one byte
    // past it (false positives: ~1 per 16 MiB of compressed data for
    // a 3-byte magic, each costing one seek + a 10-byte inflate)
    def nextMember(from: Long, limit: Long): Long = {
      val GzMagic = Array(0x1F, 0x8B, 0x08)
      var searchFrom = from
      while (searchFrom < limit) {
        scanIn.seek(searchFrom)
        val bs = new java.io.BufferedInputStream(scanIn, 64 * 1024)
        var pos = searchFrom // bytes consumed so far → absolute offset
        var m = 0
        var found = false
        var eof = false
        while (!found && !eof && (pos - m) < limit) {
          val b = bs.read()
          if (b < 0) eof = true
          else {
            pos += 1
            if (b == GzMagic(m)) { m += 1; if (m == 3) found = true }
            else m = if (b == GzMagic(0)) 1 else 0
          }
        }
        if (!found || (pos - 3) >= limit) return -1L
        val candidate = pos - 3
        if (openMember(candidate) != null) return candidate
        searchFrom = candidate + 1
      }
      -1L
    }
    var memberAt = nextMember(start, end)
    new Iterator[Seq[Any]] {
      private var nextRow: Seq[Any] = _
      private def advance(): Unit = {
        nextRow = null
        if (memberAt < 0) return
        val gz = openMember(memberAt)
        require(gz != null, s"warc.gz: member vanished in $file @ $memberAt")
        nextRow = parseRecord(gz, needPayload, file)
        // the next member's start is unknown without the member's
        // compressed length — rescan from just past this magic; the
        // validated scan makes the position exact
        memberAt = nextMember(memberAt + 3, end)
      }
      override def hasNext: Boolean = {
        if (nextRow == null && memberAt >= 0) advance()
        nextRow != null
      }
      override def next(): Seq[Any] = {
        val r = nextRow
        nextRow = null
        r
      }
    }
  }
}
