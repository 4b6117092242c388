package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET source + sink, from scratch (ISO 28500 / the IIPC
  * WARC-1.1 spec — public). WARC is the container web crawls ship in;
  * CommonCrawl's WET sibling holds `conversion` records whose payload
  * is the extracted plain text — the standard RAW INPUT of a
  * web-scale training pipeline, which is why it belongs in this
  * engine's format matrix even though the reference (a tabular
  * converter) has no notion of it.
  *
  * Wire shape per record:
  * {{{
  *   WARC/1.0\r\n
  *   WARC-Type: conversion\r\n
  *   WARC-Target-URI: http://...\r\n
  *   Content-Length: N\r\n
  *   ...more headers...\r\n
  *   \r\n
  *   <exactly N payload bytes>\r\n\r\n
  * }}}
  * Payloads are LENGTH-delimited — a payload may legally contain
  * `\r\n\r\nWARC/1.0`, so the parser never scans for terminators.
  *
  * Scale shape: one file = one task (binaryFiles), the CommonCrawl
  * job layout — crawl shards are ~1 GiB .warc.gz files and a corpus
  * is parallel ACROSS files. The sink writes the true CC gzip
  * layout: every record its own gzip member (concatenated members
  * decode transparently; member boundaries are what make .warc.gz
  * seekable/splittable for index-driven readers).
  */
object WarcLocal {

  final case class WarcRow(
      file: String,
      warc_type: String,
      record_id: String,
      warc_date: String,
      target_uri: String,
      content_type: String,
      content_length: Long,
      text: String)

  // ------------------------------------------------------------------
  // parse
  // ------------------------------------------------------------------

  /** Parse every record in one (possibly gzip-multistream) WARC/WET
    * file. `stripHttp` removes the HTTP header block from
    * `application/http` payloads (WARC `response`/`request` records
    * wrap the raw HTTP message; the body is what a pipeline wants).
    */
  def parseFile(name: String, raw: Array[Byte],
                stripHttp: Boolean = true): Iterator[WarcRow] = {
    val bytes = maybeGunzip(name, raw)
    new Iterator[WarcRow] {
      private var pos = 0
      private def skipCrlf(): Unit = {
        while (pos < bytes.length &&
          (bytes(pos) == '\r'.toByte || bytes(pos) == '\n'.toByte)) pos += 1
      }
      skipCrlf()
      def hasNext: Boolean = pos < bytes.length
      def next(): WarcRow = {
        val startOff = pos
        def fail(msg: String): Nothing =
          throw new IllegalArgumentException(
            s"$name: $msg (record at byte $startOff)")
        def readLine(): String = {
          val s = pos
          while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
          if (pos >= bytes.length) fail("truncated header line")
          val e = if (pos > s && bytes(pos - 1) == '\r'.toByte) pos - 1 else pos
          pos += 1
          new String(bytes, s, e - s, UTF_8)
        }
        val version = readLine()
        if (!version.startsWith("WARC/")) fail(s"expected WARC/ marker, got '$version'")
        // headers: Name: value, case-insensitive names, obs-fold
        // continuations (leading SP/HT appends to the previous value)
        val headers = scala.collection.mutable.LinkedHashMap[String, String]()
        var lastKey: String = null
        var line = readLine()
        while (line.nonEmpty) {
          if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && lastKey != null)
            headers(lastKey) = headers(lastKey) + " " + line.trim
          else {
            val c = line.indexOf(':')
            if (c < 0) fail(s"malformed header '$line'")
            lastKey = line.substring(0, c).trim.toLowerCase
            headers(lastKey) = line.substring(c + 1).trim
          }
          line = readLine()
        }
        val len = headers.get("content-length") match {
          case Some(v) =>
            val n2 =
              try java.lang.Long.parseLong(v)
              catch { case _: NumberFormatException => fail(s"bad Content-Length '$v'") }
            if (n2 < 0) fail(s"negative Content-Length '$v'")
            n2
          case None => fail("missing Content-Length")
        }
        if (pos + len > bytes.length) fail(
          s"truncated payload: need $len bytes, have ${bytes.length - pos}")
        var bodyStart = pos
        var bodyLen = len.toInt
        pos += len.toInt
        skipCrlf() // the \r\n\r\n record terminator (lenient)
        val ctype = headers.getOrElse("content-type", "")
        if (stripHttp && ctype.startsWith("application/http")) {
          // payload = HTTP message; body begins after the first CRLFCRLF
          var i = bodyStart
          val end = bodyStart + bodyLen - 3
          var found = -1
          while (found < 0 && i < end) {
            if (bytes(i) == '\r'.toByte && bytes(i + 1) == '\n'.toByte &&
                bytes(i + 2) == '\r'.toByte && bytes(i + 3) == '\n'.toByte)
              found = i + 4
            i += 1
          }
          if (found >= 0) { bodyLen -= (found - bodyStart); bodyStart = found }
        }
        WarcRow(
          file = name,
          warc_type = headers.getOrElse("warc-type", ""),
          record_id = headers.getOrElse("warc-record-id", ""),
          warc_date = headers.getOrElse("warc-date", ""),
          target_uri = headers.getOrElse("warc-target-uri", ""),
          content_type = ctype,
          content_length = len,
          text = new String(bytes, bodyStart, bodyLen, UTF_8))
      }
    }
  }

  /** Java's GZIPInputStream decodes concatenated members
    * transparently — exactly the CC per-record-member layout.
    */
  private def maybeGunzip(name: String, raw: Array[Byte]): Array[Byte] = {
    if (!name.toLowerCase.endsWith(".gz")) return raw
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(
      math.max(64L, math.min(raw.length.toLong * 4, Int.MaxValue - 8L)).toInt)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Distributed WARC/WET read: glob → one task per file → records.
    * `warcTypes` restricts rows (CC WET readers keep `conversion`
    * only; pass empty to keep all, including warcinfo/request).
    */
  def read(spark: SparkSession, path: String,
           warcTypes: Set[String] = Set("conversion", "response"),
           stripHttp: Boolean = true): DataFrame = {
    import spark.implicits._
    val keep = warcTypes // avoid closing over the method's default tricks
    val ds = spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, stream) =>
        parseFile(name, stream.toArray(), stripHttp)
          .filter(r => keep.isEmpty || keep.contains(r.warc_type))
      }
      .toDS()
    ds.toDF()
  }

  /** Streaming WARC/WET source: Spark's `binaryFile` file-stream
    * source watches `dir` for NEW `.warc.gz` shards — the crawl-drop
    * pattern (a crawler keeps appending shard files; each lands in
    * exactly one micro-batch, checkpoint-tracked, so restarts never
    * re-ingest a shard). Each file parses inside a flatMap on the
    * executor — the micro-batch twin of [[read]]'s
    * one-task-per-file layout. Compose with
    * EncodeStream.streamingTextIngest for WET -> quality gate ->
    * tokenize -> exactly-once columnar encode.
    */
  def readStream(spark: SparkSession, dir: String,
                 warcTypes: Set[String] = Set("conversion", "response"),
                 stripHttp: Boolean = true,
                 // accept BOTH the .warc* and .wet* families by
                 // default: CC WET shards are routinely named
                 // *.wet.gz (an extension batch read() and
                 // Converter.formatOfExtension both recognize), and a
                 // warc-only glob would stream such a drop dir as
                 // zero rows with no error
                 pathGlob: String = "*.{warc,wet}*"): DataFrame = {
    import spark.implicits._
    val keep = warcTypes
    val strip = stripHttp
    spark.readStream.format("binaryFile")
      // streaming file sources refuse schema inference; binaryFile's
      // schema is fixed by the format, stated here verbatim
      .schema(new org.apache.spark.sql.types.StructType()
        .add("path", "string").add("modificationTime", "timestamp")
        .add("length", "long").add("content", "binary"))
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        parseFile(name, bytes, strip)
          .filter(r => keep.isEmpty || keep.contains(r.warc_type))
      }
      .toDF()
  }

  // ------------------------------------------------------------------
  // write
  // ------------------------------------------------------------------

  /** Bytes of ONE WET `conversion` record (exposed for tests). The
    * record id is deterministic (md5 of uri+date+text) so writes are
    * reproducible — the spec only asks for global uniqueness.
    */
  def encodeRecord(uri: String, date: String, text: String): Array[Byte] = {
    // header VALUES must not contain CR/LF or other control bytes — a
    // crafted uri like "http://x/\r\nWARC-Type: evil" would inject a
    // header line and desynchronize Content-Length. Payload needs no
    // escaping (length-delimited).
    def hdr(v: String): String = v.map(c => if (c < ' ') ' ' else c)
    val u = hdr(uri)
    val dt = hdr(date)
    val payload = text.getBytes(UTF_8)
    val idSrc = java.security.MessageDigest.getInstance("MD5")
      .digest((uri + "\u0000" + date + "\u0000" + text).getBytes(UTF_8))
    val hex = idSrc.map(b => f"$b%02x").mkString
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        s"WARC-Record-ID: <urn:md5:$hex>\r\n" +
        s"WARC-Date: $dt\r\n" +
        s"WARC-Target-URI: $u\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Distributed WET sink: each partition writes one
    * `part-NNNNN.warc.gz` under `dir` through the Hadoop FileSystem
    * (file:// locally, HDFS/S3A on a cluster — executors never assume
    * a shared local disk), every record its own gzip member (the CC
    * layout). Expects string columns (uri, date, text).
    */
  def write(df: DataFrame, dir: String, uriCol: String = "target_uri",
            dateCol: String = "warc_date", textCol: String = "text"): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs0 = dirPath.getFileSystem(conf.value)
    fs0.delete(dirPath, true)
    fs0.mkdirs(dirPath)
    df.select(col(uriCol).cast("string"), col(dateCol).cast("string"),
        col(textCol).cast("string"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          // task-commit protocol: write to an attempt-unique dotfile,
          // rename into place on success. Retried/speculative attempts
          // never interleave bytes in the final name; the rename loser
          // (a zombie attempt racing a committed one) deletes its temp.
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val p = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.warc.gz")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part-$pid%05d-attempt-${tc.taskAttemptId()}.warc.gz.tmp")
          val fs = p.getFileSystem(conf.value)
          val raw = fs.create(tmp, true)
          try {
            it.foreach { row =>
              val rec = encodeRecord(
                if (row.isNullAt(0)) "" else row.getString(0),
                if (row.isNullAt(1)) "" else row.getString(1),
                if (row.isNullAt(2)) "" else row.getString(2))
              // one gzip member per record; close() (not finish())
              // ends the member AND releases the native Deflater —
              // finish() leaves one native object per record alive
              // until GC, a real leak on million-record shards. The
              // NonClosingStream wrapper keeps the file open across
              // members.
              val gz = new java.util.zip.GZIPOutputStream(
                new NonClosingStream(raw), 1 << 16)
              gz.write(rec, 0, rec.length)
              gz.close()
            }
          } finally raw.close()
          // commit: first attempt to rename wins; HDFS rename refuses
          // to overwrite, so a loser cleans up its temp and moves on
          if (!fs.rename(tmp, p)) {
            fs.delete(tmp, false)
            if (!fs.exists(p))
              throw new java.io.IOException(s"warc sink: commit failed for $p")
          }
        }
      }
  }

  /** Wraps a stream so per-record GZIPOutputStream.close()/finish()
    * cannot close the underlying file between members.
    */
  private final class NonClosingStream(under: java.io.OutputStream)
      extends java.io.FilterOutputStream(under) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      under.write(b, off, len)
    override def close(): Unit = under.flush() // keep the file open
  }
}
