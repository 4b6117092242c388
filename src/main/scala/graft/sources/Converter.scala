package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format conversion — the reference's flagship `convert` command
  * (undatum/cmds/converter.py:461-523 two-phase stream rewrite;
  * support matrix README.rst:251-266) as DataFrameReader/Writer
  * dispatch. Spark's schema inference replaces the reference's
  * 1000-record discovery pass; its distributed write replaces the
  * 50k-record batching.
  *
  * Formats: csv, jsonl (json-lines), parquet, orc, avro, bson, xlsx,
  * xls, pickle (flat-record subset, [[PickleLocal]]) as sources AND
  * sinks; json (multiline doc/array), xml and docx
  * tables are READ-ONLY (the reference converts OUT of those shapes
  * into row formats — jsonl is the json sink). Compression codecs on text formats
  * (gz/bz2/xz... whatever Hadoop codecs ship) come free via file
  * extension on read and `compression` option on write. Default
  * output codecs mirror the reference: parquet=brotli-if-available
  * (we use zstd: brotli needs a native lib not shipped with Spark —
  * documented delta), orc=zstd, avro=deflate
  * (undatum/cmds/converter.py:362,377,414).
  *
  * `.br` brotli containers (reference fixture `2cols6rows.csv.br`,
  * via the external iterabledata package) are read through the
  * FROM-SCRATCH RFC 7932 decoder [[graft.codec.BrotliDec]] (round 6)
  * — no `org.brotli:dec` jar exists in this sandbox, so the decoder
  * implements the spec directly and is validated against a
  * reference-encoder stream matrix in BrotliSpec. Decode-only: parquet
  * still writes zstd where the reference would pick brotli
  * (undatum/cmds/converter.py:362 — documented delta; writing brotli
  * would need the encoder side too).
  */
object Converter {

  final case class ReadOptions(
      format: String,
      header: Boolean = true,
      delimiter: String = ",",
      encoding: String = "UTF-8",
      tagname: String = "", // XML rowTag / JSON array key
      inferSchema: Boolean = true
  )

  def read(spark: SparkSession, path: String, o: ReadOptions): DataFrame =
    o.format match {
      case "csv" =>
        // Spark 4 restricts charsets to a safe list unless the legacy
        // flag is on; the reference's corpus includes CP1251 fixtures.
        // The read is lazy, so set-then-restore on the caller's
        // session would break execution — instead the flag is set on a
        // CLONED session (shared SparkContext/catalog, isolated
        // SQLConf), so the caller's session is never mutated. The
        // returned DataFrame is bound to the clone; that only matters
        // for cross-session combination edge cases, and only on the
        // exotic-charset path.
        val sess =
          if (Set("utf-8", "us-ascii", "iso-8859-1", "utf-16", "utf-16be",
              "utf-16le", "utf-32").contains(o.encoding.toLowerCase)) spark
          else {
            // newSession() starts from the INITIAL SparkConf, not the
            // caller's runtime SQLConf — copy the runtime confs over
            // (timezone, ansi, caseSensitive, ...) so the clone
            // differs from the caller by exactly the one legacy flag
            val ns = spark.newSession()
            spark.conf.getAll.foreach { case (k, v) =>
              try ns.conf.set(k, v)
              catch { case scala.util.control.NonFatal(_) => () } // static confs refuse set
            }
            ns.conf.set("spark.sql.legacy.javaCharsets", "true")
            ns
          }
        sess.read
          .option("header", o.header.toString)
          .option("sep", o.delimiter)
          .option("encoding", o.encoding)
          .option("inferSchema", o.inferSchema.toString)
          // quoted embedded newlines are legal CSV and our own csv
          // sink writes them; without multiLine the reader splits the
          // record mid-value. Cost: a multiLine csv file is read as
          // ONE split (not line-splittable) — correctness over
          // parallelism here; columnar formats are the scale path
          .option("multiLine", "true")
          .csv(path)
      case "jsonl" => spark.read.json(path)
      case "json" =>
        // whole-doc JSON: root array, or array under --tagname
        // (converter.py:342-359)
        val df = spark.read.option("multiLine", "true").json(path)
        if (o.tagname.nonEmpty)
          df.select(explode(col(o.tagname)).as("r")).select("r.*")
        else df
      case "xml" =>
        spark.read.option("rowTag",
          if (o.tagname.nonEmpty) o.tagname else "row").xml(path)
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "avro" =>
        if (avroDatasourceAvailable(spark)) spark.read.format("avro").load(path)
        else AvroLocal.read(spark, path)
      case "bson" => BsonLocal.read(spark, path)
      case "pickle" => PickleLocal.read(spark, path)
      case "xlsx" =>
        // tagname doubles as the sheet index (the reference's
        // start_page, converter.py:192), mirroring its use as the XML
        // rowTag / JSON array key
        XlsxLocal.read(spark, singleLocalFile(path, ".xlsx"),
          page = if (o.tagname.forall(_.isDigit) && o.tagname.nonEmpty)
            o.tagname.toInt else 0)
      case "xls" =>
        XlsLocal.read(spark, singleLocalFile(path, ".xls"),
          page = if (o.tagname.forall(_.isDigit) && o.tagname.nonEmpty)
            o.tagname.toInt else 0)
      case "docx" =>
        DocxTables.read(spark, singleLocalFile(path, ".docx"),
          tableIndex = if (o.tagname.forall(_.isDigit) && o.tagname.nonEmpty)
            o.tagname.toInt else 0)
      case "warc" | "wet" =>
        // tagname doubles as a WARC-Type filter (comma-separated);
        // empty keeps the read() default (conversion + response)
        WarcLocal.read(spark, path,
          warcTypes = if (o.tagname.nonEmpty) o.tagname.split(",").map(_.trim).toSet
            else Set("conversion", "response"))
      case f => throw new IllegalArgumentException(s"unsupported source format: $f")
    }

  /** Extension -> format dispatch, the ONE table shared by
    * Analyzer.analyzeFile and the CLI (sink side defaults differ, so
    * the default is the caller's). Hadoop-codec suffixes (gz/bz2/xz)
    * are transparent to the Spark read and stripped first.
    */
  def formatOfExtension(path: String, default: String): String = {
    val n = path.toLowerCase.replaceAll("\\.(gz|bz2|xz)$", "")
    if (n.endsWith(".csv") || n.endsWith(".tsv")) "csv"
    else if (n.endsWith(".jsonl") || n.endsWith(".ndjson")) "jsonl"
    else if (n.endsWith(".json")) "json"
    else if (n.endsWith(".xml")) "xml"
    else if (n.endsWith(".parquet")) "parquet"
    else if (n.endsWith(".orc")) "orc"
    else if (n.endsWith(".avro")) "avro"
    else if (n.endsWith(".bson")) "bson"
    else if (n.endsWith(".pickle") || n.endsWith(".pkl")) "pickle"
    else if (n.endsWith(".xlsx")) "xlsx"
    else if (n.endsWith(".xls")) "xls"
    else if (n.endsWith(".docx")) "docx"
    else if (n.endsWith(".warc") || n.endsWith(".wet")) "warc"
    else default
  }

  /** The zip-container local readers need one FILE; accept the
    * directory our own sinks write and pick its single part file.
    */
  private def singleLocalFile(path: String, suffix: String): String = {
    val f = new java.io.File(path)
    if (!f.isDirectory) path
    else f.listFiles().filter(_.getName.endsWith(suffix)) match {
      case Array(one) => one.getAbsolutePath
      case parts => throw new IllegalArgumentException(
        s"$path: expected exactly one $suffix part file, found ${parts.length}")
    }
  }

  /** Is the spark-avro CONNECTOR on the classpath? (The core avro jar
    * always is; the datasource module is a separate artifact.)
    */
  def avroDatasourceAvailable(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("avro", spark.sessionState.conf)
      true
    } catch { case _: Throwable => false }

  /** Flatten complex (struct/array/map) columns to JSON strings so a
    * row becomes CSV-writable — the reference's `make_flat`
    * (undatum/cmds/converter.py:464-470).
    */
  def makeFlat(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def write(df: DataFrame, path: String, format: String,
            compression: String = "", header: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    format match {
      case "csv" =>
        makeFlat(df).write.mode("overwrite")
          .option("header", header.toString)
          .option("compression", if (compression.nonEmpty) compression else "none")
          // the writer TRIMS cell whitespace by default (univocity
          // ignore*WhiteSpace=true on write) — "trailing\n" would land
          // as "trailing" and break round-trip fidelity; the reader's
          // defaults are already non-trimming
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(path)
      case "jsonl" =>
        w.option("compression", if (compression.nonEmpty) compression else "none")
          .json(path)
      case "parquet" =>
        w.option("compression", if (compression.nonEmpty) compression else "zstd")
          .parquet(path)
      case "orc" =>
        w.option("compression", if (compression.nonEmpty) compression else "zstd")
          .orc(path)
      case "avro" =>
        if (avroDatasourceAvailable(df.sparkSession))
          w.format("avro")
            .option("compression", if (compression.nonEmpty) compression else "deflate")
            .save(path)
        else {
          // connector absent (this sandbox): single-stream core-avro
          // writer — the reference's own avro semantics (fastavro,
          // one thread, converter.py:414-440)
          new java.io.File(path).mkdirs()
          AvroLocal.write(df, s"$path/part-00000.avro",
            if (compression.nonEmpty) compression else "deflate")
        }
      case "bson" =>
        // reference writes BSON one bson.BSON.encode(dict) at a time
        // (converter.py:141-147) — same single-stream shape here
        new java.io.File(path).mkdirs()
        BsonLocal.write(df, s"$path/part-00000.bson")
      case "pickle" =>
        new java.io.File(path).mkdirs()
        PickleLocal.write(df, s"$path/part-00000.pickle")
      case "xlsx" =>
        new java.io.File(path).mkdirs()
        XlsxLocal.write(df, s"$path/part-00000.xlsx")
      case "xls" =>
        new java.io.File(path).mkdirs()
        XlsLocal.write(df, s"$path/part-00000.xls")
      case "warc" | "wet" =>
        // distributed per-partition .warc.gz (per-record gzip members)
        WarcLocal.write(df, path)
      case f => throw new IllegalArgumentException(s"unsupported sink format: $f")
    }
  }

  /** Convert = read + write; schema travels through Spark's inference
    * instead of the reference's two-pass reset-and-rescan.
    */
  def convert(spark: SparkSession, in: String, out: String,
              readOpts: ReadOptions, outFormat: String,
              compression: String = ""): Unit =
    write(read(spark, in, readOpts), out, outFormat, compression)

  /** Container formats Hadoop's codec registry does NOT handle
    * transparently (it covers gz/bz2/xz by extension): zip, zstd, lz4
    * — the reference treats these as first-class input containers
    * (undatum/common/iterable.py:10-27; fixtures
    * 2cols6rows.csv.{zip,lz4,zst}). A driver-side unpack to a temp
    * file, then the normal distributed read. Single-archive,
    * driver-bandwidth-bound by design: at scale the unpacked file
    * should be re-staged once, not unpacked per query (the reference
    * has the same single-stream constraint). zip: FIRST entry only
    * (matches the reference's single-member assumption).
    */
  def unpackToTemp(path: String): String = {
    import java.io.{BufferedInputStream, FileInputStream}
    val lower = path.toLowerCase
    if (lower.endsWith(".7z")) {
      // 7z is NOT stream-decodable (the archive directory lives at the
      // end), so commons-compress needs the seekable file, not an
      // InputStream — hence its own branch before `raw` opens.
      // commons-compress + xz both ship in /opt/spark/jars; matches
      // the reference's optional py7zr support (iterable.py:10-27).
      val sz = org.apache.commons.compress.archivers.sevenz.SevenZFile
        .builder().setFile(new java.io.File(path)).get()
      try {
        var e = sz.getNextEntry
        while (e != null && e.isDirectory) e = sz.getNextEntry
        require(e != null, s"empty 7z archive: $path")
        // FIRST file entry only — the same single-member assumption as
        // the zip branch and the reference
        val entry = e
        return copyToTemp(new java.io.InputStream {
          override def read(): Int = sz.read()
          override def read(b: Array[Byte], off: Int, len: Int): Int =
            sz.read(b, off, len)
        }, entry.getName)
      } finally sz.close()
    }
    val raw = new BufferedInputStream(new FileInputStream(path))
    // every failure before the copy loop's own finally (empty zip, bad
    // magic in a decompressor ctor, unknown suffix) must close `raw` —
    // a long-lived driver batch-analyzing bad archives would otherwise
    // leak one fd per failure
    val (in, innerName) =
      try {
        if (lower.endsWith(".zip")) {
          val z = new java.util.zip.ZipInputStream(raw)
          val e = z.getNextEntry
          require(e != null, s"empty zip archive: $path")
          (z: java.io.InputStream, e.getName)
        } else if (lower.endsWith(".zst")) {
          // zstd-jni ships with Spark (/opt/spark/jars)
          (new com.github.luben.zstd.ZstdInputStream(raw): java.io.InputStream,
            path.replaceAll("\\.zst$", ""))
        } else if (lower.endsWith(".lz4")) {
          // lz4-java frame format, also a Spark-bundled jar
          (new net.jpountz.lz4.LZ4FrameInputStream(raw): java.io.InputStream,
            path.replaceAll("\\.lz4$", ""))
        } else if (lower.endsWith(".br")) {
          // from-scratch RFC 7932 decoder (graft.codec.BrotliDec) —
          // whole-stream decode; brotli has no internal framing to
          // stream on, and containers are driver-unpacked here anyway
          (new java.io.ByteArrayInputStream(
            graft.codec.BrotliDec.decompressStream(raw)): java.io.InputStream,
            path.replaceAll("\\.br$", ""))
        } else throw new IllegalArgumentException(s"unsupported container: $path")
      } catch { case e: Throwable => raw.close(); throw e }
    copyToTemp(in, innerName)
  }

  /** Drain `in` into a temp file keeping the inner file's suffix (the
    * suffix drives the downstream format dispatch); closes `in`.
    */
  private def copyToTemp(in: java.io.InputStream, innerName: String): String = {
    val suffix = {
      val n = innerName.substring(innerName.lastIndexOf('/') + 1)
      val dot = n.lastIndexOf('.')
      if (dot >= 0) n.substring(dot) else ".dat"
    }
    val tmp = java.io.File.createTempFile("graft-unpack", suffix)
    tmp.deleteOnExit()
    val out = new java.io.FileOutputStream(tmp)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally { out.close(); in.close() }
    tmp.getAbsolutePath
  }

  private[graft] val ContainerSuffixes = Seq(".zip", ".zst", ".lz4", ".7z", ".br")

  /** Read through a container when the extension calls for it. */
  def readContainer(spark: SparkSession, path: String, o: ReadOptions): DataFrame = {
    val lower = path.toLowerCase
    if (ContainerSuffixes.exists(lower.endsWith))
      read(spark, unpackToTemp(path), o)
    else read(spark, path, o)
  }
}

/** Driver-side sniffing helpers — the reference detects encoding with
  * chardet over a 1MB prefix and the delimiter by counting candidates
  * in line 1 (undatum/utils.py:7-20). Spark has no sniffing, so these
  * run on a bounded prefix before the distributed read, exactly like
  * the reference's bounded pre-pass.
  */
object Sniff {

  /** Delimiter: the candidate with the max count in the first line. */
  def delimiter(firstLine: String): String = {
    val cands = Seq(",", ";", "\t", "|")
    cands.maxBy(d => firstLine.count(_ == d.charAt(0)))
  }

  /** Cheap charset detection on a byte prefix: BOM sniff first
    * (UTF-8/16/32 variants), BOM-less UTF-16 by NUL parity, then
    * UTF-8 validity test; the 8-bit fallback separates the Cyrillic
    * family (windows-1251 vs KOI8-R by which case band dominates)
    * from Western European (windows-1252 vs ISO-8859-1 by 0x80-0x9F
    * punctuation). The reference delegates to chardet
    * (undatum/utils.py:7-12), which covers more (Shift-JIS, EUC,
    * MacCyrillic, ...); the claim stays scoped to the encodings
    * listed here.
    */
  /** `complete = false` means the prefix was CUT at a byte budget
    * (sniffFile's 1MB cap): a multi-byte character truncated at the
    * boundary is then underflow, not an error. For a complete file
    * (the default) a dangling multi-byte lead at EOF IS malformed —
    * an ISO-8859-1 file ending in 0xE9 must not classify as UTF-8.
    */
  def encoding(prefix: Array[Byte], complete: Boolean = true): String = {
    def b(i: Int) = if (i < prefix.length) prefix(i) & 0xFF else -1
    if (b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF) return "UTF-8"
    if (b(0) == 0xFF && b(1) == 0xFE && b(2) == 0x00 && b(3) == 0x00) return "UTF-32LE"
    if (b(0) == 0x00 && b(1) == 0x00 && b(2) == 0xFE && b(3) == 0xFF) return "UTF-32BE"
    if (b(0) == 0xFF && b(1) == 0xFE) return "UTF-16LE"
    if (b(0) == 0xFE && b(1) == 0xFF) return "UTF-16BE"
    // BOM-less UTF-16 (common in Windows exports): mostly-Latin text
    // encodes as alternating NUL bytes — high-byte NULs on even
    // offsets = BE, on odd = LE. Threshold 30% keeps CJK-heavy UTF-16
    // (few NULs) from slipping through to the 8-bit fallbacks, while
    // no sane 8-bit text file contains NUL bytes at all.
    if (prefix.length >= 8) {
      var evenNul = 0; var oddNul = 0
      var i = 0
      while (i < prefix.length) {
        if (prefix(i) == 0) { if (i % 2 == 0) evenNul += 1 else oddNul += 1 }
        i += 1
      }
      val half = prefix.length / 2
      if (evenNul > half * 3 / 10 && oddNul == 0) return "UTF-16BE"
      if (oddNul > half * 3 / 10 && evenNul == 0) return "UTF-16LE"
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val out = java.nio.CharBuffer.allocate(prefix.length + 1)
    var res = dec.decode(java.nio.ByteBuffer.wrap(prefix), out, complete)
    if (!res.isError && complete) res = dec.flush(out)
    if (!res.isError) "UTF-8"
    else {
      // 8-bit fallback, chardet-style band frequencies (chardet's
      // langcyrillicmodel distinguishes the same encodings by letter
      // statistics; undatum/utils.py:7-12 delegates to it):
      //  - cp1251 puts UPPERCASE Cyrillic at 0xC0-0xDF and lowercase
      //    at 0xE0-0xFF; KOI8-R REVERSES the bands (lowercase at
      //    0xC0-0xDF). Natural text is overwhelmingly lowercase, so
      //    whichever band dominates names the encoding.
      //  - Western European text has SPARSE high bytes (accents in a
      //    mostly-ASCII stream); bytes in 0x80-0x9F (smart quotes,
      //    euro, dashes) are windows-1252 punctuation — ISO-8859-1
      //    reserves that range for control codes no text file uses.
      val hi = prefix.count(b => (b & 0xFF) >= 0xC0)
      if (hi > prefix.length / 10) {
        val upperBand = prefix.count(b => { val v = b & 0xFF; v >= 0xC0 && v <= 0xDF })
        val lowerBand = prefix.count(b => { val v = b & 0xFF; v >= 0xE0 })
        if (upperBand > 2 * lowerBand) "KOI8-R" else "windows-1251"
      } else if (prefix.exists(b => { val v = b & 0xFF; v >= 0x80 && v <= 0x9F }))
        "windows-1252"
      else "ISO-8859-1"
    }
  }

  /** Sniff a file's encoding + delimiter from a bounded DECODED
    * prefix. Handles three shapes the raw-bytes form got wrong:
    * a Spark-written dataset DIRECTORY (sniffs the first part file),
    * Hadoop-codec suffixes .gz/.bz2/.xz (sniffs decompressed bytes —
    * deflate streams are >10% high bytes and classified as cp1251),
    * and short reads (readNBytes loops to the cap; a single read()
    * is not guaranteed to fill the buffer, and an under-filled one
    * would mis-set the completeness flag).
    */
  def sniffFile(path: String, maxBytes: Int = 1 << 20): (String, String) = {
    val f0 = new java.io.File(path)
    val f =
      if (!f0.isDirectory) f0
      else Option(f0.listFiles()).getOrElse(Array.empty)
        .filter(p => p.isFile && !p.getName.startsWith("_") &&
          !p.getName.startsWith(".")).sortBy(_.getName).headOption
        .getOrElse(throw new IllegalArgumentException(s"no data files in $path"))
    val lower = f.getName.toLowerCase
    val raw = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    val in: java.io.InputStream =
      try {
        if (lower.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
        else if (lower.endsWith(".bz2") || lower.endsWith(".xz")) {
          // Spark ships the Hadoop codecs; resolve by extension
          val conf = new org.apache.hadoop.conf.Configuration()
          val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
            .getCodec(new org.apache.hadoop.fs.Path(f.getName))
          if (codec == null) raw else codec.createInputStream(raw)
        } else raw
      } catch { case e: Throwable => raw.close(); throw e }
    try {
      val bytes = in.readNBytes(maxBytes)
      // a full buffer means the stream continues past the cap — the
      // prefix may cut a multi-byte character, so decode tolerantly
      val enc = encoding(bytes, complete = bytes.length < maxBytes)
      val text = new String(bytes, enc)
      val line1 = text.linesIterator.nextOption().getOrElse("")
      (enc, delimiter(line1))
    } finally in.close()
  }
}
