package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** BSON source/sink implemented from scratch against the public BSON
  * spec (bsonspec.org, version 1.1): a BSON file is a bare
  * concatenation of length-prefixed documents — exactly what the
  * reference reads with `bson.decode_file_iter` and writes with
  * `bson.BSON.encode` per record (undatum/common/iterable.py:138-139,
  * 203-205; cmds/converter.py:141-147). No connector jar exists in
  * this sandbox, and none is needed: the wire format is ~15 scalar
  * element types over little-endian ints.
  *
  * Read path (distributed per FILE): a BSON stream is not splittable —
  * document boundaries are only discoverable by walking the length
  * prefixes from offset 0, the same class as gzip text — so the unit
  * of parallelism is the file. `sc.binaryFiles` ships each file to one
  * task, the task walks documents and emits one JSON line per
  * document, and `spark.read.json` runs Spark's schema inference over
  * the result (replacing the reference's 1000-record discovery pass).
  * At 100 TB the input should be many BSON files (mongodump produces
  * per-collection chunks); a single giant file is a single task by
  * format necessity, as in the reference.
  *
  * Write path: single-stream driver-side writer like [[AvroLocal]] —
  * matching the reference's own one-thread write semantics. BSON here
  * is an EXPORT/interchange format; the scale path is parquet/orc.
  *
  * Type mapping (read → JSON): double/int32/int64/bool/string map
  * directly; datetime (0x09) → ISO-8601 UTC string; ObjectId (0x07) →
  * 24-char hex string; binary (0x05) → base64 string; regex (0x0B) →
  * "/pattern/options"; JS code (0x0D) → string; timestamp (0x11) →
  * int64; null/undefined/minkey/maxkey → null; decimal128 (0x13) →
  * full-precision decimal string via a from-scratch IEEE 754-2008 BID
  * decoder (the reference's Python bson maps it to Decimal128 objects
  * that its own JSON dump cannot serialize at all).
  */
object BsonLocal {

  // ------------------------------------------------------------------
  // decode: BSON document stream -> JSON lines
  // ------------------------------------------------------------------

  /** Parse a whole BSON file (concatenated documents) into one JSON
    * string per document. Pure function of the bytes — runs on
    * executors.
    */
  def toJsonLines(bytes: Array[Byte]): Iterator[String] = new Iterator[String] {
    private var off = 0
    override def hasNext: Boolean = off < bytes.length
    override def next(): String = {
      require(off + 4 <= bytes.length,
        s"corrupt BSON: truncated length prefix at offset $off")
      val size = readInt32(bytes, off)
      require(size >= 5 && off + size <= bytes.length,
        s"corrupt BSON: document size $size at offset $off (file ${bytes.length} bytes)")
      // capacity hint clamped: `size * 2` overflows Int for a >1 GiB
      // document, and the resulting NegativeArraySizeException would
      // escape the corrupt-input rewrap below (it guards the PARSE,
      // not this allocation)
      val sb = new java.lang.StringBuilder(
        math.min(size.toLong * 2, Int.MaxValue - 8L).toInt)
      // a corrupt interior (bad string length, unterminated cstring)
      // surfaces as a bounds error — rewrap with file context instead
      // of a bare AIOOBE
      try parseDocument(bytes, off, sb, array = false)
      catch {
        // IndexOutOfBounds covers both array and String-region overruns
        case e @ (_: IndexOutOfBoundsException |
                  _: NegativeArraySizeException) =>
          throw new IllegalArgumentException(
            s"corrupt BSON element inside document at offset $off", e)
      }
      off += size
      sb.toString
    }
  }

  private def readInt32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  private def readInt64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xFFL); i -= 1 }
    v
  }

  /** Parse the document starting at `off`; append its JSON rendering
    * ({...} or, for the array form, [...]) to `sb`. Returns the offset
    * one past the document's trailing NUL.
    */
  private def parseDocument(b: Array[Byte], off: Int, sb: java.lang.StringBuilder,
                            array: Boolean): Int = {
    val size = readInt32(b, off)
    val end = off + size - 1 // position of the trailing 0x00
    var o = off + 4
    sb.append(if (array) '[' else '{')
    var first = true
    while (o < end) {
      val tpe = b(o) & 0xFF
      o += 1
      // element name (cstring)
      val nameStart = o
      while (b(o) != 0) o += 1
      val name = new String(b, nameStart, o - nameStart, UTF_8)
      o += 1
      if (!first) sb.append(',')
      first = false
      if (!array) { appendJsonString(sb, name); sb.append(':') }
      o = parseValue(b, o, tpe, sb)
    }
    require(b(end) == 0, s"corrupt BSON: document at $off lacks trailing NUL")
    sb.append(if (array) ']' else '}')
    end + 1
  }

  /** Append the JSON rendering of one element value; return the offset
    * past it.
    */
  private def parseValue(b: Array[Byte], off: Int, tpe: Int,
                         sb: java.lang.StringBuilder): Int = tpe match {
    case 0x01 => // double
      val d = java.lang.Double.longBitsToDouble(readInt64(b, off))
      // Jackson (Spark's JSON reader) accepts the NaN/Infinity tokens
      // (allowNonNumericNumbers defaults true)
      if (java.lang.Double.isNaN(d)) sb.append("NaN")
      else if (d == Double.PositiveInfinity) sb.append("Infinity")
      else if (d == Double.NegativeInfinity) sb.append("-Infinity")
      else sb.append(d)
      off + 8
    case 0x02 | 0x0D | 0x0E => // string / JS code / symbol (deprecated)
      val len = readInt32(b, off) // includes trailing NUL
      appendJsonString(sb, new String(b, off + 4, len - 1, UTF_8))
      off + 4 + len
    case 0x03 => parseDocument(b, off, sb, array = false)
    case 0x04 => parseDocument(b, off, sb, array = true)
    case 0x05 => // binary: int32 len, subtype byte, payload -> base64
      val len = readInt32(b, off)
      // subtype 0x02 ("old binary", bsonspec.org): the payload is
      // itself prefixed with an inner int32 length — skip it so the
      // base64 carries only the real bytes
      val (pOff, pLen) =
        if (b(off + 4) == 0x02 && len >= 4) (off + 9, len - 4)
        else (off + 5, len)
      val b64 = java.util.Base64.getEncoder.encodeToString(
        java.util.Arrays.copyOfRange(b, pOff, pOff + pLen))
      appendJsonString(sb, b64)
      off + 5 + len
    case 0x06 | 0x0A | 0x7F | 0xFF => // undefined / null / maxkey / minkey
      sb.append("null"); off
    case 0x07 => // ObjectId: 12 bytes -> hex
      val hex = new java.lang.StringBuilder(24)
      var i = 0
      while (i < 12) { hex.append(f"${b(off + i) & 0xFF}%02x"); i += 1 }
      appendJsonString(sb, hex.toString)
      off + 12
    case 0x08 =>
      sb.append(if (b(off) != 0) "true" else "false"); off + 1
    case 0x09 => // UTC datetime: int64 millis -> ISO-8601
      val ms = readInt64(b, off)
      appendJsonString(sb,
        java.time.Instant.ofEpochMilli(ms).toString)
      off + 8
    case 0x0B => // regex: two cstrings -> "/pattern/options"
      var o = off
      val ps = o; while (b(o) != 0) o += 1
      val pat = new String(b, ps, o - ps, UTF_8); o += 1
      val os = o; while (b(o) != 0) o += 1
      val opts = new String(b, os, o - os, UTF_8); o += 1
      appendJsonString(sb, s"/$pat/$opts")
      o
    case 0x10 => sb.append(readInt32(b, off)); off + 4
    case 0x11 | 0x12 => sb.append(readInt64(b, off)); off + 8 // timestamp / int64
    case 0x13 => // decimal128 (IEEE 754-2008 BID) -> decimal STRING:
      // JSON numbers are doubles downstream, so quoting preserves all
      // 34 digits (the reference's Python bson yields Decimal128
      // objects its own JSON dump cannot serialize at all)
      appendJsonString(sb, decimal128ToString(readInt64(b, off + 8), readInt64(b, off)))
      off + 16
    case t =>
      throw new IllegalArgumentException(f"unknown BSON element type 0x$t%02x")
  }

  /** IEEE 754-2008 decimal128, BID (binary integer decimal) encoding —
    * the layout BSON mandates. Field extraction follows the standard's
    * two coefficient forms (high combination bits 11 vs not); the
    * 14-bit biased exponent (bias 6176) and 113-bit coefficient yield
    * coefficient × 10^exponent. A coefficient above 10^34-1 is
    * non-canonical and reads as zero per the standard.
    */
  private[graft] def decimal128ToString(high: Long, low: Long): String = {
    val neg = high < 0
    if ((high & 0x7C00000000000000L) == 0x7C00000000000000L) return "NaN"
    if ((high & 0x7800000000000000L) == 0x7800000000000000L)
      return if (neg) "-Infinity" else "Infinity"
    var exponent = 0
    var sigHigh = 0L
    if ((high & 0x6000000000000000L) == 0x6000000000000000L) {
      exponent = ((high & 0x1FFFE00000000000L) >>> 47).toInt
      sigHigh = 0x0002000000000000L | (high & 0x00007FFFFFFFFFFFL)
    } else {
      exponent = ((high & 0x7FFF800000000000L) >>> 49).toInt
      sigHigh = high & 0x0001FFFFFFFFFFFFL
    }
    exponent -= 6176
    val coeff = (BigInt(sigHigh) << 64) | (BigInt(low) & ((BigInt(1) << 64) - 1))
    val c = if (coeff > BigInt("9999999999999999999999999999999999")) BigInt(0)
            else coeff
    val signed = if (neg) -c else c
    new java.math.BigDecimal(new java.math.BigInteger(signed.toString), -exponent)
      .toString
  }

  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit =
    Esc.json(sb, s)

  /** Per-file decompression for the wrappers the reference supports
    * around BSON (gz/bz2/xz, undatum/common/iterable.py:10-27,57-71).
    * Runs on the EXECUTOR — each compressed file is one task, same
    * parallelism story as the plain read.
    */
  private[sources] def maybeDecompress(name: String, raw: Array[Byte]): Array[Byte] = {
    val lower = name.toLowerCase
    val in: java.io.InputStream =
      if (lower.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      else if (lower.endsWith(".bz2"))
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(raw))
      else if (lower.endsWith(".xz"))
        new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(
          new java.io.ByteArrayInputStream(raw))
      else return raw
    // raw.length * 4 overflows Int past 512 MB compressed — clamp
    val out = new ByteArrayOutputStream(
      math.max(64L, math.min(raw.length.toLong * 4, Int.MaxValue - 8L)).toInt)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Distributed-per-file BSON read: file → one task → JSON lines →
    * Spark schema inference. Files may be gz/bz2/xz-wrapped (the
    * reference's compression envelope for BSON).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val jsonLines = spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (name, stream) =>
        toJsonLines(maybeDecompress(name, stream.toArray()))
      }
      .toDS()
    spark.read.json(jsonLines)
  }

  // ------------------------------------------------------------------
  // encode: Row -> BSON document
  // ------------------------------------------------------------------

  private def writeInt32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
    o.write((v >> 16) & 0xFF); o.write((v >> 24) & 0xFF)
  }

  private def writeInt64(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def writeCString(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(!b.contains(0.toByte), s"BSON element name may not contain NUL: $s")
    o.write(b, 0, b.length); o.write(0)
  }

  private def writeString(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeInt32(o, b.length + 1); o.write(b, 0, b.length); o.write(0)
  }

  /** Serialize named (name, value, type) triples as one BSON document. */
  private def writeDocument(elems: Iterator[(String, Any, DataType)]): Array[Byte] = {
    val body = new ByteArrayOutputStream(64)
    elems.foreach { case (name, v, dt) => writeElement(body, name, v, dt) }
    val out = new ByteArrayOutputStream(body.size + 5)
    writeInt32(out, body.size + 5)
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  private def writeElement(o: ByteArrayOutputStream, name: String, v: Any,
                           dt: DataType): Unit = {
    if (v == null) { o.write(0x0A); writeCString(o, name); return }
    dt match {
      case StringType =>
        o.write(0x02); writeCString(o, name); writeString(o, v.toString)
      case IntegerType | ShortType | ByteType =>
        o.write(0x10); writeCString(o, name)
        writeInt32(o, v.asInstanceOf[Number].intValue())
      case LongType =>
        o.write(0x12); writeCString(o, name)
        writeInt64(o, v.asInstanceOf[Number].longValue())
      case DoubleType | FloatType =>
        o.write(0x01); writeCString(o, name)
        writeInt64(o, java.lang.Double.doubleToLongBits(
          v.asInstanceOf[Number].doubleValue()))
      case BooleanType =>
        o.write(0x08); writeCString(o, name)
        o.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case TimestampType =>
        o.write(0x09); writeCString(o, name)
        writeInt64(o, v.asInstanceOf[java.sql.Timestamp].getTime)
      case DateType =>
        // python bson has no date-only type; the reference json-dumps
        // dates as ISO strings — match that, not midnight-UTC millis
        o.write(0x02); writeCString(o, name); writeString(o, v.toString)
      case _: DecimalType =>
        o.write(0x02); writeCString(o, name); writeString(o, v.toString)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        o.write(0x05); writeCString(o, name)
        writeInt32(o, b.length); o.write(0) // subtype 0x00 = generic
        o.write(b, 0, b.length)
      case ArrayType(elem, _) =>
        o.write(0x04); writeCString(o, name)
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        val doc = writeDocument(
          xs.iterator.zipWithIndex.map { case (x, i) => (i.toString, x, elem) })
        o.write(doc, 0, doc.length)
      case st: StructType =>
        o.write(0x03); writeCString(o, name)
        val r = v.asInstanceOf[Row]
        val doc = writeDocument(st.fields.iterator.zipWithIndex.map { case (f, i) =>
          (f.name, if (r.isNullAt(i)) null else r.get(i), f.dataType)
        })
        o.write(doc, 0, doc.length)
      case MapType(_, valueType, _) =>
        o.write(0x03); writeCString(o, name)
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        val doc = writeDocument(
          m.iterator.map { case (k, x) => (String.valueOf(k), x, valueType) })
        o.write(doc, 0, doc.length)
      case other =>
        throw new IllegalArgumentException(s"bson sink: unsupported type $other " +
          "(flatten complex columns with Converter.makeFlat first)")
    }
  }

  /** Encode one Row as a standalone BSON document (exposed for tests —
    * the spec's own example bytes are asserted against this).
    */
  def encodeRow(row: Row, schema: StructType): Array[Byte] =
    writeDocument(schema.fields.iterator.zipWithIndex.map { case (f, i) =>
      (f.name, if (row.isNullAt(i)) null else row.get(i), f.dataType)
    })

  /** Write `df` as ONE .bson file (concatenated documents) at `path` —
    * single-stream, the reference's own write shape.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 16)
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val doc = encodeRow(it.next(), schema)
        out.write(doc, 0, doc.length)
      }
    } finally out.close()
  }
}
