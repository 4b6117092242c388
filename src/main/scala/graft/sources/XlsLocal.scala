package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_16LE

/** Legacy binary XLS (BIFF8) source/sink built from scratch on the
  * PUBLIC Microsoft Open Specifications: MS-CFB (the OLE2 compound
  * file container) and MS-XLS (the BIFF8 record stream). No xlrd/POI
  * analog exists in this sandbox and none is needed for the subset the
  * reference exercises — its xls path reads raw cell values through
  * xlrd row iteration (undatum/cmds/converter.py:112-131,167-190) and
  * writes tables through xlwt (formats/docx.py:50-54).
  *
  * Reader scope: FAT + miniFAT sector chains, the Workbook stream,
  * BOUNDSHEET sheet offsets, SST shared strings (compressed and
  * UTF-16 forms, rich/ext payloads skipped, CONTINUE splits at both
  * string and character boundaries), LABELSST / LABEL / NUMBER / RK /
  * MULRK / BOOLERR cells, FORMULA cached numeric/bool/string results.
  * Numbers stay raw doubles — exactly xlrd's `cell_value` view that
  * the reference stringifies; date XF styling is not resolved (the
  * reference's own xls path emits raw serials too).
  *
  * Writer scope: one worksheet, LABELSST/NUMBER/BOOLERR cells, SST
  * with record-boundary splitting, the spec-required FONT + 16-XF
  * table; the stream is zero-padded past the 4096-byte mini-stream
  * cutoff so it always lives in regular FAT sectors (padding after
  * EOF is dead space within the stream — readers stop at the EOF
  * record), and the CFB header grows a DIFAT chain once the stream
  * needs more than 109 FAT sectors (~7 MB). BIFF8 hard limits
  * (65536 rows, 256 columns, 32767-char cell strings) are REFUSED,
  * never truncated.
  *
  * Same shape contract as [[XlsxLocal]]: first row = field names,
  * records typed by Spark's JSON inference. Driver-side bounded by
  * format nature (one compound file), like the reference.
  */
object XlsLocal {

  // ------------------------------------------------------------------
  // MS-CFB container
  // ------------------------------------------------------------------

  private val CfbSig = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def i16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 3) & 0xFF) << 24)

  /** Extract a named stream ("Workbook"/"Book") from a CFB file. */
  private[graft] def cfbStream(bytes: Array[Byte], names: Seq[String]): Array[Byte] = {
    require(bytes.length >= 512 && CfbSig.indices.forall(i => bytes(i) == CfbSig(i)),
      "not a compound (OLE2) file")
    val sectorSize = 1 << i16(bytes, 30)
    val miniSize = 1 << i16(bytes, 32)
    val nFat = i32(bytes, 44)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)
    // sector 0 starts one full SECTOR after offset 0 — for v4 files
    // (4096-byte sectors) that is offset 4096, not 512
    def sector(id: Int): Int = (id + 1) * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109 && fatSectors.length < nFat) {
      val v = i32(bytes, 76 + 4 * i)
      if (v != FreeSect) fatSectors += v
      i += 1
    }
    var difat = firstDifat
    while (difat != EndOfChain && difat != FreeSect && fatSectors.length < nFat) {
      val base = sector(difat)
      var j = 0
      while (j < sectorSize / 4 - 1 && fatSectors.length < nFat) {
        val v = i32(bytes, base + 4 * j)
        if (v != FreeSect) fatSectors += v
        j += 1
      }
      difat = i32(bytes, base + sectorSize - 4)
    }
    val perSector = sectorSize / 4
    def fat(id: Int): Int = {
      val fs = fatSectors(id / perSector)
      i32(bytes, sector(fs) + 4 * (id % perSector))
    }
    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(size.toInt, 64))
      var s = start
      var guard = 0
      while (s != EndOfChain && s >= 0 && out.size < size) {
        val take = math.min(sectorSize.toLong, size - out.size).toInt
        out.write(bytes, sector(s), take)
        s = fat(s)
        guard += 1
        require(guard < (1 << 22), "CFB FAT chain cycle")
      }
      out.toByteArray
    }
    // directory
    val dir = readChain(firstDir, Long.MaxValue >> 1)
    final case class Entry(name: String, tpe: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { e =>
      val o = e * 128
      val nameLen = i16(dir, o + 64)
      val name =
        if (nameLen >= 2) new String(dir, o, nameLen - 2, UTF_16LE) else ""
      Entry(name, dir(o + 66) & 0xFF, i32(dir, o + 116),
        i32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.tpe == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root entry"))
    val target = entries.find(e => e.tpe == 2 && names.contains(e.name))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no stream named ${names.mkString("/")} " +
          s"(found: ${entries.filter(_.tpe == 2).map(_.name).mkString(", ")})"))
    if (target.size >= miniCutoff) readChain(target.start, target.size)
    else {
      // mini stream: 64-byte sectors inside the root entry's chain,
      // chained through the miniFAT
      val container = readChain(root.start, root.size)
      val miniFat = readChain(firstMiniFat, Long.MaxValue >> 1)
      val out = new java.io.ByteArrayOutputStream(target.size.toInt)
      var s = target.start
      var guard = 0
      while (s != EndOfChain && s >= 0 && out.size < target.size) {
        val take = math.min(miniSize.toLong, target.size - out.size).toInt
        out.write(container, s * miniSize, take)
        s = i32(miniFat, 4 * s)
        guard += 1
        require(guard < (1 << 22), "CFB miniFAT chain cycle")
      }
      out.toByteArray
    }
  }

  /** Write a CFB file holding ONE stream named "Workbook". The stream
    * is padded to >= 4096 bytes so it lives in regular FAT sectors
    * (no mini stream needed); the padding sits after the BIFF EOF
    * record, which every reader stops at.
    */
  private[graft] def cfbWrap(stream0: Array[Byte]): Array[Byte] = {
    val stream =
      if (stream0.length >= 4096) stream0
      else java.util.Arrays.copyOf(stream0, 4096)
    val dataSectors = (stream.length + 511) / 512
    // fixpoint: f FAT sectors map EVERY sector (g DIFAT + f FAT +
    // 1 dir + data); the header DIFAT holds 109 FAT refs, the rest
    // chain through g DIFAT sectors of 127 refs each (a headerless
    // writer would silently corrupt any stream past ~7 MB)
    var f = 1
    var g = 0
    var stable = false
    while (!stable) {
      val nf = (g + f + 1 + dataSectors + 127) / 128
      val ng = if (nf <= 109) 0 else (nf - 109 + 126) / 127
      if (nf == f && ng == g) stable = true else { f = nf; g = ng }
    }
    // layout: sectors [0..g) DIFAT, [g..g+f) FAT, g+f directory, data after
    val dirSector = g + f
    val totalSectors = dirSector + 1 + dataSectors
    val out = new java.io.ByteArrayOutputStream(512 * (1 + totalSectors))
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    // header
    out.write(CfbSig, 0, 8)
    out.write(new Array[Byte](16)) // CLSID
    w16(0x003E); w16(0x0003) // minor, major (512-byte sectors)
    w16(0xFFFE) // little-endian mark
    w16(9); w16(6) // sector shift, mini shift
    out.write(new Array[Byte](6))
    w32(0) // num dir sectors (v3: 0)
    w32(f) // num FAT sectors
    w32(dirSector) // first directory sector
    w32(0) // transaction
    w32(4096) // mini cutoff
    w32(EndOfChain); w32(0) // no miniFAT
    w32(if (g > 0) 0 else EndOfChain); w32(g) // DIFAT chain start/count
    var i = 0
    while (i < 109) { w32(if (i < f) g + i else FreeSect); i += 1 }
    // DIFAT sectors: 127 FAT refs each + next-DIFAT pointer
    var k = 0
    while (k < g) {
      var j = 0
      while (j < 127) {
        val fatIdx = 109 + k * 127 + j
        w32(if (fatIdx < f) g + fatIdx else FreeSect)
        j += 1
      }
      w32(if (k == g - 1) EndOfChain else k + 1)
      k += 1
    }
    // FAT sectors
    val fat = new Array[Int](f * 128)
    java.util.Arrays.fill(fat, FreeSect)
    i = 0
    while (i < g) { fat(i) = 0xFFFFFFFC; i += 1 } // DIFSECT marker
    i = 0
    while (i < f) { fat(g + i) = 0xFFFFFFFD; i += 1 } // FATSECT marker
    fat(dirSector) = EndOfChain // directory chain (one sector)
    i = 0
    while (i < dataSectors) {
      fat(dirSector + 1 + i) =
        if (i == dataSectors - 1) EndOfChain else dirSector + 2 + i
      i += 1
    }
    fat.foreach(w32)
    // directory sector: Root Entry + Workbook + 2 unused
    def dirEntry(name: String, tpe: Int, child: Int, start: Int, size: Int): Unit = {
      val nb = name.getBytes(UTF_16LE)
      out.write(nb, 0, nb.length)
      out.write(new Array[Byte](64 - nb.length))
      w16(nb.length + 2)
      out.write(tpe); out.write(1) // black
      w32(FreeSect); w32(FreeSect); w32(child) // left, right, child
      out.write(new Array[Byte](16 + 4 + 8 + 8)) // CLSID, state, times
      w32(start); w32(size); w32(0)
    }
    dirEntry("Root Entry", 5, 1, EndOfChain, 0)
    dirEntry("Workbook", 2, FreeSect, dirSector + 1, stream.length)
    out.write(new Array[Byte](128 * 2))
    // data sectors
    out.write(stream, 0, stream.length)
    val pad = dataSectors * 512 - stream.length
    if (pad > 0) out.write(new Array[Byte](pad))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // BIFF8 reader
  // ------------------------------------------------------------------

  /** Cursor over the BIFF record stream that transparently crosses
    * CONTINUE (0x003C) records — SST strings may split at any
    * character boundary, re-specifying the flags byte.
    */
  private final class RecCursor(stream: Array[Byte], startOff: Int) {
    var off: Int = startOff // start of current record's data
    var len: Int = i16(stream, startOff + 2)
    var pos: Int = 0 // within current record data
    private def dataAt(i: Int): Int = stream(off + 4 + i) & 0xFF
    def remaining: Int = len - pos
    /** advance into the following CONTINUE record */
    private def nextContinue(): Unit = {
      val nextOff = off + 4 + len
      val tpe = i16(stream, nextOff)
      require(tpe == 0x003C, f"expected CONTINUE record, got 0x$tpe%04x")
      off = nextOff; len = i16(stream, nextOff + 2); pos = 0
    }
    def u8(): Int = {
      if (remaining == 0) nextContinue()
      val v = dataAt(pos); pos += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0) nextContinue()
        val take = math.min(left, remaining)
        pos += take; left -= take
      }
    }
    /** one XLUnicodeRichExtendedString (MS-XLS 2.5.293) */
    def readString(): String = {
      val cch = u16()
      var grbit = u8()
      val rich = (grbit & 0x08) != 0
      val ext = (grbit & 0x04) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var read = 0
      while (read < cch) {
        if (remaining == 0) { nextContinue(); grbit = u8() }
        val wide = (grbit & 0x01) != 0
        val charsHere = math.min(cch - read,
          if (wide) remaining / 2 else remaining)
        // a wide run must split at char boundaries (even byte count);
        // a lone trailing byte would otherwise loop forever
        require(charsHere > 0, "malformed SST continuation split")
        var k = 0
        while (k < charsHere) {
          val c = if (wide) (u8() | (u8() << 8)) else u8()
          sb.append(c.toChar)
          k += 1
        }
        read += charsHere
      }
      skip(4 * cRun + cbExt)
      sb.toString
    }
  }

  /** decode an RK value (MS-XLS 2.5.276) */
  private[graft] def rkNum(v: Int): Double = {
    val base =
      if ((v & 2) != 0) (v >> 2).toDouble
      else java.lang.Double.longBitsToDouble((v.toLong & 0xFFFFFFFCL) << 32)
    if ((v & 1) != 0) base / 100.0 else base
  }

  /** Raw cell grid of sheet `page` as typed cells (reusing
    * [[XlsxLocal.Cell]]: 'n' number, 's' string, 'b' boolean).
    */
  def sheetRows(path: String, page: Int = 0): Vector[Vector[XlsxLocal.Cell]] =
    sheetRowsOf(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), page,
      what = path)

  /** Byte-array core of [[sheetRows]] — runs inside executor tasks for
    * [[readMany]] without touching the filesystem. `what` names the
    * workbook in errors (essential when one file of a readMany glob is
    * bad).
    */
  def sheetRowsOf(bytes: Array[Byte], page: Int = 0,
                  what: String = "workbook"): Vector[Vector[XlsxLocal.Cell]] = {
    val wb = cfbStream(bytes, Seq("Workbook", "Book"))
    // pass 1 over the globals substream: BOUNDSHEETs + SST
    var off = 0
    val sheets = Vector.newBuilder[Int]
    var sst = Vector.empty[String]
    var depth = 0
    var done = false
    while (!done && off + 4 <= wb.length) {
      val tpe = i16(wb, off); val len = i16(wb, off + 2)
      tpe match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x0085 =>
          // BOUNDSHEET: lbPlyPos(4), hsState(1), dt(1) — only dt=0
          // WORKSHEETS count toward the page index (chart sheets and
          // VBA modules would otherwise shift or hijack it). Bounded:
          // a truncated stream must raise a clear error, not AIOOBE
          require(off + 10 <= wb.length && len >= 6,
            s"corrupt BIFF8: truncated BOUNDSHEET record at offset $off")
          if ((wb(off + 9) & 0xFF) == 0) sheets += i32(wb, off + 4)
        case 0x00FC => // SST
          val cur = new RecCursor(wb, off)
          cur.skip(4) // total refs
          val unique = cur.u32()
          val b = Vector.newBuilder[String]
          var k = 0
          while (k < unique) { b += cur.readString(); k += 1 }
          sst = b.result()
        case _ =>
      }
      off += 4 + len
    }
    val sheetOffsets = sheets.result()
    require(page < sheetOffsets.length,
      s"$what has ${sheetOffsets.length} sheets, index $page out of range")
    // pass 2 over the selected sheet substream: cells
    import XlsxLocal.Cell
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Cell)]
    off = sheetOffsets(page)
    depth = 0; done = false
    while (!done && off + 4 <= wb.length) {
      val tpe = i16(wb, off); val len = i16(wb, off + 2)
      val d = off + 4
      def num(x: Double): String =
        if (x == math.rint(x) && math.abs(x) < 1e15) x.toLong.toString
        else x.toString
      tpe match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x00FD => // LABELSST
          cells += ((i16(wb, d), i16(wb, d + 2), Cell(sst(i32(wb, d + 6)), 's')))
        case 0x0204 => // LABEL (inline string cell)
          val cur = new RecCursor(wb, off)
          cur.skip(6)
          cells += ((i16(wb, d), i16(wb, d + 2), Cell(cur.readString(), 's')))
        case 0x0203 => // NUMBER
          cells += ((i16(wb, d), i16(wb, d + 2),
            Cell(num(java.lang.Double.longBitsToDouble(
              (i32(wb, d + 6).toLong & 0xFFFFFFFFL) |
                (i32(wb, d + 10).toLong << 32))), 'n')))
        case 0x027E => // RK
          cells += ((i16(wb, d), i16(wb, d + 2), Cell(num(rkNum(i32(wb, d + 6))), 'n')))
        case 0x00BD => // MULRK: first col, then (ixfe, rk) pairs, last col
          val row = i16(wb, d); val colFirst = i16(wb, d + 2)
          val nCells = (len - 6) / 6
          var k = 0
          while (k < nCells) {
            cells += ((row, colFirst + k, Cell(num(rkNum(i32(wb, d + 4 + 6 * k + 2))), 'n')))
            k += 1
          }
        case 0x0205 => // BOOLERR
          if ((wb(d + 7) & 0xFF) == 0) // fError = 0 -> boolean
            cells += ((i16(wb, d), i16(wb, d + 2),
              Cell(if (wb(d + 6) != 0) "true" else "false", 'b')))
        case 0x0006 => // FORMULA: cached result in bytes 6-13
          val row = i16(wb, d); val c = i16(wb, d + 2)
          if (i16(wb, d + 12) == 0xFFFF) {
            (wb(d + 6) & 0xFF) match {
              case 0 => // cached string in the following STRING record
                // SHRFMLA/ARRAY/TABLE records may sit between them;
                // bound every record-header peek (a truncated stream
                // must not read past the end)
                var so = off + 4 + len
                while (so + 4 <= wb.length &&
                    Set(0x003C, 0x04BC, 0x0221, 0x0236).contains(i16(wb, so)))
                  so += 4 + i16(wb, so + 2)
                if (so + 4 <= wb.length && i16(wb, so) == 0x0207) {
                  val cur = new RecCursor(wb, so)
                  cells += ((row, c, Cell(cur.readString(), 's')))
                }
              case 1 =>
                cells += ((row, c, Cell(if (wb(d + 8) != 0) "true" else "false", 'b')))
              case _ => // error / blank cached values -> skip
            }
          } else
            cells += ((row, c, Cell(num(java.lang.Double.longBitsToDouble(
              (i32(wb, d + 6).toLong & 0xFFFFFFFFL) |
                (i32(wb, d + 10).toLong << 32))), 'n')))
        case _ =>
      }
      off += 4 + len
    }
    if (cells.isEmpty) return Vector.empty
    val maxRow = cells.map(_._1).max
    val grid = Array.fill(maxRow + 1)(
      scala.collection.mutable.ArrayBuffer.empty[Cell])
    cells.foreach { case (r, c, v) =>
      val row = grid(r)
      while (row.length <= c) row += null
      row(c) = v
    }
    grid.map(_.toVector).toVector
  }

  /** First-row-header DataFrame read — same contract as
    * [[XlsxLocal.read]] (the reference's xls_to_jsonl,
    * converter.py:167-190).
    */
  def read(spark: SparkSession, path: String, page: Int = 0,
           startLine: Int = 0, fields: Seq[String] = Nil): DataFrame =
    XlsxLocal.fromGrid(spark, sheetRows(path, page).drop(startLine), fields,
      s"$path sheet $page")

  /** Per-file-distributed read of a directory/glob of BIFF8 workbooks —
    * same contract and plan shape as [[XlsxLocal.readMany]] (one task
    * per file, one schema inference over all JSON lines). The CFB
    * parser already works off a byte array, so no temp spill needed.
    */
  def readMany(spark: SparkSession, glob: String, page: Int = 0,
               startLine: Int = 0, fields: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val jsonLines = spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (name, stream) =>
        XlsxLocal.gridToJsonLines(
          sheetRowsOf(stream.toArray(), page, what = name).drop(startLine),
          fields, s"$name sheet $page")
      }
      .toDS()
    spark.read.json(jsonLines)
  }

  // ------------------------------------------------------------------
  // BIFF8 writer
  // ------------------------------------------------------------------

  private final class Biff {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    def rec(tpe: Int, data: Array[Byte]): Unit = {
      u16(tpe); u16(data.length); out.write(data, 0, data.length)
    }
    def size: Int = out.size
  }

  private def cellHeader(b: java.io.ByteArrayOutputStream, row: Int, col: Int): Unit = {
    b.write(row & 0xFF); b.write((row >> 8) & 0xFF)
    b.write(col & 0xFF); b.write((col >> 8) & 0xFF)
    b.write(15); b.write(0) // ixfe 15 = the default CELL XF (0-14 are style XFs)
  }

  private val MaxRecData = 8224

  /** Write `df` as a minimal single-sheet BIFF8 .xls file. BIFF8 hard
    * limits apply (65536 rows, 256 columns) — this is an EXPORT
    * format; refuse rather than truncate beyond them.
    */
  def write(df: DataFrame, path: String): Unit = {
    val flat = Converter.makeFlat(df)
    val schema = flat.schema
    require(schema.fields.length <= 256, "BIFF8 allows at most 256 columns")

    // collect cells; strings pool into the SST
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sstId(s: String): Int =
      sstIndex.getOrElseUpdate(s, sstIndex.size)
    var sstRefs = 0
    final case class C(row: Int, col: Int, kind: Char, num: Double, idx: Int)
    val cells = scala.collection.mutable.ArrayBuffer.empty[C]
    def addRow(row: Int, values: Seq[(Any, DataType)]): Unit =
      values.zipWithIndex.foreach { case ((v, dt), col) =>
        if (v != null) dt match {
          case ByteType | ShortType | IntegerType | LongType | FloatType |
               DoubleType | _: DecimalType =>
            cells += C(row, col, 'n',
              v.asInstanceOf[Number].doubleValue(), 0)
          case BooleanType =>
            cells += C(row, col, 'b', if (v.asInstanceOf[Boolean]) 1 else 0, 0)
          case TimestampType =>
            // Timestamp.toString appends a stray ".0" — use the same
            // ISO second-resolution shape as the xlsx serial path
            sstRefs += 1
            cells += C(row, col, 's', 0, sstId(
              v.asInstanceOf[java.sql.Timestamp].toLocalDateTime.format(
                java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))))
          case _ =>
            sstRefs += 1
            cells += C(row, col, 's', 0, sstId(v.toString))
        }
      }
    addRow(0, schema.fields.map(f => (f.name: Any, StringType: DataType)).toSeq)
    var rowNum = 1
    val it = flat.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      require(rowNum < 65536, "BIFF8 allows at most 65536 rows")
      addRow(rowNum, schema.fields.indices.map(i =>
        ((if (r.isNullAt(i)) null else r.get(i)): Any, schema(i).dataType)))
      rowNum += 1
    }

    // sheet substream
    val sheet = new Biff
    sheet.rec(0x0809, Array[Byte](0, 6, 0x10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    cells.foreach { c =>
      val b = new java.io.ByteArrayOutputStream(16)
      cellHeader(b, c.row, c.col)
      c.kind match {
        case 'n' =>
          val bits = java.lang.Double.doubleToLongBits(c.num)
          var k = 0
          while (k < 8) { b.write(((bits >> (8 * k)) & 0xFF).toInt); k += 1 }
          sheet.rec(0x0203, b.toByteArray)
        case 'b' =>
          b.write(c.num.toInt); b.write(0)
          sheet.rec(0x0205, b.toByteArray)
        case _ =>
          val idx = c.idx
          b.write(idx & 0xFF); b.write((idx >> 8) & 0xFF)
          b.write((idx >> 16) & 0xFF); b.write((idx >> 24) & 0xFF)
          sheet.rec(0x00FD, b.toByteArray)
      }
    }
    sheet.rec(0x000A, Array.empty)

    // workbook globals: BOF, BOUNDSHEET (position patched), SST, EOF
    val globals = new Biff
    globals.rec(0x0809, Array[Byte](0, 6, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val sheetName = "Sheet1".getBytes(UTF_16LE)
    val bs = new java.io.ByteArrayOutputStream()
    bs.write(new Array[Byte](4)) // lbPlyPos patched below
    bs.write(0); bs.write(0) // visible, worksheet
    bs.write(6); bs.write(1) // cch, grbit: UTF-16
    bs.write(sheetName, 0, sheetName.length)
    val boundsheetPatch = globals.size + 4 // offset of lbPlyPos field
    globals.rec(0x0085, bs.toByteArray)
    // MS-XLS requires a FONT and the 16-entry XF table (0-14 style XFs,
    // 15 = the default cell XF every cell references)
    val font = {
      val b = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { b.write(v & 0xFF); b.write((v >> 8) & 0xFF) }
      w16(200); w16(0); w16(0x7FFF); w16(0x0190) // height, grbit, icv auto, weight
      w16(0); b.write(0); b.write(0); b.write(0); b.write(0) // sss/uls/family/charset/rsv
      b.write(5); b.write(0); b.write("Arial".getBytes, 0, 5) // cch, compressed, name
      b.toByteArray
    }
    globals.rec(0x0031, font)
    (0 until 16).foreach { ix =>
      val b = new java.io.ByteArrayOutputStream(20)
      def w16(v: Int): Unit = { b.write(v & 0xFF); b.write((v >> 8) & 0xFF) }
      w16(0); w16(0) // ifnt, ifmt
      // style XFs: fStyle + parent 0xFFF; the cell XF (15): parent 0
      if (ix < 15) w16(0x0004 | (0xFFF << 4)) else w16(0)
      w16(0); w16(0); w16(0); w16(0); w16(0); w16(0) // align/rotate/borders
      w16(0x20C0) // icvFore 64 / icvBack 65 (the conventional defaults)
      require(b.size == 20, s"XF record must be 20 bytes, got ${b.size}")
      globals.rec(0x00E0, b.toByteArray)
    }
    // SST with CONTINUE splitting (string- and char-boundary capable)
    val sstChunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream(MaxRecData)
    def sstRoom: Int = MaxRecData - cur.size
    def flushChunk(): Unit = { sstChunks += cur.toByteArray; cur = new java.io.ByteArrayOutputStream(MaxRecData) }
    def w16c(v: Int): Unit = { cur.write(v & 0xFF); cur.write((v >> 8) & 0xFF) }
    def w32c(v: Int): Unit = { w16c(v & 0xFFFF); w16c((v >>> 16) & 0xFFFF) }
    w32c(sstRefs); w32c(sstIndex.size)
    sstIndex.keysIterator.foreach { s =>
      // cch is a 16-bit field and Excel's own cell limit is 32767 —
      // refuse, never truncate (same contract as the row/col limits)
      require(s.length <= 32767,
        s"BIFF8 cell strings are limited to 32767 chars (got ${s.length})")
      if (sstRoom < 4) flushChunk() // room for cch + grbit at least
      w16c(s.length); cur.write(1) // uncompressed UTF-16
      var i = 0
      while (i < s.length) {
        if (sstRoom < 2) { flushChunk(); cur.write(1) } // continuation grbit
        val c = s.charAt(i)
        w16c(c)
        i += 1
      }
    }
    flushChunk()
    globals.rec(0x00FC, sstChunks.head)
    sstChunks.tail.foreach(ch => globals.rec(0x003C, ch))
    globals.rec(0x000A, Array.empty)

    val globalsBytes = globals.out.toByteArray
    val sheetPos = globalsBytes.length
    // patch BOUNDSHEET lbPlyPos
    globalsBytes(boundsheetPatch) = (sheetPos & 0xFF).toByte
    globalsBytes(boundsheetPatch + 1) = ((sheetPos >> 8) & 0xFF).toByte
    globalsBytes(boundsheetPatch + 2) = ((sheetPos >> 16) & 0xFF).toByte
    globalsBytes(boundsheetPatch + 3) = ((sheetPos >> 24) & 0xFF).toByte
    val stream = new java.io.ByteArrayOutputStream(globalsBytes.length + sheet.size)
    stream.write(globalsBytes, 0, globalsBytes.length)
    sheet.out.writeTo(stream)

    val cfb = cfbWrap(stream.toByteArray)
    val fo = new java.io.FileOutputStream(path)
    try fo.write(cfb) finally fo.close()
  }
}
