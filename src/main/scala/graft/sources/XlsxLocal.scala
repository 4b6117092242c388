package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8
import javax.xml.stream.XMLStreamConstants

/** XLSX source/sink built from scratch on the public OOXML container
  * layout (ECMA-376: a zip holding `xl/workbook.xml`,
  * `xl/worksheets/sheetN.xml`, optional `xl/sharedStrings.xml`) —
  * JDK zip + StAX only, no POI. The reference reads spreadsheets via
  * openpyxl with first-row-as-field-names semantics and a start_page /
  * start_line window (undatum/cmds/converter.py:192-217 xlsx_to_jsonl)
  * and writes tables back as xlsx (formats/docx.py:55-58); this mirrors
  * both directions.
  *
  * Shape contract (matches xlsx_to_jsonl): row 1 = field names unless
  * `fields` is given; each later row becomes a record of
  * (field -> cell value); records run through `spark.read.json` so
  * Spark's inference assigns column types exactly as the jsonl
  * convert path would.
  *
  * Scale note: XLSX is a driver-side bounded read by format nature
  * (one zip, central directory, shared-string table) — the reference
  * is equally single-threaded here. Spreadsheets are an ingest/export
  * format; convert to parquet for anything large.
  */
object XlsxLocal {

  // ------------------------------------------------------------------
  // read
  // ------------------------------------------------------------------

  /** One parsed cell: lexical value + the sheet's own type tag
    * ('n' number, 's' string — shared/inline/formula-cached, 'b'
    * boolean, 'd' date — a numeric cell whose style is a date format,
    * lex already converted to ISO). Keeping the tag is what lets a
    * STRING cell "123" round-trip as a string instead of being
    * re-guessed as a number.
    */
  final case class Cell(lex: String, kind: Char)

  /** Raw cell grid of sheet `page` (0-based, workbook order): rows of
    * typed cells, `null` for gaps. Values keep their XML lexical form:
    * numbers as the <v> text, shared/inline strings resolved, booleans
    * as "true"/"false".
    */
  def sheetRows(path: String, page: Int = 0): Vector[Vector[Cell]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val dateStyles = Option(zip.getEntry("xl/styles.xml"))
        .map(e => parseDateStyles(zip.getInputStream(e)))
        .getOrElse(Set.empty[Int])
      val sheetName = sheetEntryName(zip, page)
      val entry = Option(zip.getEntry(sheetName)).getOrElse(
        throw new IllegalArgumentException(s"$path: no worksheet $sheetName"))
      parseSheet(zip.getInputStream(entry), shared, dateStyles)
    } finally zip.close()
  }

  /** Builtin numFmtIds Excel renders as dates/times (ECMA-376
    * §18.8.30) plus the 27-36/50-58 East-Asian calendar range.
    */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Which cellXfs style indexes format a number as a DATE: builtin
    * date numFmtIds plus custom formatCodes containing date tokens
    * (y/m/d/h/s outside quoted literals and [] sections) — the same
    * heuristic openpyxl applies.
    */
  private def parseDateStyles(in: java.io.InputStream): Set[Int] = {
    val r = staxReader(in)
    val customDate = scala.collection.mutable.Set.empty[Int]
    val xfFmts = Vector.newBuilder[Int]
    var inCellXfs = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "numFmt" =>
                var id = -1; var code = ""
                var i = 0
                while (i < r.getAttributeCount) {
                  r.getAttributeLocalName(i) match {
                    case "numFmtId" => id = r.getAttributeValue(i).toInt
                    case "formatCode" => code = r.getAttributeValue(i)
                    case _ =>
                  }
                  i += 1
                }
                if (id >= 0 && isDateFormatCode(code)) { customDate += id; () }
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                var fmt = 0
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "numFmtId")
                    fmt = r.getAttributeValue(i).toInt
                  i += 1
                }
                xfFmts += fmt
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "cellXfs") inCellXfs = false
          case _ =>
        }
      }
    } finally r.close()
    xfFmts.result().zipWithIndex.collect {
      case (fmt, idx) if BuiltinDateFmts(fmt) || customDate(fmt) => idx
    }.toSet
  }

  private[graft] def isDateFormatCode(code: String): Boolean = {
    // strip "..." literals and [...] sections, then look for date tokens
    // after the strips no plain NUMBER format contains these letters
    // ("General", "0.00E+00", "#,##0.00", "@", percent/fraction forms
    // are all clean of y/m/d/h/s)
    val cleaned = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** Excel serial -> ISO string. Excel day 0 is 1899-12-30 (the offset
    * absorbs the inherited Lotus 1900 leap bug); the fraction is the
    * time of day. Integral serials render as dates, fractional as
    * timestamps (seconds precision — openpyxl's own resolution here).
    */
  private[graft] def serialToIso(serial: Double): String = {
    val days = math.floor(serial).toLong
    var date = java.time.LocalDate.ofEpochDay(days - 25569L)
    var secs = math.round((serial - days) * 86400.0)
    if (secs >= 86400L) { date = date.plusDays(1); secs -= 86400L } // rounded past midnight
    if (secs == 0L) date.toString
    else {
      val t = java.time.LocalTime.ofSecondOfDay(secs)
      s"$date ${t.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))}"
    }
  }

  private[graft] def dateToSerial(d: java.time.LocalDate): Long =
    d.toEpochDay + 25569L

  private[graft] def timestampToSerial(ts: java.sql.Timestamp): Double = {
    val ldt = ts.toLocalDateTime
    dateToSerial(ldt.toLocalDate).toDouble + ldt.toLocalTime.toSecondOfDay / 86400.0
  }

  /** Worksheet zip-entry for `page`: resolve workbook.xml's sheet list
    * through its .rels when present; fall back to the conventional
    * sheetN.xml naming.
    */
  private def sheetEntryName(zip: java.util.zip.ZipFile, page: Int): String = {
    val viaRels =
      for {
        wb <- Option(zip.getEntry("xl/workbook.xml"))
        rels <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      } yield {
        val sheetRids = collectAttrs(zip.getInputStream(wb), "sheet", "id",
          alsoMatchNsId = true)
        val relMap = collectRels(zip.getInputStream(rels))
        sheetRids.lift(page).flatMap(relMap.get)
          .map(t => if (t.startsWith("/")) t.drop(1) else s"xl/$t")
      }
    viaRels.flatten.getOrElse(s"xl/worksheets/sheet${page + 1}.xml")
  }

  /** All values of attribute `attr` on elements named `elem`, document
    * order. Sheet r:id attributes live in the relationships namespace —
    * `alsoMatchNsId` accepts any-namespace local name "id".
    */
  private def collectAttrs(in: java.io.InputStream, elem: String, attr: String,
                           alsoMatchNsId: Boolean): Vector[String] = {
    val r = staxReader(in)
    val out = Vector.newBuilder[String]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == elem) {
          var i = 0
          var found: String = null
          while (i < r.getAttributeCount && found == null) {
            if (r.getAttributeLocalName(i) == attr ||
                (alsoMatchNsId && r.getAttributeLocalName(i) == "id"))
              found = r.getAttributeValue(i)
            i += 1
          }
          if (found != null) out += found
        }
      }
    } finally r.close()
    out.result()
  }

  private def collectRels(in: java.io.InputStream): Map[String, String] = {
    val r = staxReader(in)
    val out = Map.newBuilder[String, String]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          var id: String = null; var target: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _ =>
            }
            i += 1
          }
          if (id != null && target != null) out += id -> target
        }
      }
    } finally r.close()
    out.result()
  }

  private def staxReader(in: java.io.InputStream) = Esc.stax(in)

  /** sharedStrings.xml: one entry per <si>, concatenating its <t> runs
    * (rich-text si elements hold several <r><t> runs).
    */
  private def parseSharedStrings(in: java.io.InputStream): Vector[String] = {
    val r = staxReader(in)
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var inSi = false
    var inT = false
    var inRPh = false // phonetic guide runs are NOT cell text (CT_Rst)
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.setLength(0)
              case "rPh" | "phoneticPr" => inRPh = true
              case "t" if inSi && !inRPh => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "rPh" | "phoneticPr" => inRPh = false
              case "si" => inSi = false; out += Esc.xDecode(cur.toString)
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Column index from a cell reference: "A1"->0, "C5"->2, "AA3"->26. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var v = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      v = v * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    v - 1
  }

  private def parseSheet(in: java.io.InputStream, shared: Vector[String],
                         dateStyles: Set[Int]): Vector[Vector[Cell]] = {
    val r = staxReader(in)
    val rows = Vector.newBuilder[Vector[Cell]]
    var rowCount = 0
    var row: scala.collection.mutable.ArrayBuffer[Cell] = null
    var cellCol = -1
    var cellType = "n"
    var cellStyle = -1
    var inV = false
    var inIsT = false
    var inRPh = false
    val text = new java.lang.StringBuilder
    var pendingValue: String = null
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                // ECMA-376 writers may OMIT empty rows entirely — honor
                // the r attribute so gaps stay as empty records (the
                // reference's openpyxl yields all-None rows there)
                var rRef = -1
                var i = 0
                while (i < r.getAttributeCount) {
                  if (r.getAttributeLocalName(i) == "r") {
                    val raw = r.getAttributeValue(i)
                    rRef =
                      try raw.toInt
                      catch { case _: NumberFormatException =>
                        throw new IllegalArgumentException(
                          s"worksheet row reference is not a number: '$raw'") }
                    // the xlsx grid caps at 1,048,576 rows — an
                    // out-of-range reference must not drive the gap
                    // fill into allocating billions of empty rows
                    require(rRef >= 1 && rRef <= 1048576,
                      s"worksheet row reference out of range: $rRef")
                  }
                  i += 1
                }
                while (rRef > 0 && rowCount < rRef - 1) {
                  rows += Vector.empty; rowCount += 1
                }
                row = scala.collection.mutable.ArrayBuffer.empty[Cell]
              case "c" if row != null =>
                cellType = "n"; cellCol = row.length; cellStyle = -1
                pendingValue = null; text.setLength(0)
                var i = 0
                while (i < r.getAttributeCount) {
                  r.getAttributeLocalName(i) match {
                    case "r" => cellCol = colIndex(r.getAttributeValue(i))
                    case "t" => cellType = r.getAttributeValue(i)
                    case "s" => cellStyle = r.getAttributeValue(i).toInt
                    case _ =>
                  }
                  i += 1
                }
              case "v" => inV = true; text.setLength(0)
              case "rPh" | "phoneticPr" => inRPh = true
              // rich inline strings hold SEVERAL <r><t> runs — append,
              // don't reset (the shared-string parser already does);
              // phonetic guide runs (rPh) are NOT cell text
              case "t" if cellType == "inlineStr" && !inRPh => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inIsT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "rPh" | "phoneticPr" => inRPh = false
              case "v" =>
                inV = false; pendingValue = text.toString
              case "t" if inIsT =>
                inIsT = false; pendingValue = text.toString
              case "c" if row != null =>
                val v: Cell = (cellType, pendingValue) match {
                  case (_, null) => null
                  case ("s", idx) => Cell(shared(idx.trim.toInt), 's')
                  case ("b", x) => Cell(if (x.trim == "1") "true" else "false", 'b')
                  case ("inlineStr" | "str", x) => Cell(Esc.xDecode(x), 's')
                  case (_, x) if dateStyles(cellStyle) && isNumeric(x) =>
                    // date-styled numeric cell -> ISO string, the
                    // reference's openpyxl-datetime semantics
                    Cell(serialToIso(x.trim.toDouble), 'd')
                  case (_, x) => Cell(x, 'n') // numeric cell, lexical form
                }
                while (row.length < cellCol) row += null // reference gaps
                if (cellCol >= 0 && v != null) {
                  if (row.length == cellCol) row += v else row(cellCol) = v
                }
              case "row" =>
                rows += row.toVector; rowCount += 1; row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** STRICT JSON number lexeme — Double.parseDouble also accepts
    * "+5"/"5d"/hex floats, which would corrupt the generated JSON line
    * and silently null the whole record.
    */
  private val NumLexeme =
    java.util.regex.Pattern.compile("-?(0|[1-9]\\d*)(\\.\\d+)?([eE][+-]?\\d+)?")
  private def isNumeric(s: String): Boolean =
    NumLexeme.matcher(s).matches() // precompiled: called once per cell

  /** The three Java non-finite double lexemes. Spreadsheet formats
    * cannot represent non-finite numerics (xlsx: invalid XML; xls:
    * raw IEEE bits Excel reinterprets), so the writers emit these as
    * string cells and [[fromGrid]] maps the exact lexemes back to JSON
    * non-numeric number tokens (Jackson `allowNonNumericNumbers`, on
    * by default in Spark's JSON reader). Trade-off, documented: a text
    * column consisting ENTIRELY of these lexemes re-enters as doubles;
    * any finite-string admixture keeps it a string column with the
    * lexemes preserved verbatim.
    */
  private[sources] def isNonFinite(s: String): Boolean =
    s == "NaN" || s == "Infinity" || s == "-Infinity"

  /** Read sheet `page` with first-row-as-header semantics into a
    * DataFrame (types via Spark's JSON inference — the same path an
    * xlsx→jsonl convert would take). `startLine` skips leading rows
    * BEFORE the header, `fields` overrides the header row entirely
    * (then row 1 is data) — both per the reference's converter
    * options.
    */
  def read(spark: SparkSession, path: String, page: Int = 0,
           startLine: Int = 0, fields: Seq[String] = Nil): DataFrame =
    fromGrid(spark, sheetRows(path, page).drop(startLine), fields,
      s"$path sheet $page")

  /** Per-file-DISTRIBUTED read of a directory/glob of workbooks: each
    * file is one executor task (binaryFiles → parse → JSON lines), all
    * lines feed one schema inference — the same shape as
    * [[BsonLocal.read]]. Each workbook carries its own header row
    * (or the shared `fields` override). A single workbook is
    * hard-capped by the format (1,048,576 rows), so the driver-side
    * [[read]] is fine for one file; this is the scale path for
    * DIRECTORIES of workbooks, removing the one driver-bound read in
    * the format matrix. ZipFile needs a seekable file, so each task
    * spills its workbook bytes to executor-local tmp and deletes it.
    */
  def readMany(spark: SparkSession, glob: String, page: Int = 0,
               startLine: Int = 0, fields: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val jsonLines = spark.sparkContext
      .binaryFiles(glob)
      .flatMap { case (name, stream) =>
        gridToJsonLines(withBytesAsTempFile(".xlsx", stream.toArray())(
          sheetRows(_, page)).drop(startLine), fields, s"$name sheet $page")
      }
      .toDS()
    spark.read.json(jsonLines)
  }

  /** Spill `bytes` to an executor-local temp file for parsers that
    * need a real (seekable) file, always cleaning up.
    */
  private[sources] def withBytesAsTempFile[A](suffix: String,
                                              bytes: Array[Byte])
                                             (f: String => A): A = {
    val tmp = java.io.File.createTempFile("graft-wb-", suffix)
    try {
      java.nio.file.Files.write(tmp.toPath, bytes)
      f(tmp.getAbsolutePath)
    } finally { tmp.delete(); () }
  }

  /** Shared grid -> DataFrame tail (also used by the BIFF8 [[XlsLocal]]
    * reader): first row = header unless `fields` given, records typed
    * by Spark's JSON inference.
    */
  private[graft] def fromGrid(spark: SparkSession, grid: Vector[Vector[Cell]],
                              fields: Seq[String], what: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(gridToJsonLines(grid, fields, what)))
  }

  /** Grid -> JSON lines, the serial core of [[fromGrid]] — also runs
    * INSIDE executor tasks for the multi-file [[readMany]] path, so it
    * must not touch a SparkSession.
    */
  private[graft] def gridToJsonLines(grid: Vector[Vector[Cell]],
                                     fields: Seq[String],
                                     what: String): Vector[String] = {
    require(grid.nonEmpty, s"$what has no rows")
    val (header, data) =
      if (fields.nonEmpty) (fields.toVector, grid)
      else (grid.head.map(v => if (v == null) "" else v.lex), grid.tail)
    data.map { cells =>
      val sb = new java.lang.StringBuilder("{")
      var first = true
      header.zipWithIndex.foreach { case (name, i) =>
        val v = if (i < cells.length) cells(i) else null
        if (v != null) {
          if (!first) sb.append(',')
          first = false
          appendJson(sb, name)
          sb.append(':')
          // the sheet's own type tag decides the JSON shape — a string
          // cell "123" stays a string. Exception: the exact non-finite
          // lexemes pass as (non-numeric) number tokens regardless of
          // kind, because the writers can only represent them as
          // strings — see isNonFinite for the trade-off.
          if (v.kind == 'b' || (v.kind == 'n' && isNumeric(v.lex)) ||
              isNonFinite(v.lex)) sb.append(v.lex)
          else appendJson(sb, v.lex)
        }
      }
      sb.append('}').toString
    }
  }

  private def appendJson(sb: java.lang.StringBuilder, s: String): Unit =
    Esc.json(sb, s)

  // ------------------------------------------------------------------
  // write
  // ------------------------------------------------------------------


  private def colRef(c: Int): String = {
    var v = c + 1
    val sb = new java.lang.StringBuilder
    while (v > 0) {
      val rem = (v - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      v = (v - 1) / 26
    }
    sb.toString
  }

  /** Write `df` as a minimal single-sheet XLSX (inline strings — no
    * sharedStrings table; numbers/booleans as native cell types).
    * Single-stream driver-side, like the reference's openpyxl writer.
    */
  def write(df: DataFrame, path: String): Unit = {
    val flat = Converter.makeFlat(df)
    val schema = flat.schema
    val zo = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(content.getBytes(UTF_8))
      zo.closeEntry()
    }
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      // style 1 = builtin date numFmt 14, style 2 = builtin datetime 22
      put("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
          |<borders count="1"><border/></borders>
          |<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
          |<cellXfs count="3"><xf numFmtId="0"/>
          |<xf numFmtId="14" applyNumberFormat="1"/>
          |<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
          |</styleSheet>""".stripMargin)

      zo.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zo, UTF_8)
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var rowNum = 1
      def writeRow(values: Seq[(Any, DataType)]): Unit = {
        w.write(s"""<row r="$rowNum">""")
        values.zipWithIndex.foreach { case ((v, dt), c) =>
          if (v != null) {
            val ref = s"${colRef(c)}$rowNum"
            dt match {
              case ByteType | ShortType | IntegerType | LongType | FloatType |
                   DoubleType | _: DecimalType =>
                val lex = v.toString
                // SpreadsheetML numeric cells cannot carry NaN/Infinity
                // (<v>NaN</v> is invalid — Excel triggers file repair);
                // emit the lexeme as an inline string instead. fromGrid
                // recognizes these exact lexemes on read-back, so the
                // round trip keeps the column numeric.
                if (isNonFinite(lex))
                  w.write(s"""<c r="$ref" t="inlineStr"><is><t>$lex</t></is></c>""")
                else
                  w.write(s"""<c r="$ref"><v>$lex</v></c>""")
              case BooleanType =>
                val b = if (v.asInstanceOf[Boolean]) "1" else "0"
                w.write(s"""<c r="$ref" t="b"><v>$b</v></c>""")
              case DateType =>
                val serial = dateToSerial(v.asInstanceOf[java.sql.Date].toLocalDate)
                w.write(s"""<c r="$ref" s="1"><v>$serial</v></c>""")
              case TimestampType =>
                val serial = timestampToSerial(v.asInstanceOf[java.sql.Timestamp])
                w.write(s"""<c r="$ref" s="2"><v>$serial</v></c>""")
              case _ =>
                w.write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">""" +
                  Esc.xml(Esc.xEncode(v.toString)) + "</t></is></c>")
            }
          }
        }
        w.write("</row>")
        rowNum += 1
      }
      writeRow(schema.fields.map(f => (f.name: Any, StringType: DataType)).toSeq)
      val it = flat.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        writeRow(schema.fields.indices.map(i =>
          ((if (r.isNullAt(i)) null else r.get(i)): Any, schema(i).dataType)))
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      zo.closeEntry()
    } finally zo.close()
  }
}
