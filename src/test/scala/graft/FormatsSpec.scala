package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{BsonLocal, Converter, DocxTables, XlsxLocal}
import graft.sources.{XlsLocal => XlsLocal0}
import graft.sources.Converter.ReadOptions

/** The three formats implemented from scratch in round 4: BSON
  * (bsonspec.org wire format — the reference's
  * `bson.decode_file_iter` / `bson.BSON.encode` stream,
  * common/iterable.py:138-139, 203-205), XLSX (ECMA-376 zip, openpyxl
  * semantics of converter.py:192-217) and DOCX tables (ECMA-376
  * WordprocessingML, formats/docx.py merge semantics).
  */
class FormatsSpec extends SparkSpecBase {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  // ---------------------------------------------------------------- BSON

  test("bson encoder reproduces the spec's own example bytes") {
    // bsonspec.org faq example: {"hello": "world"} =
    // \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
    val schema = StructType(Seq(StructField("hello", StringType)))
    val bytes = BsonLocal.encodeRow(Row("world"), schema)
    assert(hex(bytes) ==
      "16000000" + "02" + hex("hello".getBytes) + "00" +
        "06000000" + hex("world".getBytes) + "00" + "00")

    // the spec's second example: {"BSON": ["awesome", 5.05, 1986]},
    // documented total size 0x31 — hand-build and decode
    def doc(body: Array[Byte]): Array[Byte] = {
      val t = new java.io.ByteArrayOutputStream()
      val n = body.length + 5
      t.write(n); t.write(n >> 8); t.write(n >> 16); t.write(n >> 24)
      t.write(body); t.write(0); t.toByteArray
    }
    val inner = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = { inner.write(v); inner.write(v >> 8); inner.write(v >> 16); inner.write(v >> 24) }
    inner.write(0x02); inner.write('0'); inner.write(0)
    i32(8); inner.write("awesome".getBytes); inner.write(0)
    inner.write(0x01); inner.write('1'); inner.write(0)
    val dbits = java.lang.Double.doubleToLongBits(5.05)
    (0 until 8).foreach(k => inner.write(((dbits >> (8 * k)) & 0xFF).toInt))
    inner.write(0x10); inner.write('2'); inner.write(0)
    i32(1986)
    val outer = new java.io.ByteArrayOutputStream()
    outer.write(0x04); outer.write("BSON".getBytes); outer.write(0)
    outer.write(doc(inner.toByteArray))
    val doc2 = doc(outer.toByteArray)
    assert(doc2.length == 0x31) // the spec documents total size 49
    assert(BsonLocal.toJsonLines(doc2).toSeq ==
      Seq("""{"BSON":["awesome",5.05,1986]}"""))
  }

  test("bson round trip: scalars, arrays, structs, nulls, binary, timestamp") {
    val s = spark
    import s.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("ok", BooleanType),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("blob", BinaryType),
      StructField("ts", TimestampType)
    ))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Seq("x", "y"), Row(7, "in"),
        Array[Byte](1, 2, 3), java.sql.Timestamp.valueOf("2024-03-01 12:30:45")),
      Row(2L, "beta \"q\"\nline", null, false, Seq.empty[String], null,
        null, null),
      Row(3L, null, -0.25, null, null, Row(null, "z"), Array[Byte](), null)
    )
    val df = s.createDataFrame(s.sparkContext.parallelize(rows), schema)
    val dir = tmpDir("bson-rt")
    Converter.write(df, s"$dir/t.bson", "bson")
    val back = Converter.read(s, s"$dir/t.bson", ReadOptions("bson"))
    assert(back.count() == 3)
    val byId = back.orderBy("id").collect()
    assert(byId(0).getAs[String]("name") == "alpha")
    assert(byId(1).getAs[String]("name") == "beta \"q\"\nline")
    assert(byId(0).getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("x", "y"))
    assert(byId(0).getAs[Row]("nested").getAs[Long]("a") == 7L)
    assert(byId(0).getAs[Double]("score") == 1.5)
    assert(byId(2).getAs[Double]("score") == -0.25)
    // binary -> base64 string (documented mapping)
    assert(byId(0).getAs[String]("blob") ==
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    // datetime -> ISO-8601 UTC string
    assert(byId(0).getAs[String]("ts").startsWith("2024-03-01T12:30:45"))
  }

  test("bson decoder: objectid, regex, datetime, int32 vs int64, nested doc") {
    // hand-built document exercising types the encoder never emits
    val o = new java.io.ByteArrayOutputStream()
    def cstr(s: String): Unit = { o.write(s.getBytes); o.write(0) }
    def i32(v: Int): Unit = { o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24) }
    def i64(v: Long): Unit = (0 until 8).foreach(k => o.write(((v >> (8 * k)) & 0xFF).toInt))
    o.write(0x07); cstr("_id")
    (0 until 12).foreach(i => o.write(i))
    o.write(0x0B); cstr("re"); cstr("^a.*b$"); cstr("i")
    o.write(0x09); cstr("when"); i64(0L) // epoch
    o.write(0x10); cstr("small"); i32(-5)
    o.write(0x12); cstr("big"); i64(1L << 40)
    o.write(0x0A); cstr("none")
    val body = o.toByteArray
    val doc = {
      val t = new java.io.ByteArrayOutputStream()
      def t32(v: Int): Unit = { t.write(v); t.write(v >> 8); t.write(v >> 16); t.write(v >> 24) }
      t32(body.length + 5); t.write(body); t.write(0); t.toByteArray
    }
    val json = BsonLocal.toJsonLines(doc).toSeq.head
    assert(json.contains(""""_id":"000102030405060708090a0b""""))
    assert(json.contains(""""re":"/^a.*b$/i""""))
    assert(json.contains(""""when":"1970-01-01T00:00:00Z""""))
    assert(json.contains(""""small":-5"""))
    assert(json.contains(""""big":1099511627776"""))
    assert(json.contains(""""none":null"""))
  }

  test("bson binary subtype 0x02 (old binary) skips the inner length") {
    // per bsonspec.org, subtype 0x02 wraps the payload in an extra
    // int32 length; base64 must carry only the real bytes
    val payload = Array[Byte](0x41, 0x42, 0x43)
    val o = new java.io.ByteArrayOutputStream()
    def cstr(s: String): Unit = { o.write(s.getBytes); o.write(0) }
    def i32(v: Int): Unit = { o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24) }
    o.write(0x05); cstr("old"); i32(payload.length + 4); o.write(0x02)
    i32(payload.length); o.write(payload)
    o.write(0x05); cstr("new"); i32(payload.length); o.write(0x00)
    o.write(payload)
    val body = o.toByteArray
    val doc = {
      val t = new java.io.ByteArrayOutputStream()
      def t32(v: Int): Unit = { t.write(v); t.write(v >> 8); t.write(v >> 16); t.write(v >> 24) }
      t32(body.length + 5); t.write(body); t.write(0); t.toByteArray
    }
    val json = BsonLocal.toJsonLines(doc).toSeq.head
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    assert(json.contains(s""""old":"$b64""""), json)
    assert(json.contains(s""""new":"$b64""""), json)
  }

  test("bson read is distributed per file (many files -> one scan)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("bson-many")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    BsonLocal.write(df.where("k = 1"), s"$dir/p0.bson")
    BsonLocal.write(df.where("k = 2"), s"$dir/p1.bson")
    val back = BsonLocal.read(s, dir)
    assert(back.count() == 2)
    assert(back.agg(sum("k")).head.getLong(0) == 3L)
  }

  // ---------------------------------------------------------------- XLSX

  test("xlsx round trip via Converter: header, types, strings with escapes") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "plain", 1.5, true),
      (2L, "needs & <escaping> \"here\"", -2.0, false),
      (3L, "123", 0.0, true) // STRING cell "123" must stay a string
    ).toDF("id", "name", "score", "flag")
    val dir = tmpDir("xlsx-rt")
    Converter.write(df, s"$dir/t.xlsx", "xlsx")
    val back = Converter.read(s, s"$dir/t.xlsx", ReadOptions("xlsx"))
      .orderBy("id")
    assert(back.columns.sorted.toSeq == Seq("flag", "id", "name", "score"))
    val rows = back.collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getAs[String]("name") == "needs & <escaping> \"here\"")
    assert(rows(2).getAs[String]("name") == "123") // type tag respected
    assert(rows(0).getAs[Double]("score") == 1.5)
    assert(rows(0).getAs[Boolean]("flag"))
    assert(!rows(1).getAs[Boolean]("flag"))
  }

  test("xlsx/xls: non-finite doubles round-trip as doubles, file stays valid") {
    val s = spark
    import s.implicits._
    // a double column MIXING finite and non-finite values must come
    // back as one double column (the pre-fix writer emitted invalid
    // <v>NaN</v> and read-back demoted the whole column to string)
    val df = Seq(
      (1L, 1.5), (2L, Double.NaN),
      (3L, Double.PositiveInfinity), (4L, Double.NegativeInfinity)
    ).toDF("id", "score")
    for (fmt <- Seq("xlsx", "xls")) {
      val dir = tmpDir(s"$fmt-nonfinite")
      Converter.write(df, s"$dir/t.$fmt", fmt)
      val back = Converter.read(s, s"$dir/t.$fmt", ReadOptions(fmt)).orderBy("id")
      assert(back.schema("score").dataType ==
        org.apache.spark.sql.types.DoubleType, s"$fmt demoted the column")
      val vs = back.collect().map(_.getAs[Double]("score"))
      assert(vs(0) == 1.5 && vs(1).isNaN &&
        vs(2).isPosInfinity && vs(3).isNegInfinity, s"$fmt: ${vs.toSeq}")
    }
    // xlsx file must remain parseable XML throughout (no invalid
    // numeric cells): walk the raw sheet — non-finites must be STRING
    // cells in the file, never numeric <v> payloads
    val dir2 = tmpDir("xlsx-nonfinite2")
    Converter.write(df, s"$dir2/t.xlsx", "xlsx")
    val grid = XlsxLocal.sheetRows(s"$dir2/t.xlsx/part-00000.xlsx", 0)
    assert(grid.length == 5)
    assert(grid.drop(2).map(_(1).kind).toSet == Set('s'),
      "non-finite doubles must be written as string cells")
  }

  test("xlsx reader: shared strings, cell-ref gaps, column refs") {
    assert(XlsxLocal.colIndex("A1") == 0)
    assert(XlsxLocal.colIndex("C5") == 2)
    assert(XlsxLocal.colIndex("AA3") == 26)
    // hand-built workbook with a sharedStrings table and a gap (B skipped)
    val dir = tmpDir("xlsx-hand")
    val path = s"$dir/hand.xlsx"
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(n))
      zo.write(c.getBytes("UTF-8")); zo.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="x" xmlns:r="y"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="z"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      """<sst xmlns="x"><si><t>a</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="x"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>n</t></is></c></row>
        |<row r="2"><c r="A2"><v>10</v></c><c r="C2"><v>30</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zo.close()
    val grid = XlsxLocal.sheetRows(path)
    assert(grid(0).map(_.lex) == Vector("a", "rich", "n")) // rich-text si concatenated
    assert(grid(1) == Vector(XlsxLocal.Cell("10", 'n'), null, XlsxLocal.Cell("30", 'n')))
    val df = XlsxLocal.read(spark, path)
    val r = df.head
    assert(r.getAs[Long]("a") == 10L && r.getAs[Long]("n") == 30L)
    // the gap column "rich" has no values, so inference drops it
    assert(!df.columns.contains("rich"))
  }

  test("xlsx date-styled cells: serial <-> ISO, openpyxl semantics") {
    // unit conversions (Excel day 0 = 1899-12-30)
    assert(XlsxLocal.dateToSerial(java.time.LocalDate.of(1970, 1, 1)) == 25569L)
    assert(XlsxLocal.serialToIso(25569.0) == "1970-01-01")
    assert(XlsxLocal.serialToIso(45351.0) == "2024-02-29")
    assert(XlsxLocal.serialToIso(45351.5) == "2024-02-29 12:00:00")
    // format-code heuristic
    assert(XlsxLocal.isDateFormatCode("yyyy-mm-dd"))
    assert(XlsxLocal.isDateFormatCode("hh:mm:ss.000"))
    assert(!XlsxLocal.isDateFormatCode("0.00"))
    assert(!XlsxLocal.isDateFormatCode("#,##0.00"))
    assert(!XlsxLocal.isDateFormatCode("0.00E+00"))
    assert(!XlsxLocal.isDateFormatCode("\"day\" 0")) // quoted literal ignored
    assert(!XlsxLocal.isDateFormatCode("[Red]0.0"))
    // full round trip: date + timestamp columns come back as ISO
    // strings (the reference's openpyxl yields datetimes, json-dumped
    // to ISO on the jsonl path — same observable values)
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56")),
      Row(2L, java.sql.Date.valueOf("1999-12-31"), null))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows), schema)
    val dir = tmpDir("xlsx-dates")
    XlsxLocal.write(df, s"$dir/d.xlsx")
    val back = XlsxLocal.read(s, s"$dir/d.xlsx").orderBy("id").collect()
    assert(back(0).getAs[String]("d") == "2024-02-29")
    assert(back(0).getAs[String]("ts") == "2024-02-29 12:34:56")
    assert(back(1).getAs[String]("d") == "1999-12-31")
    assert(back(1).isNullAt(back(1).fieldIndex("ts")))
  }

  test("xlsx control characters round-trip via _xHHHH_ (ECMA-376 escape)") {
    import graft.sources.Esc
    assert(Esc.xEncode("ab") == "a_x0001_b")
    assert(Esc.xDecode("a_x0001_b") == "ab")
    // literal text that LOOKS like the escape survives — including
    // ADJACENT lookalikes sharing an underscore, a control char feeding
    // into a lookalike, and a pre-escaped literal (each corrupted under
    // the old match-only-lookalikes encoder)
    for (v <- Seq("lit _x0041_ eral", "_x0041_x0042_", "\u0001x0001_",
        "_x005F_x0041_", "__x0041__", "a_xb", "_x", "x_", "_x00GG_"))
      assert(Esc.xDecode(Esc.xEncode(v)) == v, s"round trip broke for: $v")
    val s = spark
    import s.implicits._
    val df = Seq((1L, "ctrlandbells"), (2L, "_x0042_ literal"))
      .toDF("id", "v")
    val dir = tmpDir("xlsx-ctrl")
    XlsxLocal.write(df, s"$dir/c.xlsx")
    val back = XlsxLocal.read(s, s"$dir/c.xlsx").orderBy("id").collect()
    assert(back(0).getAs[String]("v") == "ctrlandbells")
    assert(back(1).getAs[String]("v") == "_x0042_ literal")
  }

  test("xlsx reader: omitted empty rows and multi-run inline strings") {
    val dir = tmpDir("xlsx-gaps")
    val path = s"$dir/g.xlsx"
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(n: String, c: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(n))
      zo.write(c.getBytes("UTF-8")); zo.closeEntry()
    }
    // header at r=1, row 2 entirely omitted (legal ECMA-376), data at r=3;
    // B3 is a RICH inline string with two <r> runs
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="x"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="B1" t="inlineStr"><is><t>b</t></is></c></row>
        |<row r="3"><c r="A3"><v>7</v></c><c r="B3" t="inlineStr"><is><r><t>foo</t></r><r><t>bar</t></r></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zo.close()
    val grid = XlsxLocal.sheetRows(path)
    assert(grid.length == 3) // the omitted row stays as an empty record
    assert(grid(1).isEmpty)
    assert(grid(2)(1) == XlsxLocal.Cell("foobar", 's')) // runs concatenated
    val df = XlsxLocal.read(spark, path)
    assert(df.count() == 2) // empty row -> all-null record (openpyxl shape)
    assert(df.where(col("a") === 7).count() == 1)
  }

  test("xlsx date serial just below midnight rolls to the next day") {
    assert(XlsxLocal.serialToIso(45351.9999999) == "2024-03-01")
  }

  test("avro sink refuses colliding mangled names instead of avro's opaque error") {
    val s = spark
    import s.implicits._
    val df = Seq((1, 2)).toDF("a b", "a-b")
    val e = intercept[IllegalArgumentException] {
      graft.sources.AvroLocal.write(df, tmpDir("avro-col") + "/x.avro")
    }
    assert(e.getMessage.contains("a b") && e.getMessage.contains("a-b"))
  }

  // ---------------------------------------------------------------- XLS (BIFF8)

  test("xls: CFB container round trip at several sizes") {
    import graft.sources.XlsLocal
    val rng = new scala.util.Random(3)
    // < 4096 (pad path), sector-boundary, multi-FAT-sector (>64KB),
    // and past the 109-FAT-in-header cliff (~7.1MB -> DIFAT chain)
    for (n <- Seq(100, 4096, 4097, 512 * 130, 150000, 7500000)) {
      val data = Array.fill[Byte](n)(rng.nextInt().toByte)
      val back = XlsLocal.cfbStream(XlsLocal.cfbWrap(data), Seq("Workbook"))
      // the writer pads sub-4096 streams; content must match as prefix
      assert(back.length == math.max(n, 4096))
      assert(java.util.Arrays.equals(back.take(n), data))
    }
  }

  test("xls: RK encodings decode per MS-XLS 2.5.276") {
    import graft.sources.XlsLocal
    assert(XlsLocal.rkNum((7 << 2) | 2) == 7.0)
    assert(XlsLocal.rkNum((700 << 2) | 3) == 7.0) // int, /100
    assert(XlsLocal.rkNum((-5 << 2) | 2) == -5.0) // negative int
    val hi = (java.lang.Double.doubleToLongBits(1.5) >>> 32).toInt & ~3
    assert(XlsLocal.rkNum(hi) == 1.5) // truncated double form
    assert(XlsLocal.rkNum(hi | 1) == 0.015) // double, /100
  }

  test("xls: chart/macro BOUNDSHEETs do not count as data sheets") {
    import graft.sources.XlsLocal
    val s = spark
    import s.implicits._
    val dir = tmpDir("xls-chart")
    val path = s"$dir/t.xls"
    XlsLocal.write(Seq((1L, "a")).toDF("k", "v"), path)
    // flip the single BOUNDSHEET's dt byte to 2 (chart sheet): the
    // reader must then see ZERO worksheets, not a broken page 0
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    var i = 0
    var patched = false
    while (i < bytes.length - 10 && !patched) {
      // BOUNDSHEET header: type 0x0085, then len; dt at data offset 5
      if ((bytes(i) & 0xFF) == 0x85 && bytes(i + 1) == 0 &&
          (bytes(i + 2) & 0xFF) >= 8 && bytes(i + 9) == 0 &&
          (bytes(i + 10) & 0xFF) == 6) { // cch==6 ("Sheet1") sanity
        bytes(i + 9) = 2
        patched = true
      }
      i += 1
    }
    assert(patched, "BOUNDSHEET record not found to patch")
    val path2 = s"$dir/chart.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path2), bytes)
    val e = intercept[IllegalArgumentException] { XlsLocal.sheetRows(path2) }
    assert(e.getMessage.contains("0 sheets"))
  }

  test("xls timestamps write as ISO seconds, not Timestamp.toString's .0") {
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType)))
    val rows = Seq(Row(1L, java.sql.Timestamp.valueOf("2024-06-15 10:30:00")))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows), schema)
    val dir = tmpDir("xls-ts")
    graft.sources.XlsLocal.write(df, s"$dir/t.xls")
    val back = graft.sources.XlsLocal.read(s, s"$dir/t.xls").head
    assert(back.getAs[String]("ts") == "2024-06-15 10:30:00")
  }

  test("xls round trip via Converter: types, SST, continuation splits") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    // enough distinct strings (some huge) that the SST must split into
    // CONTINUE records, including mid-string
    val big = (0 until 3).map(i => s"big$i " + rng.alphanumeric.take(9000).mkString)
    val rows = (0 until 400).map { i =>
      (i.toLong, if (i < 3) big(i) else s"s$i ąčę 汉", i * 1.25 - 10, i % 3 == 0)
    }
    val df = rows.toDF("id", "name", "score", "flag")
    val dir = tmpDir("xls-rt")
    graft.sources.Converter.write(df, s"$dir/t.xls", "xls")
    val back = graft.sources.Converter.read(s, s"$dir/t.xls",
      ReadOptions("xls")).orderBy("id")
    assert(back.count() == 400)
    val a = df.selectExpr("id", "name", "CAST(score AS STRING) score", "CAST(flag AS STRING) flag")
    val b = back.selectExpr("id", "name", "CAST(score AS STRING) score", "CAST(flag AS STRING) flag")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // string cell "123"-style fidelity comes through the type tags here too
    assert(back.schema("name").dataType == StringType)
  }

  // ---------------------------------------------------------------- DOCX

  test("xlsx/xls readMany: directory of workbooks -> one distributed scan") {
    val s = spark
    import s.implicits._
    for (fmt <- Seq("xlsx", "xls")) {
      val dir = tmpDir(s"$fmt-many")
      // three workbooks, same header, disjoint rows
      (0 until 3).foreach { k =>
        val df = Seq((k * 10 + 1L, s"w$k-a", k * 1.5), (k * 10 + 2L, s"w$k-b", -k.toDouble))
          .toDF("id", "name", "score")
        if (fmt == "xlsx") XlsxLocal.write(df, s"$dir/wb$k.xlsx")
        else XlsLocal0.write(df, s"$dir/wb$k.xls")
      }
      val many =
        if (fmt == "xlsx") XlsxLocal.readMany(s, s"$dir/*.xlsx")
        else XlsLocal0.readMany(s, s"$dir/*.xls")
      assert(many.rdd.getNumPartitions >= 1)
      val rows = many.orderBy("id").collect()
      assert(rows.length == 6, s"$fmt: ${rows.length}")
      assert(rows.map(_.getAs[Long]("id")).toSeq ==
        Seq(1L, 2L, 11L, 12L, 21L, 22L))
      assert(rows(2).getAs[String]("name") == "w1-a")
      assert(rows(2).getAs[Double]("score") == 1.5) // w1-a: 1 * 1.5
    }
  }

  test("docx tables: extraction, gridSpan repeat, vMerge continuation") {
    val dir = tmpDir("docx")
    val path = s"$dir/doc.docx"
    // build a docx whose document.xml carries merge markup directly
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    zo.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zo.write(
      ("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body><w:tbl>""" +
        // header row: A | B | C
        "<w:tr><w:tc><w:p><w:r><w:t>A</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>B</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>C</w:t></w:r></w:p></w:tc></w:tr>" +
        // row 2: gridSpan=2 cell "wide" (covers A,B), vMerge restart "v1"
        "<w:tr><w:tc><w:tcPr><w:gridSpan w:val=\"2\"/></w:tcPr><w:p><w:r><w:t>wide</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:tcPr><w:vMerge w:val=\"restart\"/></w:tcPr><w:p><w:r><w:t>v1</w:t></w:r></w:p></w:tc></w:tr>" +
        // row 3: two normal cells + vMerge continue (inherits v1);
        // multi-paragraph cell text joins with a space; second cell has
        // a run-split "He" + " " + "llo" (Word splits at formatting
        // boundaries, INCLUDING space-only runs)
        "<w:tr><w:tc><w:p><w:r><w:t>x</w:t></w:r></w:p><w:p><w:r><w:t>y</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:p><w:r><w:t>He</w:t></w:r><w:r><w:t xml:space=\"preserve\"> </w:t></w:r><w:r><w:t>llo</w:t></w:r></w:p></w:tc>" +
        "<w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc></w:tr>" +
        "</w:tbl></w:body></w:document>").getBytes("UTF-8"))
    zo.closeEntry(); zo.close()
    val ts = DocxTables.tables(path)
    assert(ts.length == 1)
    assert(ts(0)(0) == Vector("A", "B", "C"))
    assert(ts(0)(1) == Vector("wide", "wide", "v1")) // span repeats (docx.py:23-24)
    assert(ts(0)(2) == Vector("x y", "He llo", "v1")) // vMerge inherits; space-only run kept
  }

  test("docx writer replaces XML-illegal control chars with spaces") {
    val dir = tmpDir("docx-ctrl")
    val path = s"$dir/c.docx"
    DocxTables.writeTable(Seq(Seq("h"), Seq("a\u0001b\u0007c")), path)
    // XML 1.0 cannot carry control chars at all; the writer substitutes
    // spaces and the merge-aware extractor then collapses/strips them
    assert(DocxTables.tables(path)(0)(1) == Vector("a b c"))
  }

  test("docx writeTable -> read round trip through Converter") {
    val s = spark
    val dir = tmpDir("docx-rt")
    val path = s"$dir/t.docx"
    DocxTables.writeTable(Seq(
      Seq("name", "qty"), Seq("ab <&> c", "3"), Seq("d", "4")), path)
    val df = Converter.read(s, path, ReadOptions("docx")).orderBy("qty")
    assert(df.count() == 2)
    assert(df.head.getAs[String]("name") == "ab <&> c")
    // docx cells are text by nature — the reference stores extracted
    // tables as CSV strings too (docx.py __store_table)
    assert(df.collect().map(_.getAs[String]("qty")).toSeq == Seq("3", "4"))
  }

  test("bson decimal128: BID test vectors decode to exact decimal strings") {
    // vectors from the public decimal128 corpus layout: high word =
    // sign | biased exponent (bias 6176) << 49 | coefficient high
    def dec(high: Long, low: Long): String = BsonLocal.decimal128ToString(high, low)
    assert(dec(0x3040000000000000L, 1L) == "1") // exp 0
    assert(dec(0xB040000000000000L, 1L) == "-1")
    assert(dec((6175L << 49), 1L) == "0.1") // exp -1
    assert(dec((6176L + 2) << 49, 5L) == "5E+2") // 5*10^2, BigDecimal sci form
    assert(dec(0x3040000000000000L, 0L) == "0")
    assert(dec(0x7C00000000000000L, 0L) == "NaN")
    assert(dec(0x7800000000000000L, 0L) == "Infinity")
    assert(dec(0xF800000000000000L, 0L) == "-Infinity")
    // 34-digit max coefficient: 10^34-1 = 0x1ED09_BEAD87C0_378D8E63_FFFFFFFF
    assert(dec(0x3040000000000000L | 0x0001ED09BEAD87C0L, 0x378D8E63FFFFFFFFL)
      == "9999999999999999999999999999999999")
    // the 11-form's implied-prefix coefficient overflows 34 digits -> 0
    assert(dec(0x6000000000000000L | (6176L << 47), 0L) == "0")
    // and it round-trips through a full document parse as a quoted string
    val body = new java.io.ByteArrayOutputStream()
    body.write(0x13); body.write("d".getBytes); body.write(0)
    (0 until 8).foreach(k => body.write(((1L >> (8 * k)) & 0xFF).toInt))
    val hi = 6175L << 49
    (0 until 8).foreach(k => body.write(((hi >> (8 * k)) & 0xFF).toInt))
    val doc = {
      val t = new java.io.ByteArrayOutputStream()
      val n = body.size + 5
      t.write(n); t.write(n >> 8); t.write(n >> 16); t.write(n >> 24)
      body.writeTo(t); t.write(0); t.toByteArray
    }
    assert(BsonLocal.toJsonLines(doc).toSeq == Seq("""{"d":"0.1"}"""))
  }

  test("bson fuzz: 300 random mixed-schema rows survive the round trip") {
    val s = spark
    val rng = new scala.util.Random(42)
    def randStr(): String = {
      val n = rng.nextInt(12)
      (0 until n).map { _ =>
        rng.nextInt(6) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => "\"\\\n\r\t".charAt(rng.nextInt(5))
          case 2 => (0x410 + rng.nextInt(64)).toChar // Cyrillic
          case 3 => (0x4E00 + rng.nextInt(100)).toChar // CJK
          case 4 => ('0' + rng.nextInt(10)).toChar
          case _ => (1 + rng.nextInt(0x1F)).toChar // control chars
        }
      }.mkString
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("b", BooleanType),
      StructField("arr", ArrayType(LongType)),
      StructField("nest", StructType(Seq(StructField("x", StringType))))))
    val rows = (0 until 300).map { i =>
      Row(i.toLong,
        if (rng.nextInt(10) == 0) null else randStr(),
        if (rng.nextInt(10) == 0) null else rng.nextDouble() * math.pow(10, rng.nextInt(12) - 6),
        if (rng.nextInt(10) == 0) null else rng.nextBoolean(),
        if (rng.nextInt(10) == 0) null else Seq.fill(rng.nextInt(4))(rng.nextLong() >> 16),
        if (rng.nextInt(10) == 0) null else Row(randStr()))
    }
    val df = s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = tmpDir("bson-fuzz")
    BsonLocal.write(df, s"$dir/fuzz.bson")
    val back = BsonLocal.read(s, s"$dir/fuzz.bson")
    assert(back.count() == 300)
    // canonical-string comparison on the shared scalar columns
    val a = df.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b", "CAST(arr AS STRING) arr", "nest.x AS nx")
    val bk = back.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b", "CAST(arr AS STRING) arr", "nest.x AS nx")
    assert(a.exceptAll(bk).count() == 0 && bk.exceptAll(a).count() == 0)
  }

  test("xlsx fuzz: 300 random rows survive the round trip") {
    val s = spark
    val rng = new scala.util.Random(7)
    def randStr(): String = {
      val n = 1 + rng.nextInt(10)
      (0 until n).map { _ =>
        rng.nextInt(6) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => "<>&\"'".charAt(rng.nextInt(5))
          case 2 => (0x410 + rng.nextInt(64)).toChar
          case 3 => ('0' + rng.nextInt(10)).toChar
          case 4 => (1 + rng.nextInt(0x1F)).toChar // control chars: _xHHHH_ path
          case _ => ' '
        }
      }.mkString.trim + "x" // avoid pure-whitespace cells
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("b", BooleanType)))
    val rows = (0 until 300).map { i =>
      Row(i.toLong,
        if (rng.nextInt(10) == 0) null else randStr(),
        if (rng.nextInt(10) == 0) null else rng.nextDouble() * 1000 - 500,
        if (rng.nextInt(10) == 0) null else rng.nextBoolean())
    }
    val df = s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = tmpDir("xlsx-fuzz")
    XlsxLocal.write(df, s"$dir/fuzz.xlsx")
    val back = XlsxLocal.read(s, s"$dir/fuzz.xlsx")
    assert(back.count() == 300)
    val a = df.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b")
    val bk = back.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b")
    assert(a.exceptAll(bk).count() == 0 && bk.exceptAll(a).count() == 0)
  }

  test("xls fuzz: 300 random rows survive the round trip") {
    val s = spark
    val rng = new scala.util.Random(21)
    def randStr(): String = {
      val n = 1 + rng.nextInt(10)
      (0 until n).map { _ =>
        rng.nextInt(5) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => (0x410 + rng.nextInt(64)).toChar // wide chars force UTF-16 SST
          case 2 => (0x4E00 + rng.nextInt(100)).toChar
          case 3 => ('0' + rng.nextInt(10)).toChar
          case _ => ' '
        }
      }.mkString.trim + "x"
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("b", BooleanType)))
    val rows = (0 until 300).map { i =>
      Row(i.toLong,
        if (rng.nextInt(10) == 0) null else randStr(),
        if (rng.nextInt(10) == 0) null else rng.nextDouble() * 1000 - 500,
        if (rng.nextInt(10) == 0) null else rng.nextBoolean())
    }
    val df = s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 2), schema)
    val dir = tmpDir("xls-fuzz")
    graft.sources.XlsLocal.write(df, s"$dir/fuzz.xls")
    val back = graft.sources.XlsLocal.read(s, s"$dir/fuzz.xls")
    assert(back.count() == 300)
    val a = df.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b")
    val bk = back.selectExpr("id", "CAST(s AS STRING) s", "CAST(d AS STRING) d",
      "CAST(b AS STRING) b")
    assert(a.exceptAll(bk).count() == 0 && bk.exceptAll(a).count() == 0)
  }

  test("bson reads through the reference's gz/bz2/xz compression envelope") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("bson-gz")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    BsonLocal.write(df, s"$dir/plain.bson")
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/plain.bson"))
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/t.bson.gz"))
    gz.write(raw); gz.close()
    val xz = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(
      new java.io.FileOutputStream(s"$dir/t2.bson.xz"))
    xz.write(raw); xz.close()
    assert(BsonLocal.read(s, s"$dir/t.bson.gz").count() == 2)
    assert(BsonLocal.read(s, s"$dir/t2.bson.xz")
      .agg(sum("k")).head.getLong(0) == 3L)
    // and analyzeFile strips the codec suffix before dispatching
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.bson.gz").df.count() == 2)
  }

  test("bson corrupt inputs fail with clear errors, not bare bounds faults") {
    // truncated length prefix
    intercept[IllegalArgumentException] {
      BsonLocal.toJsonLines(Array[Byte](5, 0)).toSeq
    }
    // declared size overruns the file
    intercept[IllegalArgumentException] {
      BsonLocal.toJsonLines(Array[Byte](99, 0, 0, 0, 0)).toSeq
    }
    // valid envelope, corrupt interior: string length runs past the end
    val bad = {
      val o = new java.io.ByteArrayOutputStream()
      val body = new java.io.ByteArrayOutputStream()
      body.write(0x02); body.write('k'); body.write(0)
      body.write(120); body.write(0); body.write(0); body.write(0) // len 120 >> doc
      body.write('x')
      val n = body.size + 5
      o.write(n); o.write(n >> 8); o.write(n >> 16); o.write(n >> 24)
      body.writeTo(o); o.write(0)
      o.toByteArray
    }
    val e = intercept[IllegalArgumentException] { BsonLocal.toJsonLines(bad).toSeq }
    assert(e.getMessage.contains("corrupt BSON"))
  }

  test("analyzeFile dispatches bson/xlsx/docx by extension") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("an-fmt")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    BsonLocal.write(df, s"$dir/t.bson")
    XlsxLocal.write(df, s"$dir/t.xlsx")
    DocxTables.writeTable(Seq(Seq("k", "v"), Seq("1", "a")), s"$dir/t.docx")
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.bson").format == "bson")
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.bson").df.count() == 2)
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.xlsx").df.count() == 2)
    XlsLocal0.write(df, s"$dir/t.xls")
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.xls").format == "xls")
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.xls").df.count() == 2)
    assert(graft.operators.Analyzer.analyzeFile(s, s"$dir/t.docx").df.count() == 1)
  }
}
