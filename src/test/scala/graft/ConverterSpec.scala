package graft

import org.apache.spark.sql.functions._
import graft.sources.{Converter, Sniff}
import graft.sources.Converter.ReadOptions

/** Format-equivalence round trips — the reference's central test asset
  * is one table surviving every converter path
  * (tests/fixtures/2cols6rows.* — SURVEY.md §5.1). We regenerate the
  * logical content and assert identical rows through each format.
  */
class ConverterSpec extends SparkSpecBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(("1", "John"), ("2", "Mary"), ("3", "Michael"),
      ("4", "Anna"), ("5", "Orban"), ("6", "Lucy")).toDF("id", "name")
  }

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    val ac = a.select(col("id").cast("string"), col("name").cast("string"))
    val bc = b.select(col("id").cast("string"), col("name").cast("string"))
    assert(ac.exceptAll(bc).count() == 0 && bc.exceptAll(ac).count() == 0)
  }

  private def avroAvailable: Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("avro", spark.sessionState.conf)
      true
    } catch { case _: Throwable => false }

  for (fmt <- Seq("csv", "jsonl", "parquet", "orc", "avro", "bson", "xlsx", "xls")) {
    test(s"2cols6rows survives the $fmt round trip") {
      // avro: the spark-avro connector is not in this image's
      // /opt/spark/jars, so Converter falls back to the core-avro
      // single-stream path (AvroLocal) — the round trip RUNS either
      // way. bson/xlsx/xls ride the from-scratch local codecs (the
      // reference's fixture set includes 2cols6rows.bson too).
      val dir = tmpDir(s"conv-$fmt")
      Converter.write(fixture, dir, fmt)
      val back = Converter.read(spark, dir, ReadOptions(fmt))
      assertSameRows(fixture, back)
    }
  }

  test("encoding sniff tolerates a multi-byte char truncated at the prefix edge") {
    // a valid UTF-8 stream cut mid-character (the 1MB prefix boundary
    // case) must still classify as UTF-8, not fall through to CP1251
    val full = ("данные " * 50).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // drop the trailing space AND half of the 2-byte 'е' so the buffer
    // ends on a dangling UTF-8 lead byte
    val truncated = java.util.Arrays.copyOf(full, full.length - 2)
    assert(graft.sources.Sniff.encoding(truncated, complete = false) == "UTF-8")
    // but the SAME dangling lead at the end of a COMPLETE file is
    // malformed — an ISO-8859-1 file ending in 0xE9 ("café") must not
    // classify as UTF-8
    assert(graft.sources.Sniff.encoding(truncated) != "UTF-8")
    val cafe = "plain ascii then café"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(graft.sources.Sniff.encoding(cafe) == "ISO-8859-1")
    // genuinely malformed bytes still fall through either way
    val bad = Array.fill[Byte](100)(0xD0.toByte)
    assert(graft.sources.Sniff.encoding(bad, complete = false) != "UTF-8")
  }

  test("csv round-trips embedded newlines, quotes, commas and unicode") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two"),
      (3L, "a \"quoted\" value, with comma"),
      (4L, "trailing\n"),
      (5L, "данные ümlaut")
    ).toDF("id", "text")
    val dir = tmpDir("conv-tricky")
    Converter.write(tricky, dir, "csv")
    val back = Converter.read(spark, dir, ReadOptions("csv"))
      .select(col("id").cast("long"), col("text"))
    assert(tricky.exceptAll(back).count() == 0 &&
      back.exceptAll(tricky).count() == 0)
  }

  for ((codec, ext) <- Seq(("gzip", ".csv.gz"), ("bzip2", ".csv.bz2"))) {
    test(s"csv round trip with $codec compression (compressed containers)") {
      val dir = tmpDir(s"conv-$codec")
      Converter.write(fixture, dir, "csv", compression = codec)
      assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(ext)))
      assertSameRows(fixture, Converter.read(spark, dir, ReadOptions("csv")))
    }
  }

  test("BOM-based encoding sniff (utf-8/16/32 variants)") {
    def enc(bytes: Int*): String = Sniff.encoding(bytes.map(_.toByte).toArray)
    assert(enc(0xEF, 0xBB, 0xBF, 'a') == "UTF-8")
    assert(enc(0xFF, 0xFE, 'a', 0x00) == "UTF-16LE")
    assert(enc(0xFE, 0xFF, 0x00, 'a') == "UTF-16BE")
    assert(enc(0xFF, 0xFE, 0x00, 0x00) == "UTF-32LE")
    assert(enc(0x00, 0x00, 0xFE, 0xFF) == "UTF-32BE")
    assert(Sniff.encoding("plain ascii".getBytes) == "UTF-8")
    // BOM-less UTF-16 (Windows exports): alternating NUL bytes
    assert(Sniff.encoding("id;name\n1;John".getBytes("UTF-16LE")) == "UTF-16LE")
    assert(Sniff.encoding("id;name\n1;John".getBytes("UTF-16BE")) == "UTF-16BE")
    // NUL-free 8-bit text is untouched by the heuristic
    assert(Sniff.encoding("Регистрация".getBytes("windows-1251")) == "windows-1251")
  }

  test("zip/zstd/lz4 container round trips (iterable.py:10-27 containers)") {
    // write one plain csv part, re-pack it into each container format,
    // read back through the driver-side unpack helper
    val dir = tmpDir("conv-container")
    Converter.write(fixture.coalesce(1), s"$dir/plain", "csv")
    val part = new java.io.File(s"$dir/plain").listFiles()
      .find(_.getName.endsWith(".csv")).get
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)

    val zip = s"$dir/data.csv.zip"
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zip))
    zo.putNextEntry(new java.util.zip.ZipEntry("data.csv"))
    zo.write(bytes); zo.closeEntry(); zo.close()

    val zst = s"$dir/data.csv.zst"
    val so = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(zst))
    so.write(bytes); so.close()

    val lz4 = s"$dir/data.csv.lz4"
    val lo = new net.jpountz.lz4.LZ4FrameOutputStream(
      new java.io.FileOutputStream(lz4))
    lo.write(bytes); lo.close()

    for (p <- Seq(zip, zst, lz4))
      assertSameRows(fixture, Converter.readContainer(spark, p, ReadOptions("csv")))
  }

  test(".br container reads via the from-scratch RFC 7932 decoder (last fixture closed)") {
    // the one reference fixture no prior round could read: decoded by
    // graft.codec.BrotliDec and parsed as csv; rows must equal the
    // plain csv twin (the .br content is CRLF, the twin LF — the csv
    // parser normalizes both)
    val br = Converter.readContainer(spark,
      "/root/reference/tests/fixtures/2cols6rows.csv.br", ReadOptions("csv"))
    val csv = Converter.read(spark,
      "/root/reference/tests/fixtures/2cols6rows.csv", ReadOptions("csv"))
    assertSameRows(csv, br)
  }

  test("json root array + tagname unwrap (2cols6rows_array/_tag)") {
    val dir = tmpDir("conv-json")
    // root array document
    val arr = """[{"id":"1","name":"John"},{"id":"2","name":"Mary"}]"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/arr.json"), arr)
    val a = Converter.read(spark, s"$dir/arr.json", ReadOptions("json"))
    assert(a.count() == 2 && a.columns.sorted.toSeq == Seq("id", "name"))
    // object-under-key document (tagname=persons)
    val tag = """{"persons":[{"id":"1","name":"John"},{"id":"2","name":"Mary"},{"id":"3","name":"Anna"}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/tag.json"), tag)
    val t = Converter.read(spark, s"$dir/tag.json", ReadOptions("json", tagname = "persons"))
    assert(t.count() == 3 && t.columns.sorted.toSeq == Seq("id", "name"))
  }

  test("xml read with rowTag (books.xml conventions)") {
    val dir = tmpDir("conv-xml")
    val xml =
      """<catalog>
        |<book category="cooking"><title lang="en">Everyday</title><year>2005</year></book>
        |<book category="web"><title lang="en">XQuery</title><year>2003</year></book>
        |</catalog>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/books.xml"), xml)
    val df = Converter.read(spark, s"$dir/books.xml", ReadOptions("xml", tagname = "book"))
    assert(df.count() == 2)
    // Spark surfaces attributes as _attr (delta vs the reference's @attr
    // documented in SURVEY.md §2.1)
    assert(df.columns.contains("_category"))
    val titles = df.select(col("title.`_VALUE`")).collect().map(_.getString(0)).sorted
    assert(titles.toSeq == Seq("Everyday", "XQuery"))
  }

  test("nested columns are JSON-stringified for CSV (make_flat, converter.py:464-470)") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Seq("a", "b"), ("x", 2))).toDF("id", "arr", "st")
    val flat = Converter.makeFlat(df)
    assert(flat.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("integer", "string", "string"))
    val row = flat.collect()(0)
    assert(row.getString(1) == """["a","b"]""")
    assert(row.getString(2).contains("\"_1\":\"x\""))
    val dir = tmpDir("conv-flat")
    Converter.write(df, dir, "csv") // must not throw
    assert(Converter.read(spark, dir, ReadOptions("csv")).count() == 1)
  }

  test("delimiter + encoding sniffing (utils.py:7-20 semantics)") {
    assert(Sniff.delimiter("a,b,c") == ",")
    assert(Sniff.delimiter("a;b;c;d") == ";")
    assert(Sniff.delimiter("a\tb\tc") == "\t")
    val ru = "Регистрационный номер;ИНН;Статус"
    assert(Sniff.encoding(ru.getBytes("UTF-8")) == "UTF-8")
    assert(Sniff.encoding(ru.getBytes("windows-1251")) == "windows-1251")
    // round trip a CP1251 file end-to-end
    val dir = tmpDir("sniff")
    val path = s"$dir/ru.csv"
    val content = "ИНН;Статус\n5262128494;Действует\n6154064277;Действует"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes("windows-1251"))
    val (enc, delim) = Sniff.sniffFile(path)
    assert(enc == "windows-1251" && delim == ";")
    val df = Converter.read(spark, path,
      ReadOptions("csv", delimiter = delim, encoding = enc, inferSchema = false))
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("ИНН", "Статус"))
    assert(df.select("Статус").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("Действует"))
  }

  test("BOM-less UTF-16LE csv: sniff detects, read decodes") {
    val dir = tmpDir("conv-utf16")
    val path = s"$dir/w.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "id;name\n1;Müller\n2;Søren".getBytes("UTF-16LE"))
    val (enc, delim) = Sniff.sniffFile(path)
    assert(enc == "UTF-16LE" && delim == ";")
    val df = Converter.read(spark, path,
      ReadOptions("csv", delimiter = delim, encoding = enc, inferSchema = false))
    assert(df.count() == 2)
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Müller", "Søren"))
  }

  test("native kernels resolve on a charset-clone DataFrame (empty registry)") {
    // Converter.read binds exotic-charset reads to a cloned session
    // whose function registry starts EMPTY — the df-level ops must
    // register their kernels on the df's own session, or analysis
    // throws an undefined-function error (regression for the
    // active-session registration bug)
    val dir = tmpDir("clone-reg")
    val path = s"$dir/ru.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "num;status\n254;Действует\n70000;Нет".getBytes("windows-1251"))
    val df = Converter.read(spark, path,
      ReadOptions("csv", delimiter = ";",
        encoding = "windows-1251", inferSchema = false))
    assert(df.sparkSession ne spark) // really the clone path
    val hist = graft.operators.UndatumOps.typeHistogram(df, Seq("num", "status"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(hist == Set(("num", "uint8", 1L), ("num", "uint32", 1L),
      ("status", "str", 2L)))
  }
}
