package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8
import javax.xml.stream.XMLStreamConstants

/** DOCX table extraction built from scratch on the public OOXML
  * container layout (ECMA-376 WordprocessingML: a zip whose
  * `word/document.xml` holds `<w:tbl>` elements) — JDK zip + StAX, no
  * python-docx analog needed. Mirrors the reference's
  * `formats/docx.py:__extract_table` semantics:
  *
  *  - cell text = paragraph texts joined, newlines replaced by a
  *    space, stripped (docx.py:28,30-31 with strip_space=True);
  *  - a horizontally merged cell (`w:gridSpan val=N`) repeats its
  *    value across all N grid columns (docx.py:23-24);
  *  - a vertically merged continuation cell (`w:vMerge` with
  *    val="continue" or no val) takes the value from the same column
  *    of the row above. DELIBERATE divergence: the reference
  *    (docx.py:22) indexes `results[n-1][len(r)-1]` — the PREVIOUS
  *    column, with a Python `[-1]` wrap to the last cell for column
  *    0 — which is an upstream off-by-one, not vMerge semantics. We
  *    keep the same-column value (what the merged cell visually
  *    spans); tables without merges are unaffected.
  *
  * Nested tables are flattened into the containing cell's text (the
  * reference's `cell.text` does the same).
  *
  * Scale note: docx is a driver-side bounded read (one zip, one XML
  * stream) — same single-threaded shape as the reference. Documents
  * are an ingest format; the extracted table converts onward to
  * parquet.
  */
object DocxTables {

  private def staxReader(in: java.io.InputStream) = Esc.stax(in)

  /** All top-level tables in `word/document.xml`, merge semantics
    * applied: tables → rows → cell values.
    */
  def tables(path: String): Vector[Vector[Vector[String]]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val entry = Option(zip.getEntry("word/document.xml")).getOrElse(
        throw new IllegalArgumentException(s"$path: no word/document.xml — not a docx"))
      parseTables(zip.getInputStream(entry))
    } finally zip.close()
  }

  private def attr(r: javax.xml.stream.XMLStreamReader, local: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == local) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  private def parseTables(in: java.io.InputStream): Vector[Vector[Vector[String]]] = {
    val r = staxReader(in)
    val out = Vector.newBuilder[Vector[Vector[String]]]
    var tblDepth = 0
    var rows: scala.collection.mutable.ArrayBuffer[Vector[String]] = null
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    // current top-level cell state
    var inCell = false
    var inT = false
    var gridSpan = 1
    var vMergeContinue = false
    val text = new java.lang.StringBuilder
    var cellHasPara = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "tbl" =>
                tblDepth += 1
                if (tblDepth == 1)
                  rows = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
              case "tr" if tblDepth == 1 =>
                row = scala.collection.mutable.ArrayBuffer.empty[String]
              case "tc" if tblDepth == 1 =>
                inCell = true; gridSpan = 1; vMergeContinue = false
                text.setLength(0); cellHasPara = false
              case "gridSpan" if inCell && tblDepth == 1 =>
                gridSpan = attr(r, "val").map(_.toInt).getOrElse(1)
              case "vMerge" if inCell && tblDepth == 1 =>
                // no val attribute means "continue" in WordprocessingML
                vMergeContinue = !attr(r, "val").contains("restart")
              case "p" if inCell =>
                // paragraphs join with \n (replaced by space below)
                if (cellHasPara) text.append('\n')
                cellHasPara = true
              case "t" if inCell => inT = true
              case "tab" | "br" if inCell => text.append(' ')
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            // only w:t runs carry cell text (tracking the element keeps
            // inter-tag indentation out while PRESERVING whitespace-only
            // runs — Word splits "Hello World" into runs at formatting
            // boundaries, including a space-only run)
            if (inT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "tbl" =>
                if (tblDepth == 1) { out += rows.toVector; rows = null }
                tblDepth -= 1
              case "tr" if tblDepth == 1 && row != null =>
                rows += row.toVector; row = null
              case "tc" if tblDepth == 1 && inCell =>
                inCell = false
                val base =
                  if (vMergeContinue && rows.nonEmpty) {
                    // value from the row above, same column position
                    val above = rows.last
                    if (row.length < above.length) above(row.length) else ""
                  } else text.toString.replace('\n', ' ').trim
                var k = 0
                while (k < gridSpan) { row += base; k += 1 } // span repeats value
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Read table `tableIndex` with first-row-as-header semantics (the
    * reference's analyzer stores docx tables as header+rows CSV,
    * analyzer.py:278-286); values are strings, typed by Spark's JSON
    * inference like the other local sources.
    */
  def read(spark: SparkSession, path: String, tableIndex: Int = 0): DataFrame = {
    import spark.implicits._
    val ts = tables(path)
    require(tableIndex < ts.length,
      s"$path has ${ts.length} tables; index $tableIndex out of range")
    val t = ts(tableIndex)
    require(t.nonEmpty, s"$path table $tableIndex is empty")
    val header = t.head
    val jsonLines = t.tail.map { cells =>
      val sb = new java.lang.StringBuilder("{")
      var first = true
      header.zipWithIndex.foreach { case (name, i) =>
        if (i < cells.length) {
          if (!first) sb.append(',')
          first = false
          jsonStr(sb, name); sb.append(':'); jsonStr(sb, cells(i))
        }
      }
      sb.append('}').toString
    }
    spark.read.json(spark.createDataset(jsonLines))
  }

  private def jsonStr(sb: java.lang.StringBuilder, s: String): Unit =
    Esc.json(sb, s)

  // control characters cannot exist in XML 1.0 at all -> space
  private def xmlEscape(s: String): String = Esc.xml(s)

  /** Write `rows` as a minimal one-table docx — fixture/export utility
    * (the reference reads docx tables; it does not write them). Valid
    * WordprocessingML: Word and python-docx open the result.
    */
  def writeTable(rows: Seq[Seq[String]], path: String): Unit = {
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
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
          |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
          |</Relationships>""".stripMargin)
      val sb = new java.lang.StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body><w:tbl>""")
      rows.foreach { r =>
        sb.append("<w:tr>")
        r.foreach { c =>
          sb.append("<w:tc><w:p><w:r><w:t xml:space=\"preserve\">")
            .append(xmlEscape(c)).append("</w:t></w:r></w:p></w:tc>")
        }
        sb.append("</w:tr>")
      }
      sb.append("""</w:tbl><w:p/></w:body></w:document>""")
      put("word/document.xml", sb.toString)
    } finally zo.close()
  }
}
