package graft.sources

/** Shared text-escaping + StAX plumbing for the local format codecs
  * (BSON/XLSX/XLS/DOCX). One copy — a fix here reaches every format.
  */
private[graft] object Esc {

  /** Append `s` as a JSON string literal (quotes, backslashes,
    * control characters escaped).
    */
  def json(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u$c%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    ()
  }

  /** XML element-content escape. XML 1.0 cannot carry control
    * characters below 0x20 (other than tab/newline/CR) AT ALL — not
    * even as numeric references — so they are replaced by the
    * substitute `repl` (spreadsheetML instead uses the `_xHHHH_`
    * convention, see [[xEncode]]).
    */
  def xml(s: String, repl: String = " "): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\t' | '\n' | '\r' => sb.append(c)
        case _ if c < 0x20 => sb.append(repl)
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private val XPattern = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")

  /** SpreadsheetML `_xHHHH_` escaping (ECMA-376 §22.4.2.4, shared
    * strings / inline strings): control characters become `_xHHHH_`,
    * and EVERY literal `_x` is escaped to `_x005F_x` first. Escaping
    * only lookalike matches is not enough: adjacent lookalikes share
    * an underscore (`_x0041_x0042_`), so the non-escaped second one
    * would decode and corrupt the value. After the blanket `_x`
    * escape, every `_x` in the output starts either a control-char
    * marker or a `_x005F_` marker, and the single-pass decode is
    * exactly inverse.
    */
  def xEncode(s: String): String = {
    val pre = s.replace("_x", "_x005F_x")
    val sb = new java.lang.StringBuilder(pre.length)
    var i = 0
    while (i < pre.length) {
      val c = pre.charAt(i)
      // CR must be escaped too — XML parsers normalize \r(\n) to \n in
      // content, so a raw CR cannot round-trip (Excel writes _x000D_)
      if (c < 0x20 && c != '\t' && c != '\n') sb.append(f"_x$c%04X_")
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[xEncode]] — applied to every string read from a
    * spreadsheetML part.
    */
  def xDecode(s: String): String = {
    if (s.indexOf("_x") < 0) return s
    val m = XPattern.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      sb.append(Integer.parseInt(m.group(1), 16).toChar)
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Hardened StAX reader (no DTD / external entities). */
  def stax(in: java.io.InputStream): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD,
      java.lang.Boolean.FALSE)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(in, "UTF-8")
  }
}
