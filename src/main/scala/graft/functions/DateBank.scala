package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.TimestampFormatter
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass date-format-bank matcher. The declarative
  * `dateFormatScores` runs one `try_to_timestamp` per bank format per
  * value — 11 full parse attempts per row. This kernel computes the
  * same per-format match BITMASK in one call: a single byte scan
  * derives cheap structural features (separator counts, letters,
  * all-digits), each format's feature guard is a NECESSARY condition
  * of parseability (it can only skip attempts that would fail, never
  * one that would succeed), and the few surviving candidates run
  * through Spark's OWN `TimestampFormatter` (the exact class behind
  * `try_to_timestamp`, exception-free `parseOptional`) so the match
  * set is identical by construction. A mixed date column then costs
  * ~1-2 parse attempts per row instead of 11; garbage costs ~0.
  *
  * Bank (index = bit): mirrors the reference's qddate pattern families
  * (undatum/cmds/statistics.py:5,27) — see
  * [[graft.operators.UndatumOps.dateFormats]], which aliases this.
  */
object DateBank {

  val formats: Seq[String] =
    Seq("yyyy-MM-dd", "dd.MM.yyyy", "MM/dd/yyyy", "yyyy/MM/dd",
      "dd/MM/yyyy", "dd-MM-yyyy", "yyyyMMdd", "dd MMM yyyy",
      "MMM dd, yyyy", "dd.MM.yy", "yyyy-MM-dd HH:mm:ss")

  private val ruLocale = java.util.Locale.forLanguageTag("ru")
  private val usLocale = java.util.Locale.US

  /** Wide-bank extension toward qddate's generated pattern base
    * (statistics.py:5,27 — DateParser(generate=True) expands numeric,
    * datetime, English AND Russian month-name families): ISO-T and
    * minute-precision datetimes, the US 12-hour clock, full English
    * month names, and the three Russian genitive month-name shapes
    * ("1 января 2012", "5 янв. 2019", "28 сентября 2012 г.") qddate
    * was built for. Each entry: (display name, Spark pattern, parse
    * locale). Display names are what `dateFormatScoresWide` reports;
    * the `(ru)` suffix keeps them unique vs the pattern-equal English
    * forms.
    */
  val wideExtra: Seq[(String, String, java.util.Locale)] = Seq(
    ("yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", usLocale),
    ("dd.MM.yyyy HH:mm:ss", "dd.MM.yyyy HH:mm:ss", usLocale),
    ("dd.MM.yyyy HH:mm", "dd.MM.yyyy HH:mm", usLocale),
    ("yyyy-MM-dd HH:mm", "yyyy-MM-dd HH:mm", usLocale),
    ("MM/dd/yyyy hh:mm a", "MM/dd/yyyy hh:mm a", usLocale),
    ("dd MMMM yyyy", "dd MMMM yyyy", usLocale),
    ("MMMM dd, yyyy", "MMMM dd, yyyy", usLocale),
    ("d MMMM yyyy (ru)", "d MMMM yyyy", ruLocale),
    ("d MMM yyyy (ru)", "d MMM yyyy", ruLocale),
    ("d MMMM yyyy г. (ru)", "d MMMM yyyy 'г.'", ruLocale),
    ("yyyy.MM.dd", "yyyy.MM.dd", usLocale))

  /** Display names of the full 22-format wide bank; indices 0-10 are
    * [[formats]], 11-21 are [[wideExtra]]. Bit i of [[maskWide]] =
    * format i parses.
    */
  val formatsWide: Seq[String] = formats ++ wideExtra.map(_._1)

  /** The same formatter class try_to_timestamp instantiates (UTC: the
    * zone never affects parse SUCCESS, only the resulting instant).
    * DateTimeFormatter is thread-safe; the array is built once per
    * executor JVM.
    */
  @transient private lazy val formatters: Array[TimestampFormatter] =
    formats.map(f =>
      TimestampFormatter(f, java.time.ZoneOffset.UTC, isParsing = true)).toArray

  /** All 22 wide-bank formatters; ru-locale entries go through the
    * locale-aware overload (the legacy-format arg only matters under
    * the legacy parser policy, which this engine never enables).
    */
  @transient private lazy val formattersWide: Array[TimestampFormatter] = {
    import org.apache.spark.sql.catalyst.util.LegacyDateFormats
    formatters ++ wideExtra.map { case (_, pat, loc) =>
      TimestampFormatter(pat, java.time.ZoneOffset.UTC, loc,
        LegacyDateFormats.LENIENT_SIMPLE_DATE_FORMAT, isParsing = true)
    }
  }

  /** Reference oracle for tests: does wide-bank format `i` parse `s`
    * (no feature guards — every formatter attempted).
    */
  def parsesWide(s: String, i: Int): Boolean =
    formattersWide(i).parseOptional(s).isDefined

  /** Static kernel called from generated code: bit i of the result =
    * formats(i) parses the whole string.
    */
  def mask(s: UTF8String): Int = maskImpl(s, wide = false)

  /** Wide-bank variant: bit i of the result = formatsWide(i) parses
    * the whole string (22 formats incl. datetime, 12-hour, full-name
    * and Russian month families).
    */
  def maskWide(s: UTF8String): Int = maskImpl(s, wide = true)

  private def maskImpl(s: UTF8String, wide: Boolean): Int = {
    val n = s.numBytes()
    if (n == 0 || n > 40) return 0 // nothing in the bank parses >40 chars
    // one feature scan over the bytes (ASCII separators can't occur
    // inside UTF-8 continuation sequences, so byte tests are exact;
    // non-ASCII bytes are treated as potential letters — Cyrillic
    // month names for the ru families — never as disqualifiers)
    var dash = 0; var slash = 0; var dot = 0; var colon = 0
    var space = 0; var comma = 0; var letter = false; var other = false
    var i = 0
    while (i < n) {
      val c = s.getByte(i) & 0xFF
      if (c >= '0' && c <= '9') ()
      else if (c == '-') dash += 1
      else if (c == '/') slash += 1
      else if (c == '.') dot += 1
      else if (c == ':') colon += 1
      else if (c == ' ') space += 1
      else if (c == ',') comma += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) letter = true
      else if (c >= 0x80) letter = true // UTF-8 lead/continuation byte
      else if (c == '+') () // explicit-sign wide years (EXCEEDS_PAD)
      else other = true
      i += 1
    }
    if (other) return 0 // no bank format admits bytes outside the set above
    var candidates = 0
    val sepFree = slash == 0 && dot == 0 && colon == 0 && space == 0 && comma == 0
    if (letter) {
      // month-name and lettered-datetime formats only. Each guard is a
      // NECESSARY condition of its formats' parseability.
      if (space >= 2 && dash == 0 && slash == 0 && colon == 0) {
        if (dot == 0) {
          candidates |= (1 << 7) | (1 << 8) // dd MMM yyyy / MMM dd, yyyy
          if (wide) // full-name English + ru genitive (no-dot shapes)
            candidates |= (1 << 16) | (1 << 17) | (1 << 18)
        }
        if (wide && comma == 0) {
          if (dot <= 1) candidates |= (1 << 19) // "5 янв. 2019" / "5 мая 2019"
          if (dot >= 1 && space >= 3) candidates |= (1 << 20) // "… 2012 г."
        }
      }
      if (wide && dash >= 2 && colon >= 2 &&
          slash == 0 && dot == 0 && space == 0 && comma == 0)
        candidates |= (1 << 11) // yyyy-MM-dd'T'HH:mm:ss ('T' is the letter)
      if (wide && slash >= 2 && colon >= 1 && space >= 2 &&
          dash == 0 && dot == 0 && comma == 0)
        candidates |= (1 << 15) // MM/dd/yyyy hh:mm a (AM/PM letters)
    } else {
      if (dash >= 2 && sepFree) candidates |= (1 << 0) | (1 << 5) // dash dates
      if (dot >= 2 && dash == 0 && slash == 0 && colon == 0 && space == 0 && comma == 0) {
        candidates |= (1 << 1) | (1 << 9) // dotted EU, 4- and 2-digit year
        if (wide) candidates |= (1 << 21) // yyyy.MM.dd
      }
      if (slash >= 2 && dash == 0 && dot == 0 && colon == 0 && space == 0 && comma == 0)
        candidates |= (1 << 2) | (1 << 3) | (1 << 4) // slash dates
      if (dash == 0 && sepFree && n >= 8) candidates |= (1 << 6) // yyyyMMdd
      if (dash >= 2 && colon >= 2 && space >= 1 && slash == 0 && dot == 0 && comma == 0)
        candidates |= (1 << 10) // ISO datetime
      if (wide && comma == 0 && slash == 0) {
        if (dot >= 2 && colon >= 2 && space >= 1 && dash == 0)
          candidates |= (1 << 12) // dd.MM.yyyy HH:mm:ss
        if (dot >= 2 && colon >= 1 && space >= 1 && dash == 0)
          candidates |= (1 << 13) // dd.MM.yyyy HH:mm
        if (dash >= 2 && colon >= 1 && space >= 1 && dot == 0)
          candidates |= (1 << 14) // yyyy-MM-dd HH:mm
      }
    }
    if (candidates == 0) return 0
    val bank = if (wide) formattersWide else formatters
    val str = s.toString
    var out = 0
    var f = 0
    while (candidates != 0) {
      if ((candidates & 1) == 1 &&
          bank(f).parseOptional(str).isDefined) out |= (1 << f)
      candidates >>>= 1
      f += 1
    }
    out
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "date_bank_mask", exprs => DateBankMaskExpr(exprs.head, wide = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "date_bank_mask_wide", exprs => DateBankMaskExpr(exprs.head, wide = true),
      "built-in")
  }

  def dateBankMask(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("date_bank_mask", c)
  }

  def dateBankMaskWide(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("date_bank_mask_wide", c)
  }
}

case class DateBankMaskExpr(child: Expression, wide: Boolean)
    extends UnaryExpression {
  override def prettyName: String =
    if (wide) "date_bank_mask_wide" else "date_bank_mask"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs STRING, got ${child.dataType}")

  private def kernel: String = if (wide) "maskWide" else "mask"

  override def nullSafeEval(v: Any): Any =
    if (wide) DateBank.maskWide(v.asInstanceOf[UTF8String])
    else DateBank.mask(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DateBank.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
