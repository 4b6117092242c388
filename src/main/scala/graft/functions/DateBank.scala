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

  /** The same formatter class try_to_timestamp instantiates (UTC: the
    * zone never affects parse SUCCESS, only the resulting instant).
    * DateTimeFormatter is thread-safe; the array is built once per
    * executor JVM.
    */
  @transient private lazy val formatters: Array[TimestampFormatter] =
    formats.map(f =>
      TimestampFormatter(f, java.time.ZoneOffset.UTC, isParsing = true)).toArray

  /** Static kernel called from generated code: bit i of the result =
    * formats(i) parses the whole string.
    */
  def mask(s: UTF8String): Int = {
    val n = s.numBytes()
    if (n == 0 || n > 40) return 0 // nothing in the bank parses >40 chars
    // one feature scan over the bytes (ASCII separators can't occur
    // inside UTF-8 continuation sequences, so byte tests are exact)
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
      else if (c == '+') () // explicit-sign wide years (EXCEEDS_PAD)
      else other = true
      i += 1
    }
    if (other) return 0 // no bank format admits bytes outside the set above
    var candidates = 0
    val sepFree = slash == 0 && dot == 0 && colon == 0 && space == 0 && comma == 0
    if (letter) {
      // month-name formats only
      if (space >= 2 && dash == 0 && slash == 0 && dot == 0 && colon == 0)
        candidates |= (1 << 7) | (1 << 8) // dd MMM yyyy / MMM dd, yyyy
    } else {
      if (dash >= 2 && sepFree) candidates |= (1 << 0) | (1 << 5) // dash dates
      if (dot >= 2 && dash == 0 && slash == 0 && colon == 0 && space == 0 && comma == 0)
        candidates |= (1 << 1) | (1 << 9) // dotted EU, 4- and 2-digit year
      if (slash >= 2 && dash == 0 && dot == 0 && colon == 0 && space == 0 && comma == 0)
        candidates |= (1 << 2) | (1 << 3) | (1 << 4) // slash dates
      if (dash == 0 && sepFree && n >= 8) candidates |= (1 << 6) // yyyyMMdd
      if (dash >= 2 && colon >= 2 && space >= 1 && slash == 0 && dot == 0 && comma == 0)
        candidates |= (1 << 10) // ISO datetime
    }
    if (candidates == 0) return 0
    val str = s.toString
    var out = 0
    var f = 0
    while (candidates != 0) {
      if ((candidates & 1) == 1 &&
          formatters(f).parseOptional(str).isDefined) out |= (1 << f)
      candidates >>>= 1
      f += 1
    }
    out
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "date_bank_mask", exprs => DateBankMaskExpr(exprs.head), "built-in")

  def dateBankMask(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("date_bank_mask", c)
  }
}

case class DateBankMaskExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "date_bank_mask"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"date_bank_mask needs STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    DateBank.mask(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DateBank.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
