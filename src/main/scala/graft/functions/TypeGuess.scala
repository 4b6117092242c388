package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-value type guess (undatum's guess_datatype, utils.py:113-151)
  * as ONE native byte-scan — the declarative form ran SEVEN regexes
  * per value (int + float + 4 date shapes + the int-width casts),
  * which made q_type_hist/q_field_types regex-bound. One pass over
  * the UTF-8 bytes decides exactly the same categories:
  *
  *   all digits                   -> uint8 / uint16 / uint32
  *                                   (< 255 / < 65535 boundaries — the
  *                                   reference's off-by-one, kept)
  *   -?digits.digits              -> float
  *   dddd-dd-dd | dd.dd.dddd |
  *   dd/dd/dddd | dddd/dd/dd      -> date
  *   anything else                -> str
  *
  * Digit runs longer than 19 bytes classify as uint32 directly (the
  * regex+cast form would ANSI-overflow there). Null/empty stay the
  * caller's `when` branch, as before — the kernel only sees non-null
  * non-empty strings. Byte-level digit tests are exact: UTF-8
  * continuation bytes can never fall in '0'..'9'.
  */
object TypeGuess {

  private val UINT8 = UTF8String.fromString("uint8")
  private val UINT16 = UTF8String.fromString("uint16")
  private val UINT32 = UTF8String.fromString("uint32")
  private val FLOAT = UTF8String.fromString("float")
  private val DATE = UTF8String.fromString("date")
  private val STR = UTF8String.fromString("str")
  private val EMPTY = UTF8String.fromString("empty")

  /** Static kernel called from generated code. */
  def guess(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    if (n == 0) return EMPTY
    def b(i: Int): Int = s.getByte(i) & 0xFF
    def digit(i: Int): Boolean = { val c = b(i); c >= '0' && c <= '9' }
    // all digits -> unsigned int with the reference's width rule
    var i = 0
    while (i < n && digit(i)) i += 1
    if (i == n) {
      if (n > 19) return UINT32
      var v = 0L
      var j = 0
      while (j < n) { v = v * 10 + (b(j) - '0'); j += 1 }
      if (v < 0) return UINT32 // 19-digit overflow wrapped
      return if (v < 255L) UINT8 else if (v < 65535L) UINT16 else UINT32
    }
    // -?digits.digits
    var p = 0
    if (b(0) == '-') p = 1
    var d1 = 0
    while (p < n && digit(p)) { d1 += 1; p += 1 }
    if (d1 > 0 && p < n && b(p) == '.') {
      p += 1
      var d2 = 0
      while (p < n && digit(p)) { d2 += 1; p += 1 }
      if (d2 > 0 && p == n) return FLOAT
    }
    // fixed date shapes
    if (n == 10) {
      def sep(i: Int, c: Char): Boolean = b(i) == c
      def digits(from: Int, to: Int): Boolean = {
        var k = from
        while (k < to) { if (!digit(k)) return false; k += 1 }
        true
      }
      val isoDash = digits(0, 4) && sep(4, '-') && digits(5, 7) && sep(7, '-') && digits(8, 10)
      val isoSlash = digits(0, 4) && sep(4, '/') && digits(5, 7) && sep(7, '/') && digits(8, 10)
      val euDot = digits(0, 2) && sep(2, '.') && digits(3, 5) && sep(5, '.') && digits(6, 10)
      val usSlash = digits(0, 2) && sep(2, '/') && digits(3, 5) && sep(5, '/') && digits(6, 10)
      if (isoDash || isoSlash || euDot || usSlash) return DATE
    }
    STR
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "type_guess", exprs => TypeGuessExpr(exprs.head), "built-in")

  def typeGuess(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("type_guess", c)
  }
}

case class TypeGuessExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "type_guess"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"type_guess needs STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TypeGuess.guess(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TypeGuess.guess($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
