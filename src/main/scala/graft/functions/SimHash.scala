package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text as a native Catalyst
  * expression (SURVEY.md §4.2 — "a small custom Expression set is the
  * deepest Catalyst integration that pays for itself"). Codegen emits
  * a static call, so the expression stays inside whole-stage codegen
  * instead of falling back to an interpreted UDF.
  */
object SimHash {
  /** FNV-1a 64-bit over a char range — stable across JVMs. */
  private def hashWord(s: String, from: Int, to: Int): Long =
    graft.codec.Hash.fnv64Range(s, from, to)

  /** Static kernel referenced from generated code. */
  def simhash64(text: UTF8String): Long = {
    if (text == null) return 0L
    val s = text.toString
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val h = hashWord(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Register the native expression with a session's function
    * registry; afterwards `simhash(c)` / SQL `simhash64(col)` work.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")

  def simhash(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("simhash64", c)
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    SimHash.simhash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
