package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingles as ONE native expression.
  *
  * Semantically identical to the declarative formulation
  * (Dedup.shingles):
  *   array_distinct(transform(sequence(...),
  *     i -> xxhash64(concat_ws(" ", slice(filter(split(lower(text),
  *          "\s+"), w -> w != ""), i+1, n)))))
  * but in one pass over the text bytes. The HOF chain is interpreted
  * (HigherOrderFunctions never enter whole-stage codegen) and
  * allocates a lambda frame + sliced array + concat buffer PER
  * SHINGLE — measured 10s for 5k docs at sf0.1, the single hottest
  * stage of every dedup query; this kernel makes it sub-second.
  *
  * Exactness notes (each mirrors the Spark built-in it replaces):
  *  - lower() = UTF8String.toLowerCase (same call).
  *  - Java's \s is ASCII-only [ \t\n\x0B\f\r]; split("\s+") +
  *    drop-empties therefore equals "maximal runs of non-whitespace
  *    bytes", which this kernel scans directly (all six separators are
  *    single-byte UTF-8, so byte scanning is exact).
  *  - xxhash64() = XXH64.hashUnsafeBytes(utf8 bytes, seed=42), the
  *    same kernel Spark's XxHash64 expression calls.
  *  - array_distinct keeps first-occurrence order; so does the
  *    open-addressing set here.
  */
object Shingles {

  private val isWs = {
    val a = new Array[Boolean](128)
    Seq(' ', '\t', '\n', '\u000B', '\f', '\r').foreach(c => a(c.toInt) = true)
    a
  }

  /** Static kernel called from generated code. */
  def shingle(text0: UTF8String, n: Int): ArrayData = {
    val bytes = text0.toLowerCase.getBytes
    val len = bytes.length
    // word boundaries: maximal runs of non-\s bytes
    var wStart = new Array[Int](16)
    var wLen = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (b >= 0 && b < 128 && isWs(b)) i += 1
      else {
        val s = i
        while (i < len && !(bytes(i) >= 0 && bytes(i) < 128 && isWs(bytes(i)))) i += 1
        if (m == wStart.length) {
          wStart = java.util.Arrays.copyOf(wStart, m * 2)
          wLen = java.util.Arrays.copyOf(wLen, m * 2)
        }
        wStart(m) = s; wLen(m) = i - s; m += 1
      }
    }
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val nSh = m - n + 1
    // open-addressing distinct set, first-occurrence output order
    var cap = Integer.highestOneBit(math.max(16, nSh * 2) - 1) << 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nSh)
    var nOut = 0
    // reusable shingle buffer: max total word bytes + separators
    var bufCap = 64
    var buf = new Array[Byte](bufCap)
    i = 0
    while (i < nSh) {
      var need = n - 1
      var j = 0
      while (j < n) { need += wLen(i + j); j += 1 }
      if (need > bufCap) {
        bufCap = Integer.highestOneBit(need - 1) << 1
        buf = new Array[Byte](bufCap)
      }
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        System.arraycopy(bytes, wStart(i + j), buf, p, wLen(i + j))
        p += wLen(i + j)
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, p, 42L)
      var slot = ((h ^ (h >>> 32)).toInt * 0x9E3779B9 >>> 1) & (cap - 1)
      while (used(slot) && keys(slot) != h) slot = (slot + 1) & (cap - 1)
      if (!used(slot)) {
        used(slot) = true; keys(slot) = h
        out(nOut) = h; nOut += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles_ll", exprs => ShingleExpr(exprs(0), exprs(1)), "built-in")

  def shinglesNative(text: Column, n: Int): Column = {
    // self-register on the active session (same pattern as vec_dot /
    // type_guess) so casual callers need no manual register; df-level
    // library entry points still register on the df's OWN session for
    // the charset-clone case
    register(org.apache.spark.sql.SparkSession.active)
    call_function("shingles_ll", text, org.apache.spark.sql.functions.lit(n))
  }
}

case class ShingleExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        // n < 1 would make m < n false even for zero words, emitting
        // one bogus hash-of-"" per row — every doc then near-dups
        // every other; reject at analysis
        val n = right.eval(null)
        if (n != null && n.asInstanceOf[Int] < 1)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"shingles_ll needs n >= 1, got $n")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles_ll needs (STRING, literal INT), got $l / $r")
    }

  override def nullSafeEval(t: Any, n: Any): Any =
    Shingles.shingle(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.Shingles.shingle($t, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
