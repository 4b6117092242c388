package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Non-distinct hashed unigram+bigram feature BUCKETS as one native
  * expression — the DSIR hot path ([[graft.text.Dsir]]).
  *
  * Semantically identical to the declarative formulation
  *   concat(transform(ws, w -> pmod(xxhash64(w), b)),
  *          transform(seq, i -> pmod(xxhash64(w_i || " " || w_i+1), b)))
  * over ws = filter(split(lower(text), "\s+"), w -> w != "") — the
  * unigram buckets in word order, then the bigram buckets — but in
  * ONE pass over the text bytes (the HOF chain is interpreted and
  * allocates a lambda frame + slice + concat buffer per n-gram; the
  * same bottleneck [[Shingles]] killed for minhash, measured ~11s for
  * 5k docs at sf0.1 vs sub-second native). Unigram hashes read the
  * lowered text bytes IN PLACE (no copy); only bigrams go through a
  * reused join buffer. Property-tested equal to the declarative form
  * (DsirBucketsSpec).
  *
  * Multiplicity is PRESERVED (no distinct set): DSIR weights are sums
  * over feature occurrences, not feature sets.
  */
object DsirBuckets {

  private val isWs = {
    val a = new Array[Boolean](128)
    Seq(' ', '\t', '\n', '\u000B', '\f', '\r').foreach(c => a(c.toInt) = true)
    a
  }

  /** Static kernel called from generated code. */
  def buckets(text0: UTF8String, b: Int): ArrayData = {
    val bytes = text0.toLowerCase.getBytes
    val len = bytes.length
    var wStart = new Array[Int](16)
    var wLen = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < len) {
      val c = bytes(i)
      if (c >= 0 && c < 128 && isWs(c)) i += 1
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
    if (m == 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new Array[Int](m + (m - 1))
    var p = 0
    // unigrams: hash the word bytes in place
    i = 0
    while (i < m) {
      val h = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + wStart(i), wLen(i), 42L)
      out(p) = (((h % b) + b) % b).toInt
      p += 1; i += 1
    }
    // bigrams: "w1 w2" through a reused buffer
    var bufCap = 64
    var buf = new Array[Byte](bufCap)
    i = 0
    while (i < m - 1) {
      val need = wLen(i) + 1 + wLen(i + 1)
      if (need > bufCap) {
        bufCap = Integer.highestOneBit(need - 1) << 1
        buf = new Array[Byte](bufCap)
      }
      System.arraycopy(bytes, wStart(i), buf, 0, wLen(i))
      buf(wLen(i)) = ' '
      System.arraycopy(bytes, wStart(i + 1), buf, wLen(i) + 1, wLen(i + 1))
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, need, 42L)
      out(p) = (((h % b) + b) % b).toInt
      p += 1; i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dsir_buckets_ll", exprs => DsirBucketsExpr(exprs(0), exprs(1)),
      "built-in")

  def native(text: Column, b: Int): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("dsir_buckets_ll", text,
      org.apache.spark.sql.functions.lit(b))
  }
}

case class DsirBucketsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val b = right.eval(null)
        if (b != null && b.asInstanceOf[Int] < 1)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"dsir_buckets_ll needs b >= 1, got $b")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsir_buckets_ll needs (STRING, literal INT), got $l / $r")
    }

  override def nullSafeEval(t: Any, b: Any): Any =
    DsirBuckets.buckets(t.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) => s"graft.functions.DsirBuckets.buckets($t, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
