package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature as ONE native Catalyst expression:
  * a single pass over the shingle array computes all k minima, versus
  * k interpreted `array_min(transform(...))` plans (which fall back to
  * non-codegen eval and allocate k intermediate arrays per row —
  * measured 40s -> sub-second on 5k docs at sf0.1).
  *
  * h_j(s) = (a_j * (s & 0x7FFFFFFF) + b_j) mod (2^31 - 1); seeds are
  * deterministic splitmix64 — identical to Dedup.minhashSignature's
  * declarative formulation, property-checked against it.
  */
object MinHashSig {
  val K = 64
  private val P = 2147483647L

  private def mix(z0: Long): Long = graft.codec.Hash.splitmix64(z0)

  val as: Array[Long] = Array.tabulate(K)(j => (mix(j.toLong * 2 + 1).abs % (P - 1)) + 1)
  val bs: Array[Long] = Array.tabulate(K)(j => mix(j.toLong * 2 + 2).abs % P)

  /** Static kernel called from generated code. */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](K)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getLong(i) & 0x7FFFFFFFL
      var j = 0
      while (j < K) {
        val h = (as(j) * s + bs(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSigExpr(exprs.head), "built-in")

  def minhashSig(c: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("minhash_sig", c)
  }
}

/** Fraction of agreeing positions between two minhash signatures —
  * the unbiased jaccard estimate used as the LSH candidate pre-filter.
  * One native loop over 2*K longs per pair; the declarative
  * `aggregate(zip_with(...))` form is a HigherOrderFunction, which
  * never enters whole-stage codegen and boxes per element (measured
  * 17s -> ~6s on q_minhash_pairs at sf0.1).
  */
object SigAgree {

  /** Static kernel called from generated code. */
  def agree(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_agree", exprs => SigAgreeExpr(exprs(0), exprs(1)), "built-in")

  def sigAgree(a: Column, b: Column): Column = {
    SigAgree.register(org.apache.spark.sql.SparkSession.active)
    call_function("sig_agree", a, b)
  }
}

case class SigAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  private def elemNullable: Boolean = Seq(left, right).exists {
    _.dataType match { case ArrayType(_, n) => n; case _ => false }
  }
  override def nullable: Boolean = super.nullable || elemNullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_agree needs two ARRAY<BIGINT>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (elemNullable && (ArrayNulls.hasNull(aa) || ArrayNulls.hasNull(bb))) null
    else SigAgree.agree(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elemNullable)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgree.agree($a, $b)")
    else nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if (graft.functions.ArrayNulls.hasNull($a) ||
        |    graft.functions.ArrayNulls.hasNull($b)) { ${ev.isNull} = true; }
        |else { ${ev.value} = graft.functions.SigAgree.agree($a, $b); }
      """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n; case _ => false
  }
  override def nullable: Boolean = super.nullable || elemNullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs ARRAY<BIGINT>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[ArrayData]
    if (elemNullable && ArrayNulls.hasNull(vv)) null else MinHashSig.sig(vv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elemNullable)
      defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c)")
    else nullSafeCodeGen(ctx, ev, c => s"""
        |if (graft.functions.ArrayNulls.hasNull($c)) { ${ev.isNull} = true; }
        |else { ${ev.value} = graft.functions.MinHashSig.sig($c); }
      """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
