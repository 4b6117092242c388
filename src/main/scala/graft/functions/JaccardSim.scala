package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact Jaccard similarity of two long-array shingle sets as ONE
  * native expression: a single open-addressing probe pass replaces the
  * interpreted array_intersect + array_union pair (two hash-set
  * builds + two array materializations per candidate pair) in the
  * dedup verify joins.
  *
  * Inputs are shingle arrays that are already distinct
  * (Dedup.shingles applies array_distinct), so
  * |union| = |a| + |b| - |intersection|.
  *
  * DOCUMENTED DELTA vs the declarative size(intersect)/size(union)
  * form: empty-vs-empty yields 0.0 here where 0/0 division yields
  * NULL there — a deliberate "no shared evidence, no similarity"
  * choice; both are below any positive threshold.
  */
object JaccardSim {

  /** Static kernel called from generated code. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // probe the smaller side into a table, stream the larger
    val (small, ns, large, nl) = if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    var cap = Integer.highestOneBit(math.max(16, ns * 2) - 1) << 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      var h = (v ^ (v >>> 32)).toInt * 0x9E3779B9
      h ^= h >>> 16
      var j = h & (cap - 1)
      while (used(j) && keys(j) != v) j = (j + 1) & (cap - 1)
      if (!used(j)) { used(j) = true; keys(j) = v }
      i += 1
    }
    var inter = 0
    i = 0
    while (i < nl) {
      val v = large.getLong(i)
      var h = (v ^ (v >>> 32)).toInt * 0x9E3779B9
      h ^= h >>> 16
      var j = h & (cap - 1)
      while (used(j) && keys(j) != v) j = (j + 1) & (cap - 1)
      if (used(j)) inter += 1
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_ll", exprs => JaccardSimExpr(exprs(0), exprs(1)), "built-in")

  def jaccardSim(a: Column, b: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("jaccard_ll", a, b)
  }
}

case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // when an input array MAY hold null elements (SQL-built arrays; the
  // shingle kernel's own output is containsNull=false), a null element
  // poisons the result to NULL — getLong would silently read 0
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
          s"jaccard_ll needs two ARRAY<BIGINT>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (elemNullable && (ArrayNulls.hasNull(aa) || ArrayNulls.hasNull(bb))) null
    else JaccardSim.jaccard(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elemNullable)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardSim.jaccard($a, $b)")
    else nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if (graft.functions.ArrayNulls.hasNull($a) ||
        |    graft.functions.ArrayNulls.hasNull($b)) { ${ev.isNull} = true; }
        |else { ${ev.value} = graft.functions.JaccardSim.jaccard($a, $b); }
      """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
