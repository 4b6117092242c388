package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of two float vectors as one native codegen'd
  * expression — the IVF assignment argmin evaluates k of these per
  * row, and the HOF formulation (`aggregate(zip_with(...))`) ran
  * interpreted (see VecDot). Folds (x-y)^2 left-to-right in doubles
  * over index order — identical to the HOF fold, so cell assignments
  * are bit-identical. NULL on length mismatch, like the zip_with pad.
  */
object VecDist2 {

  def dist2(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a NULL element poisons to NULL like the HOF fold — getFloat
      // alone would silently read 0.0
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dist2", exprs => VecDist2Expr(exprs(0), exprs(1)), "built-in")

  def vecDist2(a: Column, b: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    call_function("vec_dist2", a, b)
  }
}

case class VecDist2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_dist2"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dist2 needs two ARRAY<FLOAT>, got $l / $r")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDist2.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("d2Res")
      s"""
         |java.lang.Double $r = graft.functions.VecDist2.dist2($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
