package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Float-vector dot product as ONE native codegen'd expression.
  *
  * The declarative form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * runs INTERPRETED — Spark's higher-order functions have no codegen
  * path, so every similarity comparison paid a per-element closure
  * dispatch; this was the same cost class as the round-2 ShingleExpr
  * win. The kernel accumulates left-to-right in doubles over the
  * elements in index order — EXACTLY the fold order of the HOF form
  * and of DuckDB's list_dot_product over a cast-to-double list — so
  * results are bit-identical and every existing oracle still matches.
  *
  * Length mismatch yields NULL, exactly like the HOF form (zip_with
  * pads the shorter side with NULL, the multiply propagates it, and
  * the sum fold poisons to NULL).
  */
object VecDot {

  /** Static kernel called from generated code; java.lang.Double so a
    * length mismatch OR a NULL element can yield NULL like the HOF
    * fold (zip_with's null element poisons the product, the sum fold
    * poisons to NULL — getFloat alone would silently read 0.0).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotExpr(exprs(0), exprs(1)), "built-in")

  def vecDot(a: Column, b: Column): Column = {
    // registration is idempotent and session-scoped; callers go
    // through this helper, so self-registering keeps call sites clean
    register(org.apache.spark.sql.SparkSession.active)
    call_function("vec_dot", a, b)
  }
}

case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two ARRAY<FLOAT>, got $l / $r")
    }

  // result can be NULL (length mismatch) even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r = graft.functions.VecDot.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
