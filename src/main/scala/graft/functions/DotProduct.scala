package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused double-precision dot product of two numeric array columns — a
  * native Catalyst expression with whole-stage codegen (SURVEY §2.10).
  *
  * The composed form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is what
  * the engine's ANN paths used through round 3: it is codegen'd, but
  * `zip_with` MATERIALIZES the element-wise product array per row before
  * the fold — one O(dim) allocation per candidate pair, sitting inside
  * the quadratic all-pairs loops of the exactness baselines (q23/q28/
  * q33) and the per-bucket re-rank of the LSH path. This expression is
  * the same arithmetic as generated Java: one fused loop, zero
  * allocation, accumulating left-to-right in double — BIT-IDENTICAL
  * results to the zip_with fold (same element order, same widening),
  * so every downstream oracle is unaffected.
  *
  * Each side may independently be array<float> or array<double>
  * (elements are widened to double exactly as `cast("double")` does).
  * Unequal lengths return NULL — the observable behavior of the
  * `zip_with` fold this replaced — so a dimension-mismatch schema bug
  * surfaces as a visible null, never a plausible truncated partial dot.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // the mismatched-length NULL means the result can be null even when
  // both inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (fx, fy) = (isFloat(left.dataType), isFloat(right.dataType))
      val n = x.numElements()
      var i = 0; var s = 0.0
      while (i < n) {
        val u = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
        val v = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
        s += u * v
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      def get(arr: String, t: DataType) =
        if (isFloat(t)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value} += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
