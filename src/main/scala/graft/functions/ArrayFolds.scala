package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd replacements for the two remaining interpreted
  * `aggregate(zip_with(...))` folds on the ANN hot paths (guide §4:
  * prefer whole-stage-codegen expressions over non-codegen ones —
  * higher-order functions are CodegenFallback, paying per-element boxed
  * lambda evaluation plus an O(dim) intermediate array per row).
  *
  * Both are BIT-IDENTICAL to the folds they replace:
  *  - element order is left-to-right, accumulation `acc = acc + f(x, y)`
  *    exactly as `aggregate(..., 0, _+_)` evaluates;
  *  - a length mismatch yields NULL (zip_with pads the shorter side with
  *    null, the lambda maps it to null, and the fold absorbs it);
  *  - a null ELEMENT likewise nulls the whole result.
  */
private[functions] trait ArrayFoldExpr extends BinaryExpression {
  protected def elemType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == elemType && r == elemType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<${elemType.simpleString}> " +
          s"arguments, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }
  override def dataType: DataType = elemType
  override def nullIntolerant: Boolean = true
  // length mismatch / null element => null result
  override def nullable: Boolean = true
}

/** Σ xᵢ·yᵢ over two array<bigint> columns — `graft_idot`. */
case class LongDotProduct(left: Expression, right: Expression)
    extends ArrayFoldExpr {
  override protected def elemType: DataType = LongType
  override def prettyName: String = "graft_idot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var i = 0; var s = 0L
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getLong(i) * y.getLong(i); i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ−yᵢ)² over two array<double> columns — `graft_sqdist`.
  * Accumulates left-to-right in double, each term computed as
  * `(x - y) * (x - y)` — the identical IEEE sequence of the
  * `aggregate(zip_with(v, c, (x,y) => (x-y)*(x-y)), 0d, _+_)` fold it
  * replaces, so argmin ranks and tie-breaks are unchanged. */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends ArrayFoldExpr {
  override protected def elemType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var i = 0; var s = 0.0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getDouble(i) - y.getDouble(i)
        s += d * d; i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |${ev.value} = 0.0;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    ${ev.value} += $d * $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2Distance =
    copy(left = newLeft, right = newRight)
}
