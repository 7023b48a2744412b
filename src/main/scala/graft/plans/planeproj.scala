package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * `dot_const(vec, weights)` — dot product of a FLOAT vector with a
 * plan-time constant weight vector (the LSH hyperplane projection of
 * AnnOps). Replaces the composed `aggregate(zip_with(vec, array(w…),
 * (x,y) -> x*y), 0, +)` pipeline: higher-order functions evaluate their
 * lambda through the interpreter (they opt out of whole-stage codegen)
 * and materialize a product array per row per plane — this expression
 * is one codegen'd loop over the vector with the weights held in a
 * referenced double[], allocation-free.
 *
 * Numerics are IDENTICAL to the composed form and the DuckDB oracle's
 * `sum(e[d+1] * v)`: elements widen to double and accumulate in index
 * order, so bucket assignments stay bit-equal.
 */
case class DotConst(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_const"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_const requires array<float>, got ${other.catalogString}")
  }

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), weights.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * weights(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("dotConstWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $w.length);
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += ((double) $a.getFloat($i)) * $w[$i];
        }
        ${ev.value} = $s;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DotConst =
    copy(child = newChild)

  // Array[Double] is reference-compared by the default case-class
  // equals, which would break plan canonicalization — compare contents.
  override def equals(o: Any): Boolean = o match {
    case DotConst(c, w) => c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
}
