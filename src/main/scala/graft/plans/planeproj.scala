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

/**
 * `dot_codes(a, b)` — integer dot product of two BIGINT code arrays:
 * the SQ8 ANN serving kernel (AnnOps q310/q311 — the per-candidate
 * distance an IVF list scan evaluates at 100 TB). Replaces the composed
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)` pipeline for the
 * same reason as [[DotConst]]: higher-order functions evaluate their
 * lambdas interpreted and materialize a product array per candidate
 * pair — this is one codegen'd long loop, allocation-free.
 *
 * Semantics mirror the composed form exactly, including its edges:
 * `zip_with` pads the shorter array with nulls and a null element
 * poisons the sum, so differing lengths or any null element yield NULL
 * here too — quantized code arrays (non-null, fixed dims) never hit
 * either edge, and results stay bit-identical.
 */
case class DotCodes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true
  // nullable even over non-null inputs: length mismatch / null element
  // yield NULL (the zip_with-padding semantics this expression mirrors)
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_codes"

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_codes requires two array<bigint>, got " +
      s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $s += $a.getLong($i) * $b.getLong($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $s; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotCodes =
    copy(left = newLeft, right = newRight)
}
